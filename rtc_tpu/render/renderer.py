"""Top-level render loop: camera -> tiled wavefronts -> image.

Replaces the reference's scalar double loop (src/camera.rs:67-79) with a
single jitted program: ray-gen, then `lax.map` over fixed-size ray tiles so
the (rays x triangles) working set stays bounded in HBM regardless of
resolution. One compilation per (scene shape, canvas shape, config).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..scene.compile import Scene
from ..utils.config import DEFAULT_CONFIG, RenderConfig
from . import integrator
from .camera import Camera, camera_rays


@partial(jax.jit, static_argnames=("hsize", "vsize", "cfg"))
def _render_rays(scene: Scene, cam_inv, half_width, half_height, pixel_size,
                 hsize: int, vsize: int, cfg: RenderConfig):
    dtype = cfg.jnp_dtype()
    o, d = camera_rays(cam_inv, hsize, vsize,
                       jnp.asarray(half_width, dtype),
                       jnp.asarray(half_height, dtype),
                       jnp.asarray(pixel_size, dtype), dtype)
    n_rays = o.shape[0]
    tile = min(cfg.ray_tile, n_rays)
    n_tiles = -(-n_rays // tile)
    pad = n_tiles * tile - n_rays
    o = jnp.pad(o, ((0, pad), (0, 0)))
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)

    def one_tile(od):
        ot, dt = od
        return integrator.color_at(scene, ot, dt, cfg)

    colors = jax.lax.map(
        one_tile, (o.reshape(n_tiles, tile, 3), d.reshape(n_tiles, tile, 3))
    )
    return colors.reshape(-1, 3)[:n_rays].reshape(vsize, hsize, 3)


def render(scene: Scene, camera: Camera, cfg: RenderConfig = DEFAULT_CONFIG):
    """Render to an (V, H, 3) image array (device)."""
    dtype = cfg.jnp_dtype()
    return _render_rays(
        scene,
        jnp.asarray(camera.transform_inverse, dtype),
        camera.half_width,
        camera.half_height,
        camera.pixel_size,
        camera.hsize,
        camera.vsize,
        cfg,
    )
