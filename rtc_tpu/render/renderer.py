"""Top-level render loop: camera -> tiled wavefronts -> image.

Replaces the reference's scalar double loop (src/camera.rs:67-79) with a
single jitted program: ray-gen, then `lax.map` over fixed-size ray tiles so
the (rays x triangles) working set stays bounded in HBM regardless of
resolution. One compilation per (scene shape, canvas shape, config).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..scene.compile import Scene
from ..utils.config import DEFAULT_CONFIG, RenderConfig
from . import integrator
from .camera import Camera


@jax.jit
def _gen_rays(cam_inv, half_width, half_height, pixel_size, px, py):
    from .camera import camera_rays_for_pixels

    return camera_rays_for_pixels(cam_inv, px, py, half_width, half_height,
                                  pixel_size, cam_inv.dtype)


@partial(jax.jit, static_argnames=("cfg",))
def _shade_rays(scene: Scene, o, d, cfg: RenderConfig):
    n_rays = o.shape[0]
    tile = min(cfg.ray_tile, n_rays)
    n_tiles = -(-n_rays // tile)
    pad = n_tiles * tile - n_rays
    # pad rays park FAR outside every AABB (outward direction) so the
    # traversal schedules cull them instead of tracing them through the scene
    o = jnp.pad(o, ((0, pad), (0, 0)), constant_values=1e12)
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=0.5773502692)

    def one_tile(od):
        ot, dt = od
        return integrator.color_at(scene, ot, dt, cfg)

    colors = jax.lax.map(
        one_tile, (o.reshape(n_tiles, tile, 3), d.reshape(n_tiles, tile, 3))
    )
    return colors.reshape(-1, 3)[:n_rays]


@jax.jit
def _unpermute(colors, inv_perm):
    return colors[inv_perm]


def render(scene: Scene, camera: Camera, cfg: RenderConfig = DEFAULT_CONFIG):
    """Render to an (V, H, 3) image array (device).

    Morton ordering generates rays DIRECTLY in Z-order (elementwise from the
    precomputed pixel-index constants — no runtime permutation gather; the
    per-ray arithmetic is identical for every ordering, so Morton remains a
    pure permutation of the scanline render bit-for-bit). Only the color
    un-permute is a gather.
    """
    dtype = cfg.jnp_dtype()
    morton = cfg.ray_order == "morton"
    if morton:
        _, inv_perm, px, py = _device_morton_perm(camera.vsize, camera.hsize)
        # the shading executable is order-independent; normalize the config
        # so both orders share one compilation cache entry
        cfg = dataclasses.replace(cfg, ray_order="scanline")
    else:
        px = jnp.tile(jnp.arange(camera.hsize, dtype=jnp.int32), camera.vsize)
        py = jnp.repeat(jnp.arange(camera.vsize, dtype=jnp.int32), camera.hsize)
    o, d = _gen_rays(
        jnp.asarray(camera.transform_inverse, dtype),
        jnp.asarray(camera.half_width, dtype),
        jnp.asarray(camera.half_height, dtype),
        jnp.asarray(camera.pixel_size, dtype),
        px, py,
    )
    colors = _shade_rays(scene, o, d, cfg)
    if morton:
        colors = _unpermute(colors, inv_perm)
    return colors.reshape(camera.vsize, camera.hsize, 3)


_PERM_CACHE: dict = {}


def _device_morton_perm(vsize: int, hsize: int):
    """Device-resident Morton permutation + Z-ordered pixel coordinates,
    cached per canvas shape (a fresh host->device upload per frame would
    dominate on remote-attached backends)."""
    key = (vsize, hsize)
    if key not in _PERM_CACHE:
        import numpy as np

        from .order import morton_perm

        perm, inv_perm = morton_perm(vsize, hsize)
        px = (perm % hsize).astype(np.int32)
        py = (perm // hsize).astype(np.int32)
        _PERM_CACHE[key] = (jnp.asarray(perm), jnp.asarray(inv_perm),
                            jnp.asarray(px), jnp.asarray(py))
    return _PERM_CACHE[key]
