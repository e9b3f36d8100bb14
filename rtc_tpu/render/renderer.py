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
from .camera import Camera, camera_rays


@partial(jax.jit, static_argnames=("hsize", "vsize"))
def _gen_rays(cam_inv, half_width, half_height, pixel_size,
              hsize: int, vsize: int):
    return camera_rays(cam_inv, hsize, vsize, half_width, half_height,
                       pixel_size, cam_inv.dtype)


@jax.jit
def _permute(o, d, perm):
    return o[perm], d[perm]


@partial(jax.jit, static_argnames=("cfg",))
def _shade_rays(scene: Scene, o, d, cfg: RenderConfig):
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
    return colors.reshape(-1, 3)[:n_rays]


@jax.jit
def _unpermute(colors, inv_perm):
    return colors[inv_perm]


def render(scene: Scene, camera: Camera, cfg: RenderConfig = DEFAULT_CONFIG):
    """Render to an (V, H, 3) image array (device).

    Morton ordering is applied OUTSIDE the shading jit: both traversal orders
    run the exact same compiled executable on gathered inputs, so Morton
    order is a pure permutation of the scanline render bit-for-bit (fusing
    the gathers into the shading graph would let XLA re-contract FMAs per
    compilation instance and ulp-diverge at shadow/hit decision boundaries).
    """
    dtype = cfg.jnp_dtype()
    o, d = _gen_rays(
        jnp.asarray(camera.transform_inverse, dtype),
        jnp.asarray(camera.half_width, dtype),
        jnp.asarray(camera.half_height, dtype),
        jnp.asarray(camera.pixel_size, dtype),
        camera.hsize,
        camera.vsize,
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    morton = cfg.ray_order == "morton"
    if morton:
        perm, inv_perm = _device_morton_perm(camera.vsize, camera.hsize)
        o, d = _permute(o, d, perm)
        # the shading executable is order-independent; normalize the config
        # so both orders share one compilation cache entry
        cfg = dataclasses.replace(cfg, ray_order="scanline")
    colors = _shade_rays(scene, o, d, cfg)
    if morton:
        colors = _unpermute(colors, inv_perm)
    return colors.reshape(camera.vsize, camera.hsize, 3)


_PERM_CACHE: dict = {}


def _device_morton_perm(vsize: int, hsize: int):
    """Device-resident Morton permutation, cached per canvas shape (a fresh
    host->device upload per frame would dominate on remote-attached
    backends)."""
    key = (vsize, hsize)
    if key not in _PERM_CACHE:
        from .order import morton_perm

        perm, inv_perm = morton_perm(vsize, hsize)
        _PERM_CACHE[key] = (jnp.asarray(perm), jnp.asarray(inv_perm))
    return _PERM_CACHE[key]
