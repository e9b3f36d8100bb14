"""Object-space normals per primitive kind (reference: src/shape.rs:466-519).

Each function maps an object-space point (..., 3) to an (unnormalized)
object-space normal; the world transform + normalization happens in the
integrator via the cached inverse-transpose (reference: src/shape.rs:623-635).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.constants import EPSILON
from .vec import safe_sqrt


def sphere(p):
    """point - origin (reference: src/shape.rs:470)."""
    return p


def plane(p):
    """Constant +y (reference: src/shape.rs:471)."""
    return jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], p.dtype), p.shape)


def cube(p):
    """Face of the largest |component|; ties break x, then y, then z —
    matching the reference's if/else-if chain (src/shape.rs:472-486)."""
    ax = jnp.abs(p)
    maxc = jnp.max(ax, axis=-1, keepdims=True)
    is_x = ax[..., 0:1] == maxc
    is_y = (~is_x) & (ax[..., 1:2] == maxc)
    zeros = jnp.zeros_like(p[..., 0])
    nx = jnp.stack([p[..., 0], zeros, zeros], axis=-1)
    ny = jnp.stack([zeros, p[..., 1], zeros], axis=-1)
    nz = jnp.stack([zeros, zeros, p[..., 2]], axis=-1)
    return jnp.where(is_x, nx, jnp.where(is_y, ny, nz))


def cylinder(p, ymin, ymax, eps: float = EPSILON):
    """Caps win when within unit radius and within EPSILON of the cap plane
    (reference: src/shape.rs:487-500). ymin/ymax broadcast."""
    dist = p[..., 0] ** 2 + p[..., 2] ** 2
    y = p[..., 1]
    zeros = jnp.zeros_like(y)
    top = (dist < 1.0) & (y >= ymax - eps)
    bottom = (dist < 1.0) & (y <= ymin + eps)
    n_side = jnp.stack([p[..., 0], zeros, p[..., 2]], axis=-1)
    n_top = jnp.stack([zeros, jnp.ones_like(y), zeros], axis=-1)
    n_bot = jnp.stack([zeros, -jnp.ones_like(y), zeros], axis=-1)
    return jnp.where(top[..., None], n_top, jnp.where(bottom[..., None], n_bot, n_side))


def cone(p):
    """(x, -sign(y)*sqrt(x^2+z^2), z) (reference: src/shape.rs:501-507).

    NOTE: the reference cone normal has no cap handling — faithful here.
    """
    y = safe_sqrt(p[..., 0] ** 2 + p[..., 2] ** 2)
    y = jnp.where(p[..., 1] > 0.0, -y, y)
    return jnp.stack([p[..., 0], y, p[..., 2]], axis=-1)
