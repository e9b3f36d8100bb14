"""Rays as SoA (origin, direction) pairs (reference: src/ray.rs:5-25)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import transforms


class Ray(NamedTuple):
    """origin/direction: (..., 3). A registered pytree; vmap/jit friendly."""

    origin: jnp.ndarray
    direction: jnp.ndarray


def ray(origin, direction) -> Ray:
    return Ray(
        jnp.asarray(origin, dtype=jnp.result_type(float)),
        jnp.asarray(direction, dtype=jnp.result_type(float)),
    )


def position(r: Ray, t):
    """origin + direction * t (reference: src/ray.rs:15-17)."""
    t = jnp.asarray(t)
    return r.origin + r.direction * t[..., None]


def transform(r: Ray, m) -> Ray:
    """Map both origin and direction; direction NOT renormalized, so t stays in
    the pre-transform scale (reference: src/ray.rs:19-24)."""
    return Ray(
        transforms.transform_points(m, r.origin),
        transforms.transform_dirs(m, r.direction),
    )
