"""API-parity layer for the reference's homogeneous Tuple (vec4).

Mirrors src/tuple.rs: a point has w == 1, a vector w == 0, and — faithfully to
the reference's "w really?!" comments — dot/magnitude include the w component
(reference: src/tuple.rs:43-48, 67-73). The renderer itself uses rtc_tpu.ops.vec
(3-vectors); this module exists so the book's tuple test tables run unchanged
and for users who want the reference-shaped API.

Tuples are plain (..., 4) jnp arrays; arithmetic is ordinary array arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.constants import EPSILON


def tuple4(x, y, z, w):
    return jnp.stack(
        [jnp.asarray(x, dtype=jnp.result_type(float)),
         jnp.asarray(y, dtype=jnp.result_type(float)),
         jnp.asarray(z, dtype=jnp.result_type(float)),
         jnp.asarray(w, dtype=jnp.result_type(float))],
        axis=-1,
    )


def point(x, y, z):
    """(reference: src/tuple.rs:35-37)"""
    return tuple4(x, y, z, 1.0)


def vector(x, y, z):
    """(reference: src/tuple.rs:39-41)"""
    return tuple4(x, y, z, 0.0)


def is_point(t):
    return t[..., 3] == 1.0


def is_vector(t):
    return t[..., 3] == 0.0


def magnitude(t):
    """Includes w, like the reference (src/tuple.rs:43-48)."""
    return jnp.sqrt(jnp.sum(t * t, axis=-1))


def normalize(t):
    """Zero vector normalizes to zero (reference: src/tuple.rs:50-65)."""
    mag = magnitude(t)
    safe = jnp.where(mag > 0.0, mag, 1.0)
    return jnp.where(mag[..., None] > 0.0, t / safe[..., None], jnp.zeros_like(t))


def dot(a, b):
    """Includes w, like the reference (src/tuple.rs:67-73)."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    """3D cross of two vectors, returned as a w=0 vector (src/tuple.rs:75-84)."""
    c = jnp.cross(a[..., :3], b[..., :3])
    return jnp.concatenate([c, jnp.zeros_like(c[..., :1])], axis=-1)


def reflect(v, n):
    """(reference: src/tuple.rs:86-91)"""
    return v - n * (2.0 * dot(v, n))[..., None]


def almost_equal(a, b, eps: float = EPSILON):
    """Componentwise approximate equality (reference: src/tuple.rs:93-100)."""
    return jnp.all(jnp.abs(a - b) < eps, axis=-1)
