"""Object-space intersection kernels for every primitive kind.

The reference dispatches per-shape in a scalar match and pushes hits into a Vec
(src/shape.rs:248-463). Here each kind is a branchless, batched kernel over SoA
rays returning a fixed number of candidate-t slots plus validity masks:

    sphere   -> 2 slots   (src/shape.rs:258-273)
    plane    -> 1 slot    (src/shape.rs:274-282)
    cube     -> 2 slots   (src/shape.rs:283-319, check_axis :587-606)
    cylinder -> 4 slots: wall0, wall1, cap_min, cap_max  (src/shape.rs:320-355)
    cone     -> 4 slots: wall0/linear, wall1, cap_min, cap_max (src/shape.rs:356-398)
    triangle -> 1 slot    (Möller-Trumbore, src/shape.rs:437-459)

All functions take object-space origins `o` and directions `d` of shape
(..., 3) and broadcast. Invalid slots carry arbitrary (finite) t values; the
caller masks with `valid`. Everything is differentiable with finite gradients
(safe sqrt/div guards).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.constants import BIG, EPSILON
from .vec import safe_sqrt


class Hits(NamedTuple):
    """t: (..., k) candidate hit times; valid: (..., k) mask."""

    t: jnp.ndarray
    valid: jnp.ndarray


def _quadratic(a, b, c):
    """Both roots of ax^2+bx+c, smaller first; valid iff disc >= 0 (a != 0
    handled by callers). Safe for gradients at disc == 0."""
    disc = b * b - 4.0 * a * c
    valid = disc >= 0.0
    sq = safe_sqrt(disc)
    denom = jnp.where(jnp.abs(a) > 0.0, 2.0 * a, 1.0)
    t0 = (-b - sq) / denom
    t1 = (-b + sq) / denom
    return t0, t1, valid


def sphere(o, d) -> Hits:
    """Unit sphere at origin (reference: src/shape.rs:258-273).

    Roots come back in the reference's order: (-b-sqrt)/2a first. Since
    a = |d|^2 >= 0, that root is always the smaller one.
    """
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(d * o, axis=-1)
    c = jnp.sum(o * o, axis=-1) - 1.0
    t0, t1, valid = _quadratic(a, b, c)
    return Hits(jnp.stack([t0, t1], axis=-1), jnp.stack([valid, valid], axis=-1))


def plane(o, d, eps: float = EPSILON) -> Hits:
    """xz plane, +y normal (reference: src/shape.rs:274-282 — the comment at
    src/shape.rs:16 says "xy" but the code is xz)."""
    dy = d[..., 1]
    valid = jnp.abs(dy) >= eps
    t = -o[..., 1] / jnp.where(valid, dy, 1.0)
    return Hits(t[..., None], valid[..., None])


def _check_axis(o1, d1, lo, hi, eps: float):
    """Slab test for one axis (reference: src/shape.rs:587-606).

    For a parallel ray the reference multiplies the numerators by +inf; the
    resulting NaN-at-zero cases are skipped by Rust's NaN-ignoring min/max.
    Here the parallel case resolves to (-BIG, BIG) when the origin lies inside
    the slab (no constraint) and (BIG, BIG)/( -BIG, -BIG) outside (miss),
    which matches the reference's observable behavior without NaNs.
    """
    num_lo = lo - o1
    num_hi = hi - o1
    parallel = jnp.abs(d1) < eps
    d_safe = jnp.where(parallel, 1.0, d1)
    ta = num_lo / d_safe
    tb = num_hi / d_safe
    tmin = jnp.where(parallel, jnp.where(num_lo <= 0.0, -BIG, BIG), jnp.minimum(ta, tb))
    tmax = jnp.where(parallel, jnp.where(num_hi >= 0.0, BIG, -BIG), jnp.maximum(ta, tb))
    return tmin, tmax


def cube(o, d, eps: float = EPSILON) -> Hits:
    """Axis-aligned +-1 cube via three slab tests (reference: src/shape.rs:283-319)."""
    xtmin, xtmax = _check_axis(o[..., 0], d[..., 0], -1.0, 1.0, eps)
    ytmin, ytmax = _check_axis(o[..., 1], d[..., 1], -1.0, 1.0, eps)
    ztmin, ztmax = _check_axis(o[..., 2], d[..., 2], -1.0, 1.0, eps)
    tmin = jnp.maximum(jnp.maximum(xtmin, ytmin), ztmin)
    tmax = jnp.minimum(jnp.minimum(xtmax, ytmax), ztmax)
    valid = tmax >= tmin
    return Hits(jnp.stack([tmin, tmax], axis=-1), jnp.stack([valid, valid], axis=-1))


def aabb(o, d, box_min, box_max, eps: float = EPSILON) -> Hits:
    """General AABB slab test — the group-bounds cull (reference:
    src/shape.rs:399-425, bounds.rs). box_min/box_max: (..., 3).
    NOTE: the group cull uses `tmax > tmin` (strict), unlike the cube's >=
    (src/shape.rs:425)."""
    tmins, tmaxs = [], []
    for ax in range(3):
        tmin, tmax = _check_axis(o[..., ax], d[..., ax], box_min[..., ax], box_max[..., ax], eps)
        tmins.append(tmin)
        tmaxs.append(tmax)
    tmin = jnp.maximum(jnp.maximum(tmins[0], tmins[1]), tmins[2])
    tmax = jnp.minimum(jnp.minimum(tmaxs[0], tmaxs[1]), tmaxs[2])
    valid = tmax > tmin
    return Hits(jnp.stack([tmin, tmax], axis=-1), jnp.stack([valid, valid], axis=-1))


def _check_cap(o, d, t, eps_unused=None):
    """Cap-disc membership at time t: x^2 + z^2 <= |y| (reference:
    src/shape.rs:579-585 — the radius bound is |y|, NOT 1; for a cylinder cap
    at y=m this admits radius sqrt(|m|). Faithful to the reference)."""
    x = o[..., 0] + t * d[..., 0]
    y = o[..., 1] + t * d[..., 1]
    z = o[..., 2] + t * d[..., 2]
    return x * x + z * z <= jnp.abs(y)


def _caps(o, d, ymin, ymax, capped, eps: float):
    """Shared cap intersection for cylinder/cone (reference: src/shape.rs:537-573)."""
    oy, dy = o[..., 1], d[..., 1]
    dy_ok = jnp.abs(dy) >= eps  # is_almost_equal(dy, 0) -> skip (src/shape.rs:556-558)
    dy_safe = jnp.where(dy_ok, dy, 1.0)
    t_lo = (ymin - oy) / dy_safe
    t_hi = (ymax - oy) / dy_safe
    enabled = capped & dy_ok
    v_lo = enabled & _check_cap(o, d, t_lo)
    v_hi = enabled & _check_cap(o, d, t_hi)
    return t_lo, v_lo, t_hi, v_hi


def cylinder(o, d, ymin, ymax, capped, eps: float = EPSILON) -> Hits:
    """Unit-radius y-axis cylinder, open or capped, truncated to
    ymin < y < ymax (strict) (reference: src/shape.rs:320-355).

    ymin/ymax/capped broadcast against the ray batch; capped is boolean.
    """
    ox, oz = o[..., 0], o[..., 2]
    dx, dz = d[..., 0], d[..., 2]
    a = dx * dx + dz * dz
    wall_possible = jnp.abs(a) >= eps  # !is_almost_equal(a, 0) (src/shape.rs:326)
    b = 2.0 * (ox * dx + oz * dz)
    c = ox * ox + oz * oz - 1.0
    t0, t1, disc_ok = _quadratic(jnp.where(wall_possible, a, 1.0), b, c)
    # t0 <= t1 already (a > 0 when walls are possible), matching the swap at
    # src/shape.rs:338-340.
    y0 = o[..., 1] + t0 * d[..., 1]
    y1 = o[..., 1] + t1 * d[..., 1]
    v0 = wall_possible & disc_ok & (ymin < y0) & (y0 < ymax)
    v1 = wall_possible & disc_ok & (ymin < y1) & (y1 < ymax)
    t_lo, v_lo, t_hi, v_hi = _caps(o, d, ymin, ymax, capped, eps)
    return Hits(
        jnp.stack([t0, t1, t_lo, t_hi], axis=-1),
        jnp.stack([v0, v1, v_lo, v_hi], axis=-1),
    )


def cone(o, d, ymin, ymax, capped, eps: float = EPSILON) -> Hits:
    """Double-napped unit cone along y, truncated/capped
    (reference: src/shape.rs:356-398).

    When the quadratic degenerates (|a| < eps) the reference emits a single
    linear root t = -c/2b if |b| >= eps, unbounded by the y range; that root
    occupies slot 0 here.
    """
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    a = dx * dx - dy * dy + dz * dz
    b = 2.0 * (ox * dx - oy * dy + oz * dz)
    c = ox * ox - oy * oy + oz * oz

    a_zero = jnp.abs(a) < eps  # is_almost_equal(a, 0) (src/shape.rs:368)
    b_ok = jnp.abs(b) >= eps
    t_lin = -c / jnp.where(b_ok, 2.0 * b, 1.0)

    t0, t1, disc_ok = _quadratic(jnp.where(a_zero, 1.0, a), b, c)
    # Reference swaps so t0 <= t1 (src/shape.rs:381-383); a may be negative
    # for cones so the swap is real here.
    t_sm = jnp.minimum(t0, t1)
    t_lg = jnp.maximum(t0, t1)
    y0 = oy + t_sm * dy
    y1 = oy + t_lg * dy
    v0_quad = ~a_zero & disc_ok & (ymin < y0) & (y0 < ymax)
    v1_quad = ~a_zero & disc_ok & (ymin < y1) & (y1 < ymax)

    slot0_t = jnp.where(a_zero, t_lin, t_sm)
    slot0_v = jnp.where(a_zero, b_ok, v0_quad)
    slot1_t = t_lg
    slot1_v = v1_quad

    t_lo, v_lo, t_hi, v_hi = _caps(o, d, ymin, ymax, capped, eps)
    return Hits(
        jnp.stack([slot0_t, slot1_t, t_lo, t_hi], axis=-1),
        jnp.stack([slot0_v, slot1_v, v_lo, v_hi], axis=-1),
    )


def triangle(o, d, p1, e1, e2, eps: float = EPSILON):
    """Möller-Trumbore (reference: src/shape.rs:437-459).

    o/d: (..., 3) rays; p1/e1/e2: (..., 3) triangle data (broadcast against
    rays by the caller — e.g. rays (R, 1, 3) x triangles (T, 3)).

    Returns (t, valid, u, v); u/v are the barycentric coordinates the
    reference leaves as a commented-out stub (src/intersection.rs:381-386) —
    exposed here for smooth-triangle support.
    """
    dce2 = jnp.cross(d, e2)
    det = jnp.sum(e1 * dce2, axis=-1)
    det_ok = jnp.abs(det) >= eps  # parallel -> miss (src/shape.rs:443)
    f = 1.0 / jnp.where(det_ok, det, 1.0)
    p1o = o - p1
    u = f * jnp.sum(p1o * dce2, axis=-1)
    oce1 = jnp.cross(p1o, e1)
    v = f * jnp.sum(d * oce1, axis=-1)
    t = f * jnp.sum(e2 * oce1, axis=-1)
    valid = det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, valid, u, v
