"""Pallas TPU kernel: two-level ray x triangle closest hit.

The hot op of the whole framework (SURVEY.md §3.4: the reference walks a
group tree per ray, src/shape.rs:399-436). TPU-native design:

  * triangles live in VMEM as (3, T) SoA slabs — the whole cow mesh is
    ~210 KB, far under the ~16 MB VMEM budget, so no HBM streaming is needed
    per tile;
  * rays are processed in tiles (grid dim 0); each tile keeps its running
    (t_best, index_best) in registers/VMEM;
  * level 1: every ray slab-tests each Morton cluster's AABB; a cluster is
    skipped entirely (scalar branch via @pl.when) when NO ray in the tile
    overlaps it — primary-ray tiles are coherent, so most clusters skip;
  * level 2: Möller-Trumbore on the cluster's L triangles against the whole
    tile, fully vectorized on the VPU as (RT, L) ops, masked min-reduce.

The kernel is forward-only; the integrator recomputes a differentiable t for
the winning triangle (gather + closed-form MT), so gradients are exact while
the search itself stays out of the autodiff graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import BIG, EPSILON


def _slab_overlap(ref, i, ox, oy, oz, ix, iy, iz):
    """Tile-wide AABB slab test against box i of an SMEM (6, N) table.
    Returns (tmin, tmax) per ray."""
    lo_x, lo_y, lo_z = ref[0, i], ref[1, i], ref[2, i]
    hi_x, hi_y, hi_z = ref[3, i], ref[4, i], ref[5, i]
    tx1 = (lo_x - ox) * ix
    tx2 = (hi_x - ox) * ix
    ty1 = (lo_y - oy) * iy
    ty2 = (hi_y - oy) * iy
    tz1 = (lo_z - oz) * iz
    tz2 = (hi_z - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    return tmin, tmax


def _kernel(o_ref, d_ref, p1_ref, e1_ref, e2_ref, aabb_ref, super_ref,
            t_ref, idx_ref, *, n_super: int, super_width: int, leaf: int,
            eps: float):
    """3-level traversal: superclusters -> clusters -> triangles. Empty boxes
    (lo > hi) on padding levels never overlap, so no bounds checks needed."""
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]

    # precompute safe inverse directions for the slab tests
    big = jnp.float32(BIG)

    def inv_dir(c):
        near_zero = jnp.abs(c) < 1e-30
        return jnp.where(near_zero, jnp.where(c >= 0, big, -big), 1.0 / jnp.where(near_zero, 1.0, c))

    ix, iy, iz = inv_dir(dx), inv_dir(dy), inv_dir(dz)

    rt = ox.shape[0]
    t_best0 = jnp.full((rt,), big, jnp.float32)
    idx_best0 = jnp.full((rt,), -1, jnp.int32)

    def cluster_body(c, carry):
        t_best, idx_best = carry
        tmin, tmax = _slab_overlap(aabb_ref, c, ox, oy, oz, ix, iy, iz)
        overlap = (tmax >= tmin) & (tmax >= 0.0) & (tmin < t_best)
        any_hit = jnp.any(overlap)

        def test_cluster(carry):
            t_best, idx_best = carry
            s = pl.ds(pl.multiple_of(c * leaf, leaf), leaf)
            p1x, p1y, p1z = p1_ref[0, s], p1_ref[1, s], p1_ref[2, s]
            e1x, e1y, e1z = e1_ref[0, s], e1_ref[1, s], e1_ref[2, s]
            e2x, e2y, e2z = e2_ref[0, s], e2_ref[1, s], e2_ref[2, s]

            # Möller-Trumbore, (RT, L) batched (reference: src/shape.rs:437-459)
            hx = dy[:, None] * e2z[None, :] - dz[:, None] * e2y[None, :]
            hy = dz[:, None] * e2x[None, :] - dx[:, None] * e2z[None, :]
            hz = dx[:, None] * e2y[None, :] - dy[:, None] * e2x[None, :]
            det = e1x[None, :] * hx + e1y[None, :] * hy + e1z[None, :] * hz
            det_ok = jnp.abs(det) >= eps
            f = 1.0 / jnp.where(det_ok, det, 1.0)
            sx = ox[:, None] - p1x[None, :]
            sy = oy[:, None] - p1y[None, :]
            sz = oz[:, None] - p1z[None, :]
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z[None, :] - sz * e1y[None, :]
            qy = sz * e1x[None, :] - sx * e1z[None, :]
            qz = sx * e1y[None, :] - sy * e1x[None, :]
            v = f * (dx[:, None] * qx + dy[:, None] * qy + dz[:, None] * qz)
            t = f * (e2x[None, :] * qx + e2y[None, :] * qy + e2z[None, :] * qz)
            ok = (
                det_ok
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= 0.0)
            )
            tt = jnp.where(ok, t, big)
            tmin_c = jnp.min(tt, axis=1)
            # argmin via masked iota-min (Mosaic-friendly)
            lane = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
            local = jnp.min(
                jnp.where(tt <= tmin_c[:, None], lane, jnp.int32(2**30)), axis=1)
            better = tmin_c < t_best
            t_best = jnp.where(better, tmin_c, t_best)
            idx_best = jnp.where(better, (c * leaf + local).astype(jnp.int32), idx_best)
            return t_best, idx_best

        return jax.lax.cond(any_hit, test_cluster, lambda cr: cr, (t_best, idx_best))

    def super_body(si, carry):
        t_best, idx_best = carry
        tmin, tmax = _slab_overlap(super_ref, si, ox, oy, oz, ix, iy, iz)
        overlap = (tmax >= tmin) & (tmax >= 0.0) & (tmin < t_best)

        def descend(carry):
            return jax.lax.fori_loop(
                si * super_width, (si + 1) * super_width, cluster_body, carry)

        return jax.lax.cond(jnp.any(overlap), descend, lambda cr: cr,
                            (t_best, idx_best))

    t_best, idx_best = jax.lax.fori_loop(
        0, n_super, super_body, (t_best0, idx_best0))
    t_ref[0, :] = t_best
    idx_ref[0, :] = idx_best


def _anyhit_kernel(o_ref, d_ref, maxt_ref, p1_ref, e1_ref, e2_ref, aabb_ref,
                   super_ref, hit_ref, *, n_super: int, super_width: int,
                   leaf: int, eps: float):
    """Shadow-ray occlusion: does ANY triangle intersect in [0, max_t)?

    Cheaper than closest-hit: no min/argmin bookkeeping, AABB cull bounded by
    max_t, and the cluster loop breaks as soon as every ray in the tile is
    occluded (lax.while_loop early exit).
    """
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
    maxt = maxt_ref[0, :]
    big = jnp.float32(BIG)

    def inv_dir(c):
        near_zero = jnp.abs(c) < 1e-30
        return jnp.where(near_zero, jnp.where(c >= 0, big, -big),
                         1.0 / jnp.where(near_zero, 1.0, c))

    ix, iy, iz = inv_dir(dx), inv_dir(dy), inv_dir(dz)
    rt = ox.shape[0]

    # found is carried as i32 (Mosaic mishandles vector<i1> loop carries);
    # once every ray is occluded the per-cluster overlap test goes all-False
    # and remaining clusters reduce to one skipped branch each.
    def body(c, found):
        tmin, tmax = _slab_overlap(aabb_ref, c, ox, oy, oz, ix, iy, iz)
        overlap = (tmax >= tmin) & (tmax >= 0.0) & (tmin < maxt) & (found == 0)
        any_hit = jnp.any(overlap)

        def test(found):
            s = pl.ds(pl.multiple_of(c * leaf, leaf), leaf)
            p1x, p1y, p1z = p1_ref[0, s], p1_ref[1, s], p1_ref[2, s]
            e1x, e1y, e1z = e1_ref[0, s], e1_ref[1, s], e1_ref[2, s]
            e2x, e2y, e2z = e2_ref[0, s], e2_ref[1, s], e2_ref[2, s]
            hx = dy[:, None] * e2z[None, :] - dz[:, None] * e2y[None, :]
            hy = dz[:, None] * e2x[None, :] - dx[:, None] * e2z[None, :]
            hz = dx[:, None] * e2y[None, :] - dy[:, None] * e2x[None, :]
            det = e1x[None, :] * hx + e1y[None, :] * hy + e1z[None, :] * hz
            det_ok = jnp.abs(det) >= eps
            f = 1.0 / jnp.where(det_ok, det, 1.0)
            sx = ox[:, None] - p1x[None, :]
            sy = oy[:, None] - p1y[None, :]
            sz = oz[:, None] - p1z[None, :]
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z[None, :] - sz * e1y[None, :]
            qy = sz * e1x[None, :] - sx * e1z[None, :]
            qz = sx * e1y[None, :] - sy * e1x[None, :]
            v = f * (dx[:, None] * qx + dy[:, None] * qy + dz[:, None] * qz)
            t = f * (e2x[None, :] * qx + e2y[None, :] * qy + e2z[None, :] * qz)
            ok = (det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= 0.0) & (t < maxt[:, None]))
            return found | jnp.any(ok, axis=1).astype(jnp.int32)

        return jax.lax.cond(any_hit, test, lambda f: f, found)

    def super_body(si, found):
        tmin, tmax = _slab_overlap(super_ref, si, ox, oy, oz, ix, iy, iz)
        overlap = (tmax >= tmin) & (tmax >= 0.0) & (tmin < maxt) & (found == 0)

        def descend(found):
            return jax.lax.fori_loop(
                si * super_width, (si + 1) * super_width, body, found)

        return jax.lax.cond(jnp.any(overlap), descend, lambda f: f, found)

    found = jax.lax.fori_loop(
        0, n_super, super_body, jnp.zeros((rt,), jnp.int32))
    hit_ref[0, :] = found


@functools.partial(
    jax.jit,
    static_argnames=("n_super", "super_width", "leaf", "ray_tile", "eps",
                     "interpret"),
)
def mesh_any_hit_pallas(o, d, max_t, tri_p1, tri_e1, tri_e2, cluster_aabb,
                        super_aabb, n_super: int, leaf: int,
                        super_width: int = 8, ray_tile: int = 256,
                        eps: float = EPSILON, interpret: bool = False):
    """Occlusion query: True where some triangle lies in [0, max_t) along the
    ray. o/d: (R, 3); max_t: (R,)."""
    R = o.shape[0]
    rt = min(ray_tile, max(R, 128))
    pad = (-R) % rt
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    m_p = jnp.pad(max_t, ((0, pad),), constant_values=-1.0)  # padded rays: no hit
    n_tiles = (R + pad) // rt

    kernel = functools.partial(_anyhit_kernel, n_super=n_super,
                               super_width=super_width, leaf=leaf, eps=eps)
    (hit,) = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tri_p1.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tri_p1.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tri_p1.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, cluster_aabb.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((6, super_aabb.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((1, rt), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, R + pad), jnp.int32)],
        interpret=interpret,
    )(
        o_p.astype(jnp.float32).T,
        d_p.astype(jnp.float32).T,
        m_p.astype(jnp.float32)[None, :],
        tri_p1.astype(jnp.float32).T,
        tri_e1.astype(jnp.float32).T,
        tri_e2.astype(jnp.float32).T,
        cluster_aabb.astype(jnp.float32).T,
        super_aabb.astype(jnp.float32).T,
    )
    return hit[0, :R] != 0


@functools.partial(
    jax.jit,
    static_argnames=("n_super", "super_width", "leaf", "ray_tile", "eps",
                     "interpret"),
)
def mesh_closest_hit_pallas(o, d, tri_p1, tri_e1, tri_e2, cluster_aabb,
                            super_aabb, n_super: int, leaf: int,
                            super_width: int = 8, ray_tile: int = 256,
                            eps: float = EPSILON, interpret: bool = False):
    """Closest triangle hit for a ray wavefront.

    o/d: (R, 3) f32. tri_*: (T, 3) f32 with T == n_clusters * leaf.
    cluster_aabb: (C, 6). Returns (t (R,), idx (R,)); idx == -1 for miss.
    """
    R = o.shape[0]
    rt = min(ray_tile, max(R, 128))
    pad = (-R) % rt
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    n_tiles = (R + pad) // rt

    o_t = o_p.astype(jnp.float32).T          # (3, R')
    d_t = d_p.astype(jnp.float32).T
    p1_t = tri_p1.astype(jnp.float32).T      # (3, T)
    e1_t = tri_e1.astype(jnp.float32).T
    e2_t = tri_e2.astype(jnp.float32).T
    aabb_t = cluster_aabb.astype(jnp.float32).T  # (6, C)
    sup_t = super_aabb.astype(jnp.float32).T     # (6, S)

    kernel = functools.partial(_kernel, n_super=n_super,
                               super_width=super_width, leaf=leaf, eps=eps)
    t, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(p1_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(e1_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(e2_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            # AABBs are read as scalars with a dynamic cluster index -> SMEM
            pl.BlockSpec(aabb_t.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(sup_t.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R + pad), jnp.float32),
            jax.ShapeDtypeStruct((1, R + pad), jnp.int32),
        ],
        interpret=interpret,
    )(o_t, d_t, p1_t, e1_t, e2_t, aabb_t, sup_t)
    return t[0, :R].astype(o.dtype), idx[0, :R]
