"""Wavefront Whitted integrator.

The reference recurses per pixel (src/world.rs:80-163); here one traced graph
processes a whole wavefront of rays per node of the (statically unrolled)
bounce tree. With the reference's budget semantics —

    internal_color_at(rem): rem < 1 -> BLACK             (src/world.rs:85-87)
      shade_hit(rem-1):                                  (src/world.rs:95)
        reflected/refracted_color(rem-2): rem-2 < 1 -> BLACK  (src/world.rs:68-69)
          internal_color_at(rem-3)                       (src/world.rs:126,159)

— each secondary ray costs 3 budget, so RECURSION_LIMIT = 5 yields exactly two
shading levels (primary + one reflect/refract pair). The unroll reproduces the
double-decrement semantics for ANY budget, including the
mutually-reflective-surfaces termination test (src/world.rs:357-373).

Everything is pure jnp: differentiable, jit/vmap/shard_map friendly. Masked
lanes carry finite dummy values so no NaNs flow through values or gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import intersect, lighting, normals, patterns
from ..ops.vec import (dot, normalize, normalize3, pack3, reflect,
                       safe_sqrt, unpack3)
from ..utils.config import RenderConfig
from ..utils.constants import BIG
from ..scene.compile import Scene

# kind codes (scene.shapes.KIND_CODES)
SPHERE, PLANE, CUBE, CYLINDER, CONE = 0, 1, 2, 3, 4

# TLAS kernels always tile rays at 128 (vs the flat kernel's adaptive
# min(512, max(128, R))): instance visits are the unit of kernel work, and a
# tile visits every instance ANY of its rays overlaps — tighter fixed tiles
# shed whole instance visits, measured 15% on the 90-cow herd.
TLAS_RAY_TILE = 128


class HitInfo(NamedTuple):
    t: jnp.ndarray        # (R,) hit time (BIG when miss)
    valid: jnp.ndarray    # (R,) bool
    obj: jnp.ndarray      # (R,) i32 object id (clamped valid index)
    prim: jnp.ndarray     # (R,) i32 analytic prim id (clamped)
    tri: jnp.ndarray      # (R,) i32 triangle id (clamped)
    is_tri: jnp.ndarray   # (R,) bool
    tri_n: jnp.ndarray    # (R, 3) winning triangle's world normal (pre-gathered
                          # at closest-hit time so the payload survives the
                          # cross-device min-reduction under primitive sharding)


def _local_rays(inv, o, d):
    """Transform a ray wavefront into each prim's object space.
    inv: (N, 3, 4); o/d: (R, 3) -> (R, N, 3)."""
    o_l = jnp.einsum("nij,rj->rni", inv[:, :, :3], o) + inv[:, :, 3]
    d_l = jnp.einsum("nij,rj->rni", inv[:, :, :3], d)
    return o_l, d_l


def prim_candidates(scene: Scene, o, d, eps, ids=None):
    """Candidate hit slots for analytic prims: (R, N, 4) t + valid.

    Every kind's kernel runs on every prim, masked by kind — N is small and
    TPU prefers straight-line masked math to gather/switch (the reference's
    per-kind match is at src/shape.rs:257-460).

    ids: optional static tuple restricting to a subset of prims (used by the
    refraction-index pass).
    """
    inv = scene.prim_inv
    kind = scene.prim_kind
    params = scene.prim_params
    if ids is not None:
        idx = jnp.asarray(ids, dtype=jnp.int32)
        inv, kind, params = inv[idx], kind[idx], params[idx]
    o_l, d_l = _local_rays(inv, o, d)
    ymin, ymax = params[:, 0], params[:, 1]
    capped = params[:, 2] > 0.5

    def pad4(h: intersect.Hits):
        k = h.t.shape[-1]
        if k == 4:
            return h
        pad = [(0, 0)] * (h.t.ndim - 1) + [(0, 4 - k)]
        return intersect.Hits(
            jnp.pad(h.t, pad), jnp.pad(h.valid, pad, constant_values=False)
        )

    sp = pad4(intersect.sphere(o_l, d_l))
    pl = pad4(intersect.plane(o_l, d_l, eps))
    cu = pad4(intersect.cube(o_l, d_l, eps))
    cy = pad4(intersect.cylinder(o_l, d_l, ymin, ymax, capped, eps))
    co = pad4(intersect.cone(o_l, d_l, ymin, ymax, capped, eps))

    k = kind[None, :, None]
    t = jnp.where(k == SPHERE, sp.t, 0.0)
    v = (k == SPHERE) & sp.valid
    for code, h in ((PLANE, pl), (CUBE, cu), (CYLINDER, cy), (CONE, co)):
        t = jnp.where(k == code, h.t, t)
        v = jnp.where(k == code, h.valid, v)
    return t, v


def tri_candidates(scene: Scene, o, d, eps, with_uv: bool = False):
    """Brute-force ray x triangle sweep: (R, T) t + valid (+ barycentric
    u, v when with_uv)."""
    t, valid, u, v = intersect.triangle(
        o[:, None, :], d[:, None, :],
        scene.tri_p1[None, :, :], scene.tri_e1[None, :, :], scene.tri_e2[None, :, :],
        eps,
    )
    if with_uv:
        return t, valid, u, v
    return t, valid


_KERNEL_IMPLS = ("pallas", "pallas_interpret", "mxu", "mxu_interpret")


import functools

import jax as _jax
import numpy as _np


@functools.partial(_jax.custom_jvp, nondiff_argnums=(0,))
def _kernel_closest(spec, o, d, p1, e1, e2, aabb, sup):
    """Forward-only Pallas search with exact derivatives attached.

    spec: (impl, n_super, leaf, ray_tile, eps) — hashable/static.
    Primal: the kernel's (t, idx) directly (no recompute). Tangent: a single
    gathered Möller-Trumbore evaluation at the winning triangle (closed-form
    t — implicit-function derivative), linearized by jax.jvp. Under plain
    rendering the tangent rule never runs, so the refinement gathers cost
    nothing; under autodiff gradients are exact w.r.t. rays AND triangle
    vertices while the O(R x T) search stays out of the graph.
    """
    impl, n_super, leaf, ray_tile, eps = spec
    from ..ops.pallas.mesh_intersect import (
        mesh_closest_hit_mxu, mesh_closest_hit_pallas)

    sg = _jax.lax.stop_gradient
    fn = mesh_closest_hit_mxu if impl.startswith("mxu") else mesh_closest_hit_pallas
    t, idx = fn(sg(o), sg(d), sg(p1), sg(e1), sg(e2), sg(aabb), sg(sup),
                n_super=n_super, leaf=leaf, ray_tile=ray_tile, eps=eps,
                interpret=impl.endswith("_interpret"))
    return t, idx


@_kernel_closest.defjvp
def _kernel_closest_jvp(spec, primals, tangents):
    o, d, p1, e1, e2, aabb, sup = primals
    do, dd, dp1, de1, de2, _, _ = tangents
    t, idx = _kernel_closest(spec, *primals)
    eps = spec[4]
    hit_ok = idx >= 0
    idx_c = jnp.where(hit_ok, idx, 0)

    def refined_t(o, d, p1, e1, e2):
        t_ref, _, _, _ = intersect.triangle(
            o, d, p1[idx_c], e1[idx_c], e2[idx_c], eps)
        return t_ref

    _, dt = _jax.jvp(refined_t, (o, d, p1, e1, e2), (do, dd, dp1, de1, de2))
    dt = jnp.where(hit_ok, dt, 0.0)
    didx = _np.zeros(idx.shape, dtype=_jax.dtypes.float0)
    return (t, idx), (dt, didx)


@functools.partial(_jax.custom_jvp, nondiff_argnums=(0,))
def _kernel_closest_n(spec, o, d, p1, e1, e2, nrm, aabb, sup):
    """_kernel_closest variant that also selects the winner's flat normal
    IN-KERNEL (mxu only; flat meshes — smooth meshes blend corner normals at
    the winner outside the kernel). The n output's autodiff semantics match
    the gather nrm[idx] it replaces: tangent dn = dnrm[idx] masked on miss."""
    impl, n_super, leaf, ray_tile, eps = spec
    from ..ops.pallas.mesh_intersect import mesh_closest_hit_mxu

    sg = _jax.lax.stop_gradient
    t, idx, n = mesh_closest_hit_mxu(
        sg(o), sg(d), sg(p1), sg(e1), sg(e2), sg(aabb), sg(sup),
        n_super=n_super, leaf=leaf, ray_tile=ray_tile, eps=eps,
        interpret=impl.endswith("_interpret"), tri_n=sg(nrm))
    return t, idx, n


@functools.partial(_jax.custom_jvp, nondiff_argnums=(0,))
def _kernel_closest_uv(spec, o, d, p1, e1, e2, aabb, sup):
    """_kernel_closest variant that also selects the winner's barycentric
    (u, v) IN-KERNEL (mxu only; smooth meshes blend corner normals with
    these weights OUTSIDE the kernel). Autodiff semantics match the gathered
    Möller-Trumbore recompute it replaces: tangent d(u,v) from a single
    refined evaluation at the winning triangle."""
    impl, n_super, leaf, ray_tile, eps = spec
    from ..ops.pallas.mesh_intersect import mesh_closest_hit_mxu

    sg = _jax.lax.stop_gradient
    t, idx, uv = mesh_closest_hit_mxu(
        sg(o), sg(d), sg(p1), sg(e1), sg(e2), sg(aabb), sg(sup),
        n_super=n_super, leaf=leaf, ray_tile=ray_tile, eps=eps,
        interpret=impl.endswith("_interpret"), want_uv=True)
    return t, idx, uv


@_kernel_closest_uv.defjvp
def _kernel_closest_uv_jvp(spec, primals, tangents):
    o, d, p1, e1, e2, aabb, sup = primals
    do, dd, dp1, de1, de2, _, _ = tangents
    t, idx, uv = _kernel_closest_uv(spec, *primals)
    eps = spec[4]
    hit_ok = idx >= 0
    idx_c = jnp.where(hit_ok, idx, 0)

    def refined(o, d, p1, e1, e2):
        t_ref, _, u_ref, v_ref = intersect.triangle(
            o, d, p1[idx_c], e1[idx_c], e2[idx_c], eps)
        return t_ref, jnp.stack([u_ref, v_ref], axis=-1)

    _, (dt, duv) = _jax.jvp(refined, (o, d, p1, e1, e2),
                            (do, dd, dp1, de1, de2))
    dt = jnp.where(hit_ok, dt, 0.0)
    duv = jnp.where(hit_ok[:, None], duv, 0.0)
    didx = _np.zeros(idx.shape, dtype=_jax.dtypes.float0)
    return (t, idx, uv), (dt, didx, duv)


@functools.partial(_jax.custom_jvp, nondiff_argnums=(0,))
def _kernel_closest_sn(spec, o, d, p1, e1, e2, snc, aabb, sup):
    """_kernel_closest variant for SMOOTH meshes: the winner's three corner
    normals (snc: (T, 9) = [sn1|sn2|sn3]) are blended with its barycentric
    (u, v) IN-KERNEL; n is the unnormalized blend (zeros on miss). Autodiff
    semantics match the gathered recompute it replaces: tangents from a
    single refined Möller-Trumbore at the winning triangle feeding the same
    blend."""
    impl, n_super, leaf, ray_tile, eps = spec
    from ..ops.pallas.mesh_intersect import mesh_closest_hit_mxu

    sg = _jax.lax.stop_gradient
    t, idx, n = mesh_closest_hit_mxu(
        sg(o), sg(d), sg(p1), sg(e1), sg(e2), sg(aabb), sg(sup),
        n_super=n_super, leaf=leaf, ray_tile=ray_tile, eps=eps,
        interpret=impl.endswith("_interpret"), tri_sn=sg(snc))
    return t, idx, n


@_kernel_closest_sn.defjvp
def _kernel_closest_sn_jvp(spec, primals, tangents):
    o, d, p1, e1, e2, snc, aabb, sup = primals
    do, dd, dp1, de1, de2, dsnc, _, _ = tangents
    t, idx, n = _kernel_closest_sn(spec, *primals)
    eps = spec[4]
    hit_ok = idx >= 0
    idx_c = jnp.where(hit_ok, idx, 0)

    def refined(o, d, p1, e1, e2, snc):
        t_ref, _, u, v = intersect.triangle(
            o, d, p1[idx_c], e1[idx_c], e2[idx_c], eps)
        g = snc[idx_c]                                   # (R, 9)
        w0 = (1.0 - u - v)[:, None]
        n_ref = w0 * g[:, 0:3] + u[:, None] * g[:, 3:6] + v[:, None] * g[:, 6:9]
        return t_ref, n_ref

    _, (dt, dn) = _jax.jvp(refined, (o, d, p1, e1, e2, snc),
                           (do, dd, dp1, de1, de2, dsnc))
    dt = jnp.where(hit_ok, dt, 0.0)
    dn = jnp.where(hit_ok[:, None], dn, 0.0)
    didx = _np.zeros(idx.shape, dtype=_jax.dtypes.float0)
    return (t, idx, n), (dt, didx, dn)


@_kernel_closest_n.defjvp
def _kernel_closest_n_jvp(spec, primals, tangents):
    o, d, p1, e1, e2, nrm, aabb, sup = primals
    do, dd, dp1, de1, de2, dnrm, _, _ = tangents
    t, idx, n = _kernel_closest_n(spec, *primals)
    eps = spec[4]
    hit_ok = idx >= 0
    idx_c = jnp.where(hit_ok, idx, 0)

    def refined(o, d, p1, e1, e2, nrm):
        t_ref, _, _, _ = intersect.triangle(
            o, d, p1[idx_c], e1[idx_c], e2[idx_c], eps)
        return t_ref, nrm[idx_c]

    _, (dt, dn) = _jax.jvp(refined, (o, d, p1, e1, e2, nrm),
                           (do, dd, dp1, de1, de2, dnrm))
    dt = jnp.where(hit_ok, dt, 0.0)
    dn = jnp.where(hit_ok[:, None], dn, 0.0)
    didx = _np.zeros(idx.shape, dtype=_jax.dtypes.float0)
    return (t, idx, n), (dt, didx, dn)


@functools.partial(_jax.custom_jvp, nondiff_argnums=(0,))
def _kernel_closest_shadow(spec, o, d, p1, e1, e2, nrm, aabb, lp):
    """FUSED closest-hit + shadow pass for pure-mesh scenes (see
    mesh_intersect._kernel_mxu_cs): one launch per bounce node computes the
    closest hit AND whether the mesh occludes the light from its over_point,
    deriving the shadow ray in-registers. Returns (t, idx, n, shadowed);
    tangent rule identical to _kernel_closest_n (shadowed is boolean — the
    reference's shadow gating is non-differentiable, src/material.rs:57)."""
    impl, _, leaf, ray_tile, eps = spec
    from ..ops.pallas.mesh_intersect import mesh_closest_shadow_mxu

    sg = _jax.lax.stop_gradient
    return mesh_closest_shadow_mxu(
        sg(o), sg(d), sg(p1), sg(e1), sg(e2), sg(nrm), sg(aabb), sg(lp),
        leaf=leaf, ray_tile=ray_tile, eps=eps,
        interpret=impl.endswith("_interpret"))


@_kernel_closest_shadow.defjvp
def _kernel_closest_shadow_jvp(spec, primals, tangents):
    o, d, p1, e1, e2, nrm, aabb, lp = primals
    do, dd, dp1, de1, de2, dnrm, _, _ = tangents
    t, idx, n, sh = _kernel_closest_shadow(spec, *primals)
    eps = spec[4]
    hit_ok = idx >= 0
    idx_c = jnp.where(hit_ok, idx, 0)

    def refined(o, d, p1, e1, e2, nrm):
        t_ref, _, _, _ = intersect.triangle(
            o, d, p1[idx_c], e1[idx_c], e2[idx_c], eps)
        return t_ref, nrm[idx_c]

    _, (dt, dn) = _jax.jvp(refined, (o, d, p1, e1, e2, nrm),
                           (do, dd, dp1, de1, de2, dnrm))
    dt = jnp.where(hit_ok, dt, 0.0)
    dn = jnp.where(hit_ok[:, None], dn, 0.0)
    z0 = lambda x: _np.zeros(x.shape, dtype=_jax.dtypes.float0)
    return (t, idx, n, sh), (dt, z0(idx), dn, z0(sh))


@functools.partial(_jax.custom_jvp, nondiff_argnums=(0,))
def _kernel_closest_shadow_sn(spec, o, d, p1, e1, e2, snc, aabb, lp):
    """_kernel_closest_shadow for SMOOTH meshes: phase 1 blends the
    winner's corner normals in-kernel (snc: (T, 9)); n is the raw blend
    (the caller normalizes, mirroring closest_hit's sn path). Tangent rule
    identical to _kernel_closest_sn."""
    impl, _, leaf, ray_tile, eps = spec
    from ..ops.pallas.mesh_intersect import mesh_closest_shadow_mxu

    sg = _jax.lax.stop_gradient
    return mesh_closest_shadow_mxu(
        sg(o), sg(d), sg(p1), sg(e1), sg(e2), sg(p1[:, :3] * 0.0),
        sg(aabb), sg(lp), leaf=leaf, ray_tile=ray_tile, eps=eps,
        interpret=impl.endswith("_interpret"), tri_sn=sg(snc))


@_kernel_closest_shadow_sn.defjvp
def _kernel_closest_shadow_sn_jvp(spec, primals, tangents):
    o, d, p1, e1, e2, snc, aabb, lp = primals
    do, dd, dp1, de1, de2, dsnc, _, _ = tangents
    t, idx, n, sh = _kernel_closest_shadow_sn(spec, *primals)
    eps = spec[4]
    hit_ok = idx >= 0
    idx_c = jnp.where(hit_ok, idx, 0)

    def refined(o, d, p1, e1, e2, snc):
        t_ref, _, u, v = intersect.triangle(
            o, d, p1[idx_c], e1[idx_c], e2[idx_c], eps)
        g = snc[idx_c]                                   # (R, 9)
        w0 = (1.0 - u - v)[:, None]
        n_ref = w0 * g[:, 0:3] + u[:, None] * g[:, 3:6] + v[:, None] * g[:, 6:9]
        return t_ref, n_ref

    _, (dt, dn) = _jax.jvp(refined, (o, d, p1, e1, e2, snc),
                           (do, dd, dp1, de1, de2, dsnc))
    dt = jnp.where(hit_ok, dt, 0.0)
    dn = jnp.where(hit_ok[:, None], dn, 0.0)
    z0 = lambda x: _np.zeros(x.shape, dtype=_jax.dtypes.float0)
    return (t, idx, n, sh), (dt, z0(idx), dn, z0(sh))


@functools.partial(_jax.custom_jvp, nondiff_argnums=(0,))
def _kernel_closest_tlas(spec, o, d, p1, e1, e2, nrm, caabb, inst_ab,
                         inst_rf, inst_aabb, inst_mesh, inst_obj):
    """Forward-only INSTANCED (TLAS) search with exact derivatives.

    spec: (impl, leaf, cm, ray_tile, eps). Returns (t, enc, obj, n): enc is
    the instance-local winner id (instance * cm * leaf + mesh-local row, -1
    miss), obj the winning instance's object id and n its unnormalized world
    normal — both selected in-kernel. The tangent rule recomputes the
    winner's Möller-Trumbore in the instance's OBJECT space (rays pushed
    through the world->object affine), so gradients are exact w.r.t. rays,
    unique-mesh geometry AND instance transforms while the search stays out
    of the graph."""
    impl, leaf, cm, ray_tile, eps = spec
    from ..ops.pallas.mesh_intersect import mesh_closest_hit_tlas_mxu

    sg = _jax.lax.stop_gradient
    t, enc, obj, n = mesh_closest_hit_tlas_mxu(
        sg(o), sg(d), sg(p1), sg(e1), sg(e2), sg(caabb), sg(inst_ab),
        sg(inst_rf), sg(inst_aabb), sg(inst_mesh), sg(inst_obj), leaf=leaf,
        cm=cm, ray_tile=ray_tile, eps=eps,
        interpret=impl.endswith("_interpret"), tri_n=sg(nrm))
    return t, enc, obj, n


@_kernel_closest_tlas.defjvp
def _kernel_closest_tlas_jvp(spec, primals, tangents):
    (o, d, p1, e1, e2, nrm, caabb, inst_ab, inst_rf, inst_aabb, inst_mesh,
     inst_obj) = primals
    do, dd, dp1, de1, de2, dnrm, _, dab, _, _, _, _ = tangents
    t, enc, obj, n = _kernel_closest_tlas(spec, *primals)
    _, leaf, cm, _, eps = spec
    tm = cm * leaf
    hit_ok = enc >= 0
    enc_c = jnp.where(hit_ok, enc, 0)
    i_inst = enc_c // tm
    row = inst_mesh[i_inst] * tm + (enc_c % tm)

    def refined(o, d, p1, e1, e2, nrm, inst_ab):
        A = inst_ab[i_inst, :9].reshape(-1, 3, 3)
        b = inst_ab[i_inst, 9:]
        o2 = jnp.einsum("rij,rj->ri", A, o) + b
        d2 = jnp.einsum("rij,rj->ri", A, d)
        t_ref, _, _, _ = intersect.triangle(
            o2, d2, p1[row], e1[row], e2[row], eps)
        n_ref = jnp.einsum("rk,rka->ra", nrm[row], A)
        return t_ref, n_ref

    _, (dt, dn) = _jax.jvp(refined, (o, d, p1, e1, e2, nrm, inst_ab),
                           (do, dd, dp1, de1, de2, dnrm, dab))
    dt = jnp.where(hit_ok, dt, 0.0)
    dn = jnp.where(hit_ok[:, None], dn, 0.0)
    z0 = lambda x: _np.zeros(x.shape, dtype=_jax.dtypes.float0)
    return (t, enc, obj, n), (dt, z0(enc), z0(obj), dn)


@functools.partial(_jax.custom_jvp, nondiff_argnums=(0,))
def _kernel_closest_tlas_sn(spec, o, d, p1, e1, e2, snc, caabb, inst_ab,
                            inst_rf, inst_aabb, inst_mesh, inst_obj):
    """_kernel_closest_tlas for SMOOTH instanced meshes: the winner's three
    OBJECT-space corner normals (snc: (Tu, 9) = [sn1|sn2|sn3]) are blended
    with its barycentric (u, v) IN-KERNEL and pushed through the instance
    inverse-transpose — the smooth-triangle capability the reference stubs
    (src/intersection.rs:381-386), composed with instancing. The tangent
    rule recomputes the winner's Möller-Trumbore in instance object space
    feeding the same blend, so gradients flow to rays, unique geometry,
    corner normals AND instance transforms."""
    impl, leaf, cm, ray_tile, eps = spec
    from ..ops.pallas.mesh_intersect import mesh_closest_hit_tlas_mxu

    sg = _jax.lax.stop_gradient
    t, enc, obj, n = mesh_closest_hit_tlas_mxu(
        sg(o), sg(d), sg(p1), sg(e1), sg(e2), sg(caabb), sg(inst_ab),
        sg(inst_rf), sg(inst_aabb), sg(inst_mesh), sg(inst_obj), leaf=leaf,
        cm=cm, ray_tile=ray_tile, eps=eps,
        interpret=impl.endswith("_interpret"), tri_sn=sg(snc))
    return t, enc, obj, n


@_kernel_closest_tlas_sn.defjvp
def _kernel_closest_tlas_sn_jvp(spec, primals, tangents):
    (o, d, p1, e1, e2, snc, caabb, inst_ab, inst_rf, inst_aabb, inst_mesh,
     inst_obj) = primals
    do, dd, dp1, de1, de2, dsnc, _, dab, _, _, _, _ = tangents
    t, enc, obj, n = _kernel_closest_tlas_sn(spec, *primals)
    _, leaf, cm, _, eps = spec
    tm = cm * leaf
    hit_ok = enc >= 0
    enc_c = jnp.where(hit_ok, enc, 0)
    i_inst = enc_c // tm
    row = inst_mesh[i_inst] * tm + (enc_c % tm)

    def refined(o, d, p1, e1, e2, snc, inst_ab):
        A = inst_ab[i_inst, :9].reshape(-1, 3, 3)
        b = inst_ab[i_inst, 9:]
        o2 = jnp.einsum("rij,rj->ri", A, o) + b
        d2 = jnp.einsum("rij,rj->ri", A, d)
        t_ref, _, u, v = intersect.triangle(
            o2, d2, p1[row], e1[row], e2[row], eps)
        g = snc[row]                                     # (R, 9)
        w0 = (1.0 - u - v)[:, None]
        n_obj = (w0 * g[:, 0:3] + u[:, None] * g[:, 3:6]
                 + v[:, None] * g[:, 6:9])
        n_ref = jnp.einsum("rk,rka->ra", n_obj, A)
        return t_ref, n_ref

    _, (dt, dn) = _jax.jvp(refined, (o, d, p1, e1, e2, snc, inst_ab),
                           (do, dd, dp1, de1, de2, dsnc, dab))
    dt = jnp.where(hit_ok, dt, 0.0)
    dn = jnp.where(hit_ok[:, None], dn, 0.0)
    z0 = lambda x: _np.zeros(x.shape, dtype=_jax.dtypes.float0)
    return (t, enc, obj, n), (dt, z0(enc), z0(obj), dn)


def _tlas_closest(scene: Scene, o, d, cfg: RenderConfig, impl: str):
    """Dispatch the TLAS closest-hit kernel: (t, enc, obj, n_unnormalized).
    t is already BIG on miss; enc == -1, obj == 0, n == 0 there.
    Rays tile at TLAS_RAY_TILE (see the constant's comment). Smooth
    instanced scenes (static.tlas_sn) route to the corner-normal-blending
    variant."""
    st = scene.static
    tl = scene.tlas
    spec = (impl, st.cluster_size, st.tlas_cm, TLAS_RAY_TILE, cfg.epsilon)
    if st.tlas_sn:
        return _kernel_closest_tlas_sn(
            spec, o, d, tl.p1, tl.e1, tl.e2, tl.sn, tl.caabb, tl.inst_ab,
            tl.inst_rf, tl.inst_aabb, tl.inst_mesh, tl.inst_obj)
    return _kernel_closest_tlas(
        spec, o, d, tl.p1, tl.e1, tl.e2, tl.n, tl.caabb, tl.inst_ab,
        tl.inst_rf, tl.inst_aabb, tl.inst_mesh, tl.inst_obj)


def _use_tlas(scene: Scene, cfg: RenderConfig, impl: str) -> bool:
    """The instanced path serves multi-instance scenes on the mxu backend.
    Under primitive sharding (cfg.prim_axis set) the integrator falls back
    to the flat world-table path: the triangle shards each carry a valid
    local cluster structure and partial hits combine min-by-t over the
    'prims' axis, while the TLAS tables stay replicated and UNUSED. Sharding
    the instance tables themselves is not implemented (a prim-sharded
    instanced scene pays the flat-table cost)."""
    return bool(scene.static.tlas_n_inst) and impl.startswith("mxu") \
        and cfg.prim_axis is None


def _use_fused_shadow(scene: Scene, cfg: RenderConfig, impl: str) -> bool:
    """Fused closest+shadow eligibility: pure-mesh scene (flat or smooth)
    whose feature slab fits one VMEM block, kernel backend, shadows on, no
    primitive sharding, no TLAS. (Analytic prims keep the split sweeps:
    their hit merge happens outside the kernel.)"""
    from ..ops.pallas.mesh_intersect import VMEM_TRI_BUDGET, _blocked

    st = scene.static
    budget = (VMEM_TRI_BUDGET if not st.any_smooth
              else (VMEM_TRI_BUDGET * 43) // 49)  # 9-row corner slab
    return (cfg.fused_shadow and cfg.shadows and impl.startswith("mxu")
            and cfg.prim_axis is None and st.n_prims == 0
            and st.n_tris > 0
            and not _use_tlas(scene, cfg, impl)
            and _blocked(scene.tri_p1, st.cluster_size, budget) == 1)


def _resolve_mesh_impl(scene: Scene, cfg: RenderConfig, dtype) -> str:
    impl = cfg.mesh_impl
    if impl == "auto":
        import jax

        ok = (
            scene.static.n_clusters > 0
            and dtype == jnp.float32
            and jax.default_backend() != "cpu"
        )
        impl = "mxu" if ok else "bruteforce"
    if impl in _KERNEL_IMPLS and not scene.static.n_clusters:
        impl = "bruteforce"
    if impl.startswith("pallas") and cfg.prim_axis is not None:
        # the elementwise debug kernel's supercluster grouping assumes the
        # global cluster table; refusing beats silently rendering on a
        # different backend than the one requested
        raise ValueError(
            "mesh_impl='pallas' does not support primitive sharding; use "
            "'mxu' (in-kernel schedule over the local cluster table) or "
            "'bruteforce'")
    return impl


def mesh_closest(scene: Scene, o, d, cfg: RenderConfig, want_n: bool = False):
    """Closest triangle hit: (t, idx); t == BIG and idx == 0 on miss.

    want_n=True returns (t, idx, n) where n is the winner's flat world
    normal selected in-kernel (or None when the active impl can't supply it
    — the caller then falls back to the gather).

    'mxu' runs the matmul-form kernel (Möller-Trumbore factored onto the
    systolic array over a precomputed front-to-back cluster schedule);
    'pallas' the elementwise two-level VMEM kernel. Both are forward-only;
    t is then recomputed differentiably for the winning triangle — a single
    gathered Möller-Trumbore evaluation — so autodiff sees a closed-form t
    while the O(R x T) search stays out of the graph. 'bruteforce' is the
    pure-jnp masked sweep (differentiable as-is, used on CPU, in f64
    conformance mode, and under primitive sharding).
    """
    import jax

    R = o.shape[0]
    impl = _resolve_mesh_impl(scene, cfg, o.dtype)

    if impl in _KERNEL_IMPLS:
        if _use_tlas(scene, cfg, impl):
            # instanced scene: the TLAS kernel reports instance-local
            # winners; map them to world-table rows (one (R,) gather) to
            # keep this API's contract identical across backends
            t, enc, _, n_pay = _tlas_closest(scene, o, d, cfg, impl)
            hit_ok = enc >= 0
            enc_c = jnp.where(hit_ok, enc, 0)
            idx_c = jnp.take(scene.tlas.gid.reshape(-1), enc_c)
            n = pack3(*normalize3(*unpack3(n_pay))) if want_n else None
            return (t, idx_c, n) if want_n else (t, idx_c)
        # the traversal schedule is computed IN-KERNEL per tile (exact
        # per-ray slab tests, front-to-back): no XLA-side schedule pass,
        # no HBM schedule tables
        spec = (impl, scene.static.n_super, scene.static.cluster_size,
                min(512, max(128, R)), cfg.epsilon)
        n = None
        if want_n and impl.startswith("mxu") and not scene.static.any_smooth:
            t, idx, n = _kernel_closest_n(
                spec, o, d, scene.tri_p1, scene.tri_e1, scene.tri_e2,
                scene.tri_n, scene.cluster_aabb, scene.super_aabb)
        elif want_n and impl.startswith("mxu"):
            from ..ops.pallas.mesh_intersect import VMEM_TRI_BUDGET

            snc = jnp.concatenate(
                [scene.tri_sn1, scene.tri_sn2, scene.tri_sn3], axis=1)
            if scene.static.n_tris <= VMEM_TRI_BUDGET:
                # smooth meshes: the winner's corner normals are blended
                # with its (u, v) IN-KERNEL from the VMEM-resident (9, T)
                # corner slab — no XLA-side (R, 9) gather, no separate uv
                # JVP recompute
                t, idx, n_blend = _kernel_closest_sn(
                    spec, o, d, scene.tri_p1, scene.tri_e1, scene.tri_e2,
                    snc, scene.cluster_aabb, scene.super_aabb)
                n = normalize(n_blend)
            else:
                # oversized smooth mesh (streams in superblocks): winner
                # (u, v) in-kernel, corner blend with ONE fused (R, 9)
                # gather outside
                t, idx, uv = _kernel_closest_uv(
                    spec, o, d, scene.tri_p1, scene.tri_e1, scene.tri_e2,
                    scene.cluster_aabb, scene.super_aabb)
                idx_c0 = jnp.where(idx >= 0, idx, 0)
                g = snc[idx_c0]                              # (R, 9)
                u, v = uv[:, 0:1], uv[:, 1:2]
                n = normalize(
                    (1.0 - u - v) * g[:, 0:3] + u * g[:, 3:6] + v * g[:, 6:9])
        else:
            t, idx = _kernel_closest(
                spec, o, d, scene.tri_p1, scene.tri_e1, scene.tri_e2,
                scene.cluster_aabb, scene.super_aabb)
        hit_ok = idx >= 0
        idx_c = jnp.where(hit_ok, idx, 0)
        t = jnp.where(hit_ok, t, BIG)
        return (t, idx_c, n) if want_n else (t, idx_c)

    t, v = tri_candidates(scene, o, d, cfg.epsilon)
    tt = jnp.where(v & (t >= 0.0), t, BIG)
    idx = jnp.argmin(tt, axis=1).astype(jnp.int32)
    t_min = jnp.take_along_axis(tt, idx[:, None], axis=1)[:, 0]
    return (t_min, idx, None) if want_n else (t_min, idx)


def closest_hit(scene: Scene, o, d, cfg: RenderConfig) -> HitInfo:
    """World::intersect + Intersection::hit — global min over t >= 0
    (reference: src/world.rs:43-54, src/intersection.rs:79-84).

    Under primitive sharding (cfg.prim_axis set inside shard_map), the
    triangle table is the LOCAL shard; per-device best hits carry their
    payload (t, object id, normal) and are combined with a min-by-t
    reduction over the mesh axis — the ray-tracing analogue of
    tensor-parallel partial results + all-reduce.
    """
    R = o.shape[0]
    st = scene.static
    t_p = jnp.full((R,), BIG, o.dtype)
    idx_p = jnp.zeros((R,), jnp.int32)
    if st.n_prims:
        t, v = prim_candidates(scene, o, d, cfg.epsilon)
        tt = jnp.where(v & (t >= 0.0), t, BIG).reshape(R, -1)
        idx_flat = jnp.argmin(tt, axis=1)
        t_p = jnp.take_along_axis(tt, idx_flat[:, None], axis=1)[:, 0]
        idx_p = (idx_flat // 4).astype(jnp.int32)
    t_t = jnp.full((R,), BIG, o.dtype)
    idx_t = jnp.zeros((R,), jnp.int32)
    tri_obj = jnp.zeros((R,), jnp.int32)
    tri_n = jnp.zeros_like(o)
    if st.n_tris:
        impl_ch = _resolve_mesh_impl(scene, cfg, o.dtype)
        if impl_ch in _KERNEL_IMPLS and _use_tlas(scene, cfg, impl_ch):
            # instanced fast path: t, winner id, OBJECT ID and world normal
            # all come out of the kernel — zero XLA-side (R,) gathers. The
            # world-table row (hit.tri) is only materialized when the
            # refraction census will read it.
            t_t, enc, tri_obj, n_pay = _tlas_closest(
                scene, o, d, cfg, impl_ch)
            tri_n = pack3(*normalize3(*unpack3(n_pay)))
            enc_c = jnp.where(enc >= 0, enc, 0)
            idx_t = (jnp.take(scene.tlas.gid.reshape(-1), enc_c)
                     if st.refr_mesh_obj_ids else enc_c)
            is_tri = t_t < t_p
            t_hit = jnp.where(is_tri, t_t, t_p)
            valid = t_hit < BIG * 0.5
            prim_obj = (scene.prim_obj[idx_p] if st.n_prims
                        else jnp.zeros((R,), jnp.int32))
            obj = jnp.where(is_tri, tri_obj, prim_obj)
            return HitInfo(t=t_hit, valid=valid, obj=obj, prim=idx_p,
                           tri=idx_t, is_tri=is_tri, tri_n=tri_n)
        t_t, idx_t, n_k = mesh_closest(scene, o, d, cfg, want_n=True)
        if st.single_tri_obj >= 0:
            # single-mesh scene: skip the (R,)-row gather (~19 ms/sweep at
            # 1080p on v5 lite) — every triangle shares one object id
            tri_obj = jnp.full_like(idx_t, st.single_tri_obj)
        else:
            tri_obj = scene.tri_obj[idx_t]
        if n_k is not None:
            # flat normal already selected in-kernel: no (R,)-row gather
            tri_n = n_k
        elif st.any_smooth:
            # smooth-triangle shading: interpolate per-corner normals with the
            # barycentric u/v at the winner (the feature the reference stubs
            # out at src/intersection.rs:381-386); flat meshes carry the face
            # normal in all three corners, making this a no-op for them
            _, _, u, v = intersect.triangle(
                o, d, scene.tri_p1[idx_t], scene.tri_e1[idx_t],
                scene.tri_e2[idx_t], cfg.epsilon)
            w0 = (1.0 - u - v)[:, None]
            tri_n = normalize(
                w0 * scene.tri_sn1[idx_t]
                + u[:, None] * scene.tri_sn2[idx_t]
                + v[:, None] * scene.tri_sn3[idx_t]
            )
        else:
            tri_n = scene.tri_n[idx_t]
        if cfg.prim_axis is not None:
            t_t, tri_obj, tri_n = _min_by_t_over_axis(
                cfg.prim_axis, t_t, tri_obj, tri_n)

    is_tri = t_t < t_p
    t_hit = jnp.where(is_tri, t_t, t_p)
    valid = t_hit < BIG * 0.5
    prim_obj = scene.prim_obj[idx_p] if st.n_prims else jnp.zeros((R,), jnp.int32)
    obj = jnp.where(is_tri, tri_obj, prim_obj)
    return HitInfo(t=t_hit, valid=valid, obj=obj, prim=idx_p, tri=idx_t,
                   is_tri=is_tri, tri_n=tri_n)


def _min_by_t_over_axis(axis_name: str, t, obj, n):
    """Combine per-device closest-hit payloads: min t wins; ties break to the
    lowest device index. Implemented as all_gather + local argmin (rather
    than pmin) so the reduction is DIFFERENTIABLE — all_gather's transpose is
    a reduce-scatter, letting hit-position gradients flow back to the shard
    that owns the winning triangle."""
    import jax

    t_all = jax.lax.all_gather(t, axis_name)          # (D, R)
    obj_all = jax.lax.all_gather(obj, axis_name)      # (D, R)
    n_all = jax.lax.all_gather(n, axis_name)          # (D, R, 3)
    win = jnp.argmin(t_all, axis=0)
    t_min = jnp.take_along_axis(t_all, win[None, :], axis=0)[0]
    obj_g = jnp.take_along_axis(obj_all, win[None, :], axis=0)[0]
    n_g = jnp.take_along_axis(n_all, win[None, :, None], axis=0)[0]
    return t_min, obj_g, n_g


class Intersections(NamedTuple):
    """Per-ray sorted intersection lists — the vectorized equivalent of the
    reference's World::intersect -> Intersections public API
    (src/world.rs:43-54, src/intersection.rs:86): fixed-capacity (R, K)
    buffers sorted ascending by t, INCLUDING negative ts (the reference's Vec
    keeps them; only hit() filters, src/intersection.rs:79-84).

    u/v carry the barycentric coordinates of triangle intersections (0.0 on
    analytic-prim slots) — the smooth-triangle payload the reference stubs
    out in its commented-out book tests (src/intersection.rs:381-386)."""

    t: jnp.ndarray      # (R, K)
    obj: jnp.ndarray    # (R, K) i32 object ids (clamped where invalid)
    valid: jnp.ndarray  # (R, K) bool
    u: jnp.ndarray = None  # (R, K) barycentric u (0 for non-triangle slots)
    v: jnp.ndarray = None  # (R, K) barycentric v (0 for non-triangle slots)


def intersect_all(scene: Scene, o, d, cfg: RenderConfig,
                  k: int | None = None) -> Intersections:
    """World::intersect for a wavefront: every object's candidate ts, merged
    and sorted ascending per ray (reference: src/world.rs:43-54).

    k bounds the returned list length (K = min(k, total candidate slots));
    k=None returns the full list. This is the conformance/utility API — the
    render path uses the fused closest_hit/is_shadowed kernels instead, which
    never materialize the list. Sweeps are brute-force (analytic candidates +
    the full triangle table), so cost is O(R * (4N + T)).
    """
    st = scene.static
    R = o.shape[0]
    parts_t, parts_v, parts_obj, parts_u, parts_w = [], [], [], [], []
    if st.n_prims:
        t, v = prim_candidates(scene, o, d, cfg.epsilon)      # (R, N, 4)
        parts_t.append(t.reshape(R, -1))
        parts_v.append(v.reshape(R, -1))
        parts_obj.append(jnp.repeat(scene.prim_obj, 4))
        parts_u.append(jnp.zeros((R, 4 * st.n_prims), t.dtype))
        parts_w.append(jnp.zeros((R, 4 * st.n_prims), t.dtype))
    if st.n_tris:
        t, v, bu, bv = tri_candidates(scene, o, d, cfg.epsilon,
                                      with_uv=True)           # (R, T)
        parts_t.append(t)
        parts_v.append(v)
        parts_obj.append(scene.tri_obj)
        parts_u.append(bu)
        parts_w.append(bv)
    if not parts_t:
        z = jnp.zeros((R, 0))
        return Intersections(t=z, obj=z.astype(jnp.int32),
                             valid=z.astype(bool), u=z, v=z)
    t = jnp.concatenate(parts_t, axis=1)
    v = jnp.concatenate(parts_v, axis=1)
    u_all = jnp.concatenate(parts_u, axis=1)
    v_all = jnp.concatenate(parts_w, axis=1)
    cols = jnp.concatenate(parts_obj)
    n_cand = t.shape[1]
    kk = n_cand if k is None else min(k, n_cand)
    tt = jnp.where(v, t, BIG)
    # K smallest ts: top_k of -t returns t ascending; ties resolve to the
    # lower candidate column, matching the reference's stable sort over the
    # object-insertion order (src/world.rs:51)
    neg, idx = _jax.lax.top_k(-tt, kk)
    sel = lambda a: jnp.take_along_axis(a, idx, axis=1)
    zero_uv = lambda a: jnp.where((-neg) < BIG * 0.5, a, 0.0)
    return Intersections(
        t=-neg, obj=cols[idx], valid=(-neg) < BIG * 0.5,
        u=zero_uv(sel(u_all)), v=zero_uv(sel(v_all)))


def hit_index(xs: Intersections):
    """Intersection::hit — per-ray index (into the K axis) of the lowest
    non-negative t, or -1 when every intersection is negative/invalid
    (reference: src/intersection.rs:79-84)."""
    ok = xs.valid & (xs.t >= 0.0)
    first = jnp.argmax(ok, axis=1).astype(jnp.int32)  # lists are t-sorted
    return jnp.where(jnp.any(ok, axis=1), first, -1)


def normal_at(scene: Scene, hit: HitInfo, world_point, eps) -> jnp.ndarray:
    """World-space unit normal at the hit (reference: src/shape.rs:466-519)."""
    st = scene.static
    # triangle normals were gathered at closest-hit time (see HitInfo.tri_n)
    n_tri = hit.tri_n

    if st.n_prims:
        inv = scene.prim_inv[hit.prim]        # (R, 3, 4)
        invT = scene.prim_invT[hit.prim]      # (R, 3, 3)
        params = scene.prim_params[hit.prim]
        kind = scene.prim_kind[hit.prim]
        p_l = jnp.einsum("rij,rj->ri", inv[:, :, :3], world_point) + inv[:, :, 3]
        n_l = normals.sphere(p_l)
        n_l = jnp.where((kind == PLANE)[:, None], normals.plane(p_l), n_l)
        n_l = jnp.where((kind == CUBE)[:, None], normals.cube(p_l), n_l)
        n_l = jnp.where(
            (kind == CYLINDER)[:, None],
            normals.cylinder(p_l, params[:, 0], params[:, 1], eps),
            n_l,
        )
        n_l = jnp.where((kind == CONE)[:, None], normals.cone(p_l), n_l)
        n_p = normalize(jnp.einsum("rij,rj->ri", invT, n_l))
    else:
        n_p = jnp.zeros_like(world_point)

    return jnp.where(hit.is_tri[:, None], n_tri, n_p)


def is_shadowed(scene: Scene, point, cfg: RenderConfig, live=None):
    """Shadow ray toward the light (reference: src/world.rs:100-114).

    `hit().t < distance` is equivalent to "ANY candidate t in [0, distance)",
    so the Pallas path uses the cheaper any-hit occlusion kernel (no min
    bookkeeping, early loop exit once every ray in a tile is occluded).

    live: optional (R,) bool — dead lanes get max_t = -1 so the occlusion
    kernel's tile schedule drops them entirely (their shadow rays would
    otherwise point from the parking position back toward the light and drag
    whole clusters into the traversal); they report unshadowed.
    """
    import jax

    v = scene.light_pos - point
    distance = jnp.sqrt(jnp.maximum(dot(v, v), 1e-30))
    direction = v / distance[:, None]
    if live is not None:
        distance = jnp.where(live, distance, -1.0)

    st = scene.static
    impl = _resolve_mesh_impl(scene, cfg, point.dtype)
    if impl in _KERNEL_IMPLS:
        shadowed = jnp.zeros(point.shape[:1], bool)
        if st.n_prims:
            # dead lanes flow through this sweep too: it is a dense (R, N, 4)
            # vectorized pass, so masked lanes cost the same VPU cycles as a
            # compacted sweep would plus zero gather/scatter — their
            # distance == -1 guarantees they report unshadowed
            t, valid = prim_candidates(scene, point, direction, cfg.epsilon)
            shadowed = jnp.any(
                valid & (t >= 0.0) & (t < distance[:, None, None]), axis=(1, 2))
        if st.n_tris:
            from ..ops.pallas.mesh_intersect import (
                mesh_any_hit_mxu, mesh_any_hit_pallas, mesh_any_hit_tlas_mxu)

            sg = jax.lax.stop_gradient
            if _use_tlas(scene, cfg, impl):
                tl = scene.tlas
                found = mesh_any_hit_tlas_mxu(
                    sg(point), sg(direction), sg(distance),
                    sg(tl.p1), sg(tl.e1), sg(tl.e2), sg(tl.caabb),
                    sg(tl.inst_rf), sg(tl.inst_aabb), sg(tl.inst_mesh),
                    leaf=st.cluster_size, cm=st.tlas_cm,
                    ray_tile=TLAS_RAY_TILE,
                    eps=cfg.epsilon,
                    interpret=impl.endswith("_interpret"),
                )
            else:
                fn = (mesh_any_hit_mxu if impl.startswith("mxu")
                      else mesh_any_hit_pallas)
                found = fn(
                    sg(point), sg(direction), sg(distance),
                    sg(scene.tri_p1), sg(scene.tri_e1), sg(scene.tri_e2),
                    sg(scene.cluster_aabb), sg(scene.super_aabb),
                    n_super=st.n_super, leaf=st.cluster_size,
                    ray_tile=min(512, max(128, point.shape[0])),
                    eps=cfg.epsilon,
                    interpret=impl.endswith("_interpret"),
                )
            if cfg.prim_axis is not None:
                # each device saw only its triangle shard: occluded anywhere
                # == OR across the 'prims' axis (one small ICI all-reduce)
                found = jax.lax.psum(
                    found.astype(jnp.int32), cfg.prim_axis) > 0
            shadowed = shadowed | found
        return shadowed

    hit = closest_hit(scene, point, direction, cfg)
    return hit.valid & (hit.t < distance)


def object_record(scene: Scene, obj):
    """ONE fused gather of all per-object shading data.

    The shade path needs ~13 per-object lookups (pattern kind/colors/affine,
    material color + 7 scalars); a gather costs ~3 ms per million rays on
    TPU, so concatenating the tiny (O, F) tables host-side-of-the-gather and
    slicing the (R, F) result turns 13 gathers into 1. All slices stay
    differentiable w.r.t. the underlying scene fields."""
    tbl = jnp.concatenate([
        scene.pat_kind[:, None].astype(scene.pat_a.dtype),      # 0
        scene.pat_a,                                            # 1:4
        scene.pat_b,                                            # 4:7
        scene.pat_inv.reshape(scene.pat_inv.shape[0], 12),      # 7:19
        scene.mat_color,                                        # 19:22
        scene.mat_ambient[:, None],                             # 22
        scene.mat_diffuse[:, None],                             # 23
        scene.mat_specular[:, None],                            # 24
        scene.mat_shininess[:, None],                           # 25
        scene.mat_reflective[:, None],                          # 26
        scene.mat_transparency[:, None],                        # 27
        scene.mat_ior[:, None],                                 # 28
    ], axis=1)
    if scene.static.n_objects == 1:
        g = jnp.broadcast_to(tbl[0], (obj.shape[0],) + tbl.shape[1:])
    else:
        g = tbl[obj]                                            # (R, 29)
    return dict(
        pat_kind=g[:, 0].astype(jnp.int32),
        pat_a=g[:, 1:4],
        pat_b=g[:, 4:7],
        pat_inv=g[:, 7:19].reshape(-1, 3, 4),
        color=g[:, 19:22],
        ambient=g[:, 22],
        diffuse=g[:, 23],
        specular=g[:, 24],
        shininess=g[:, 25],
        reflective=g[:, 26],
        transparency=g[:, 27],
        ior=g[:, 28],
    )


def refraction_indices(scene: Scene, o, d, hit: HitInfo, cfg: RenderConfig,
                       n2_enter=None, live=None):
    """n1/n2 via crossing parity — the vectorized equivalent of the
    reference's containers-stack walk over the sorted intersection list
    (src/intersection.rs:29-62).

    For each container in the static refractive set — analytic prims AND
    closed triangle meshes — count its crossings strictly before t_hit: odd
    parity == "the ray is currently inside". The stack's `last()` is the
    inside container whose most recent crossing is latest. Mesh crossings are
    counted by one batched Möller-Trumbore sweep over the compact per-object
    container slabs (Scene.refr_tri_*), so a closed transparent mesh acts as
    an n1/n2 container exactly like a glass sphere.

    Deviation (documented in ARCHITECTURE.md): by default only objects with
    ior != 1 or transparency > 0 participate as containers. Objects with
    ior == 1.0 contribute the default 1.0 in the reference, so values agree
    except in the degenerate shading-from-inside-an-opaque-object case.
    compile_scene(containers="all") reproduces the reference's every-object
    walk exactly (src/intersection.rs:29-62) by widening the static
    container sets.

    live: optional (R,) bool — rays whose shading never reads n1/n2 (e.g.
    the hit material has transparency == 0, so neither the Snell child nor
    the Schlick blend exists, src/world.rs:71-77,132-134). The kernel path
    drops them from the census schedule; they get whatever default falls
    out (harmless: their n1/n2 are multiplied into parked/zero lanes).
    """
    ids = scene.static.refr_prim_ids
    mesh_ids = scene.static.refr_mesh_obj_ids
    R = o.shape[0]
    one = jnp.ones((R,), o.dtype)
    if n2_enter is None:
        n2_enter = scene.mat_ior[hit.obj] if scene.static.n_objects else one
    if not ids and not mesh_ids:
        return one, n2_enter

    cnts, lasts, objs = [], [], []
    if ids:
        t, v = prim_candidates(scene, o, d, cfg.epsilon, ids=ids)  # (R, Ka, 4)
        before = v & (t < hit.t[:, None, None])
        cnts.append(jnp.sum(before, axis=2))
        lasts.append(jnp.max(jnp.where(before, t, -BIG), axis=2))
        objs.append(jnp.asarray(ids, dtype=jnp.int32))  # prim id == obj id
    if mesh_ids:
        hit_gid = jnp.where(hit.is_tri, hit.tri, -2)
        impl = _resolve_mesh_impl(scene, cfg, o.dtype)
        if impl.startswith("mxu") and cfg.prim_axis is None:
            # crossing-count MXU kernel over the GLOBAL clustered tables:
            # each triangle carries its container slot, the kernel censuses
            # (count, latest t) per slot with the hit triangle excluded —
            # replacing the dense (R, Km, Tm) XLA Möller-Trumbore sweep that
            # dominated transparent-mesh frames
            import jax

            from ..ops.pallas.mesh_intersect import mesh_crossing_count_mxu

            sg = jax.lax.stop_gradient
            t_census = hit.t
            if live is not None:
                # dead lanes: census bound -BIG -> zero clusters scheduled
                t_census = jnp.where(live, t_census, -BIG)
            cnt_m, last_m = mesh_crossing_count_mxu(
                sg(o), sg(d), sg(t_census), hit_gid,
                sg(scene.tri_p1), sg(scene.tri_e1), sg(scene.tri_e2),
                sg(scene.cluster_aabb), scene.tri_cid,
                n_containers=len(mesh_ids), leaf=scene.static.cluster_size,
                ray_tile=min(512, max(128, R)), eps=cfg.epsilon,
                interpret=impl.endswith("_interpret"))
            cnts.append(cnt_m)
            lasts.append(sg(last_m))
        else:
            t, v, _, _ = intersect.triangle(
                o[:, None, None, :], d[:, None, None, :],
                scene.refr_tri_p1[None], scene.refr_tri_e1[None],
                scene.refr_tri_e2[None], cfg.epsilon)       # (R, Km, Tm)
            # exclude the hit triangle from its own parity count: this sweep
            # recomputes t, which can land an ulp on either side of the
            # kernel's t_hit and flip the parity of the crossing being shaded
            not_self = scene.refr_tri_gid[None] != hit_gid[:, None, None]
            before = v & not_self & (t < hit.t[:, None, None])
            cnts.append(jnp.sum(before, axis=2))
            lasts.append(jnp.max(jnp.where(before, t, -BIG), axis=2))
        objs.append(jnp.asarray(mesh_ids, dtype=jnp.int32))

    cnt = jnp.concatenate(cnts, axis=1)                 # (R, K)
    last = jnp.concatenate(lasts, axis=1)               # (R, K)
    cont_obj = jnp.concatenate(objs)                    # (K,)
    inside = (cnt % 2) == 1
    sub_ior = scene.mat_ior[cont_obj]                   # (K,)

    def stack_top(mask):
        score = jnp.where(mask, last, -BIG)
        j = jnp.argmax(score, axis=1)
        any_open = jnp.any(mask, axis=1)
        return jnp.where(any_open, sub_ior[j], 1.0)

    n1 = stack_top(inside)

    is_self = cont_obj[None, :] == hit.obj[:, None]
    self_inside = jnp.any(inside & is_self, axis=1)
    n2_exit = stack_top(inside & ~is_self)
    n2 = jnp.where(self_inside, n2_exit, n2_enter)
    return n1, n2


class Comps(NamedTuple):
    """prepare_computations equivalent (reference: src/intersection.rs:17-77).

    INVARIANT: n1/n2 are real refractive indices only for rays that were
    live in the census (prepare_hit called with need_refraction=True and the
    ray in refraction_live); everywhere else they are silent 1.0/material
    dummies. The integrator guarantees nothing reads them in those cases
    (the Snell child and the Schlick blend exist only when the node can
    branch AND the hit material is transparent, src/world.rs:71-77,132-134);
    a new consumer of Comps.n1/n2 must re-establish this for itself."""

    point: jnp.ndarray
    eyev: jnp.ndarray
    normalv: jnp.ndarray   # flipped toward the eye when inside
    inside: jnp.ndarray
    over_point: jnp.ndarray
    under_point: jnp.ndarray
    reflectv: jnp.ndarray
    n1: jnp.ndarray
    n2: jnp.ndarray


class Comps3(NamedTuple):
    """Component (SoA) shading frame — same semantics and n1/n2 INVARIANT
    as Comps, but every 3-vector is a tuple of three (R,) arrays so the
    whole shading stage runs lane-major on TPU (see vec.unpack3)."""

    point: tuple
    eyev: tuple
    normalv: tuple         # flipped toward the eye when inside
    inside: jnp.ndarray
    over_point: tuple
    under_point: tuple
    reflectv: tuple
    n1: jnp.ndarray
    n2: jnp.ndarray


def prepare_hit3(scene: Scene, o, d, hit: HitInfo, cfg: RenderConfig,
                 n2_enter=None, need_refraction: bool = True,
                 refraction_live=None) -> Comps3:
    """Derive the shading frame for a wavefront of hits, in component (SoA)
    form (reference: src/intersection.rs:17-77). Misses carry finite dummy
    values; callers mask on hit.valid. Every formula mirrors the packed
    AoS association order exactly, so f64 goldens stay pinned.

    need_refraction=False skips the n1/n2 census entirely (bounce-tree LEAF
    nodes: both secondary children are statically black, so neither Snell
    nor the Schlick blend ever reads n1/n2 — src/world.rs:85-87,117-119);
    refraction_live masks it per ray (see refraction_indices)."""
    eps = cfg.epsilon
    t_safe = jnp.where(hit.valid, hit.t, 1.0)
    ox, oy, oz = unpack3(o)
    dx, dy, dz = unpack3(d)
    px, py, pz = ox + dx * t_safe, oy + dy * t_safe, oz + dz * t_safe
    ex, ey, ez = -dx, -dy, -dz
    if scene.static.n_prims:
        n_raw = normal_at(scene, hit, pack3(px, py, pz), eps)
    else:
        # pure-mesh scene: the kernel already selected/blended the world
        # normal (HitInfo.tri_n)
        n_raw = hit.tri_n
    nx, ny, nz = unpack3(n_raw)
    inside = (nx * ex + ny * ey + nz * ez) < 0.0
    nx = jnp.where(inside, -nx, nx)
    ny = jnp.where(inside, -ny, ny)
    nz = jnp.where(inside, -nz, nz)
    k = 2.0 * (dx * nx + dy * ny + dz * nz)
    rvx, rvy, rvz = dx - nx * k, dy - ny * k, dz - nz * k
    if need_refraction:
        n1, n2 = refraction_indices(scene, o, d, hit, cfg,
                                    n2_enter=n2_enter, live=refraction_live)
    else:
        n1 = n2 = jnp.ones(o.shape[:1], o.dtype)
    return Comps3(
        point=(px, py, pz),
        eyev=(ex, ey, ez),
        normalv=(nx, ny, nz),
        inside=inside,
        over_point=(px + nx * eps, py + ny * eps, pz + nz * eps),
        under_point=(px - nx * eps, py - ny * eps, pz - nz * eps),
        reflectv=(rvx, rvy, rvz),
        n1=n1,
        n2=n2,
    )


def prepare_hit(scene: Scene, o, d, hit: HitInfo, cfg: RenderConfig,
                n2_enter=None, need_refraction: bool = True,
                refraction_live=None) -> Comps:
    """Packed (R, 3) view of prepare_hit3 — the conformance-facing API
    (rtc_tpu.testing builds reference Computations from it)."""
    c = prepare_hit3(scene, o, d, hit, cfg, n2_enter=n2_enter,
                     need_refraction=need_refraction,
                     refraction_live=refraction_live)
    return Comps(
        point=pack3(*c.point),
        eyev=pack3(*c.eyev),
        normalv=pack3(*c.normalv),
        inside=c.inside,
        over_point=pack3(*c.over_point),
        under_point=pack3(*c.under_point),
        reflectv=pack3(*c.reflectv),
        n1=c.n1,
        n2=c.n2,
    )


def schlick(cos_eye_normal, n1, n2):
    """Fresnel approximation (reference: src/intersection.rs:107-128)."""
    cos = cos_eye_normal
    n = n1 / n2
    sin2_t = n * n * (1.0 - cos * cos)
    tir = (n1 > n2) & (sin2_t > 1.0)
    cos_t = safe_sqrt(1.0 - jnp.minimum(sin2_t, 1.0))
    cos_used = jnp.where(n1 > n2, cos_t, cos)
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_used) ** 5
    return jnp.where(tir, 1.0, reflectance)


def color_at(scene: Scene, o, d, cfg: RenderConfig, budget: int | None = None):
    """Whole-wavefront color (reference: src/world.rs:80-98). o/d: (R, 3)."""
    if budget is None:
        budget = cfg.max_depth
    if budget < 1:
        return jnp.zeros_like(o)

    st = scene.static
    eps = cfg.epsilon
    if st.n_objects == 0:
        return jnp.zeros_like(o)

    impl_ch = _resolve_mesh_impl(scene, cfg, o.dtype)
    sh_k = None
    if (cfg.shadows and impl_ch in _KERNEL_IMPLS
            and _use_fused_shadow(scene, cfg, impl_ch)):
        # one fused kernel pass: closest hit + in-kernel shadow query
        spec = (impl_ch, st.n_super, st.cluster_size,
                min(512, max(128, o.shape[0])), cfg.epsilon)
        if st.any_smooth:
            snc = jnp.concatenate(
                [scene.tri_sn1, scene.tri_sn2, scene.tri_sn3], axis=1)
            t_t, idx_t, n_k, sh_k = _kernel_closest_shadow_sn(
                spec, o, d, scene.tri_p1, scene.tri_e1, scene.tri_e2,
                snc, scene.cluster_aabb, scene.light_pos)
            n_k = pack3(*normalize3(*unpack3(n_k)))
        else:
            t_t, idx_t, n_k, sh_k = _kernel_closest_shadow(
                spec, o, d, scene.tri_p1, scene.tri_e1, scene.tri_e2,
                scene.tri_n, scene.cluster_aabb, scene.light_pos)
        tri_obj = (jnp.full_like(idx_t, st.single_tri_obj)
                   if st.single_tri_obj >= 0 else scene.tri_obj[idx_t])
        h_valid = t_t < BIG * 0.5
        hit = HitInfo(t=t_t, valid=h_valid, obj=tri_obj,
                      prim=jnp.zeros_like(idx_t), tri=idx_t,
                      is_tri=h_valid, tri_n=n_k)
    else:
        hit = closest_hit(scene, o, d, cfg)
    valid = hit.valid
    obj = hit.obj
    rec = object_record(scene, obj)  # one fused gather of all shading data
    # n1/n2 are read only by the Snell child and the Schlick blend, both of
    # which exist only when this node can branch AND the hit material is
    # transparent (src/world.rs:71-77,132-134) — so leaf nodes skip the
    # containers census statically and opaque-hit rays are masked out of it
    comps = prepare_hit3(
        scene, o, d, hit, cfg, n2_enter=rec["ior"],
        need_refraction=budget >= 4 and st.any_refractive,
        refraction_live=valid & (rec["transparency"] > 0.0))
    px, py, pz = comps.point
    ex, ey, ez = comps.eyev
    nx, ny, nz = comps.normalv
    # Dead lanes (misses) still flow through shadow/secondary sweeps; parking
    # their ray origins far outside every AABB makes the cluster cull reject
    # them immediately instead of dragging them through triangle tests.
    # (Everything below is component/SoA math — see vec.unpack3 — packed
    # only at the kernel and recursion boundaries.)
    far = jnp.asarray(1e12, o.dtype)
    ovx, ovy, ovz = (jnp.where(valid, c, far) for c in comps.over_point)

    # pattern-space sampling; pattern-less objects read the material color
    # directly (keeping mat_color a live differentiable parameter).
    # Boundary-robust: patterns.PATTERN_EPS nudges cell lookups off the
    # floor() boundaries that axis-aligned geometry lands on, so this einsum
    # (and XLA's fusion of it) is free to reassociate.
    pat_kind = rec["pat_kind"]
    if st.any_pattern:
        point_pk = pack3(px, py, pz)
        pat_p = jnp.einsum("rij,rj->ri", rec["pat_inv"][:, :, :3],
                           point_pk) + rec["pat_inv"][:, :, 3]
        base_color = patterns.color_at(pat_p, pat_kind, rec["pat_a"],
                                       rec["pat_b"])
        base_color = jnp.where(
            (pat_kind == patterns.NONE)[:, None], rec["color"], base_color)
    else:
        # no patterned object anywhere: the transform + lookup compile away
        base_color = rec["color"]

    if cfg.shadows and sh_k is not None:
        # the fused kernel already derived the shadow ray (same facing /
        # over_point / distance formulas, in-registers) and ran the
        # occlusion loop against the VMEM-resident tables
        shadowed = sh_k
    elif cfg.shadows:
        # occlusion only affects the image where the surface faces the light
        # (lighting zeroes diffuse+specular when light·normal < 0 regardless
        # of shadow, src/material.rs:57-67) — drop back-facing lanes from the
        # shadow sweep
        lvx, lvy, lvz = normalize3(
            scene.light_pos[0] - px, scene.light_pos[1] - py,
            scene.light_pos[2] - pz)
        facing = (lvx * nx + lvy * ny + lvz * nz) >= 0.0
        shadowed = is_shadowed(scene, pack3(ovx, ovy, ovz), cfg,
                               live=valid & facing)
    else:
        shadowed = jnp.zeros_like(valid)
    surface = lighting.lighting3(
        base_color,
        rec["ambient"],
        rec["diffuse"],
        rec["specular"],
        rec["shininess"],
        scene.light_pos,
        scene.light_intensity,
        (px, py, pz),
        (ex, ey, ez),
        (nx, ny, nz),
        shadowed,
    )

    can_branch = budget >= 4  # children shade only if (budget-3) >= 1
    reflective = rec["reflective"]
    transparency = rec["transparency"]

    # Dead/irrelevant secondary lanes are parked pointing AWAY from the
    # scene (origin far out on +1,1,1, direction continuing outward), so the
    # traversal schedule culls them: every AABB is behind the ray (tmax < 0).
    # Matches the reference's early-outs (reflective == 0 / transparency == 0
    # return BLACK without spawning a ray, src/world.rs:117-119,132-134).
    park = jnp.asarray(0.5773502692, o.dtype)

    refl = jnp.zeros_like(o)
    if can_branch and st.any_reflective:
        # (src/intersection.rs:27, world.rs:125)
        live_r = valid & (reflective > 0.0)
        rvx, rvy, rvz = comps.reflectv
        refl = color_at(
            scene,
            pack3(jnp.where(live_r, ovx, far), jnp.where(live_r, ovy, far),
                  jnp.where(live_r, ovz, far)),
            pack3(jnp.where(live_r, rvx, park), jnp.where(live_r, rvy, park),
                  jnp.where(live_r, rvz, park)),
            cfg, budget - 3,
        ) * reflective[:, None]

    refr = jnp.zeros_like(o)
    n1, n2 = comps.n1, comps.n2
    if can_branch and st.any_refractive:
        # Snell construction (reference: src/world.rs:140-162)
        n_ratio = n1 / n2
        cos_i = ex * nx + ey * ny + ez * nz
        sin2_t = n_ratio * n_ratio * (1.0 - cos_i * cos_i)
        tir = sin2_t > 1.0
        cos_t = safe_sqrt(1.0 - jnp.minimum(sin2_t, 1.0))
        a = n_ratio * cos_i - cos_t
        rdx, rdy, rdz = nx * a - ex * n_ratio, ny * a - ey * n_ratio, \
            nz * a - ez * n_ratio
        live_t = valid & (transparency > 0.0) & ~tir
        unx, uny, unz = (jnp.where(valid, c, far)
                         for c in comps.under_point)
        refr = (
            color_at(
                scene,
                pack3(jnp.where(live_t, unx, far),
                      jnp.where(live_t, uny, far),
                      jnp.where(live_t, unz, far)),
                pack3(jnp.where(live_t, rdx, park),
                      jnp.where(live_t, rdy, park),
                      jnp.where(live_t, rdz, park)),
                cfg, budget - 3,
            )
            * transparency[:, None]
            * jnp.where(tir, 0.0, 1.0)[:, None]
        )

    if st.any_reflective and st.any_refractive:
        # Schlick blend only when the material is both (src/world.rs:71-77)
        both = (reflective > 0.0) & (transparency > 0.0)
        reflectance = schlick(ex * nx + ey * ny + ez * nz, n1, n2)
        secondary = jnp.where(
            both[:, None],
            refl * reflectance[:, None] + refr * (1.0 - reflectance)[:, None],
            refl + refr,
        )
    else:
        secondary = refl + refr

    return jnp.where(valid[:, None], surface + secondary, 0.0)
