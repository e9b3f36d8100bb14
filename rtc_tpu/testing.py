"""Reference-shaped test helpers.

The reference exercises `Shape::intersect` / `Shape::normal_at` per shape
(src/shape.rs:248,466). These helpers run the same queries through the real
compiled SoA pipeline (compiler -> candidate kernels -> normal select), so the
book's scalar test tables validate the production path, not a shadow one.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .render import integrator
from .scene.compile import compile_scene
from .scene.shapes import Shape
from .scene.world import World
from .utils.config import RenderConfig
from .utils.constants import BIG


def _scene_for(shape: Shape, dtype):
    return compile_scene(World(objects=[shape]), dtype=dtype)


def intersect_shape(shape: Shape, origin, direction, dtype=jnp.float64):
    """All intersection ts of a ray with one (possibly grouped) shape,
    globally sorted by t — matching the reference's group sort
    (src/shape.rs:431-432). Returns (ts, object_ids) numpy arrays including
    negative ts (the reference's Vec keeps them; only hit() filters).
    """
    scene = _scene_for(shape, dtype)
    cfg = RenderConfig(dtype=str(np.dtype(dtype)))
    o = jnp.asarray([origin], dtype=dtype)
    d = jnp.asarray([direction], dtype=dtype)
    xs = integrator.intersect_all(scene, o, d, cfg)
    t = np.asarray(xs.t[0], dtype=np.float64)
    v = np.asarray(xs.valid[0])
    obj = np.asarray(xs.obj[0], dtype=np.int64)
    return t[v], obj[v]


def normal_at(shape: Shape, point, dtype=jnp.float64):
    """Shape::normal_at through the compiled pipeline (src/shape.rs:466-519).

    `shape` must compile to exactly one prim or one triangle.
    """
    scene = _scene_for(shape, dtype)
    cfg = RenderConfig(dtype=str(np.dtype(dtype)))
    p = jnp.asarray([point], dtype=dtype)
    st = scene.static
    # a single triangle pads to one whole cluster; the real tri stays at row 0
    assert st.n_prims == 1 or (st.n_prims == 0 and st.n_tris >= 1), (
        "normal_at helper expects a single-leaf shape"
    )
    is_tri = st.n_prims == 0
    tri_n = scene.tri_n[0:1] if is_tri else jnp.zeros((1, 3), dtype)
    hit = integrator.HitInfo(
        t=jnp.zeros((1,), dtype),
        valid=jnp.ones((1,), bool),
        obj=jnp.zeros((1,), jnp.int32),
        prim=jnp.zeros((1,), jnp.int32),
        tri=jnp.zeros((1,), jnp.int32),
        is_tri=jnp.full((1,), is_tri),
        tri_n=tri_n,
    )
    return np.asarray(integrator.normal_at(scene, hit, p, cfg.epsilon))[0]


def hit(ts):
    """Intersection::hit — lowest non-negative t (src/intersection.rs:79-84).
    Returns the index into ts, or None."""
    ts = np.asarray(ts, dtype=np.float64)
    mask = ts >= 0.0
    if not mask.any():
        return None
    idx = np.where(mask)[0]
    return int(idx[np.argmin(ts[idx])])


def comps_at(scene, origin, direction, t, prim_id=0, is_tri=False, tri_id=0,
             obj_id=None, dtype=jnp.float64, cfg=None):
    """prepare_computations at a chosen intersection (t, object) — the
    reference's Intersection::prepare_computations(ray, xs) with xs implied by
    the scene geometry (src/intersection.rs:17-77)."""
    cfg = cfg or RenderConfig(dtype=str(np.dtype(dtype)))
    o = jnp.asarray([origin], dtype=dtype)
    d = jnp.asarray([direction], dtype=dtype)
    t_parity = t
    if not is_tri and scene.static.n_prims:
        # For the n1/n2 crossing-parity walk, snap the caller's t to the
        # kernel's bit-exact candidate so the strict `<` self-exclusion
        # behaves as in production, where t_hit always IS one of the
        # candidates (the reference's walk likewise matches on exact
        # identity, src/intersection.rs:33). The caller's t is still used
        # verbatim for the geometric frame, matching the reference tests
        # that pass truncated book values.
        ct, cv = integrator.prim_candidates(scene, o, d, cfg.epsilon)
        ct = np.asarray(ct)[0, prim_id]
        cv = np.asarray(cv)[0, prim_id]
        if cv.any():
            cand = ct[cv]
            t_parity = float(cand[np.argmin(np.abs(cand - t))])
    if obj_id is None:
        obj_id = (
            int(np.asarray(_as_scene_tri_obj(scene))[tri_id])
            if is_tri
            else int(np.asarray(scene.prim_obj)[prim_id])
        )
    def mk_hit(tv):
        tri_n = (
            scene.tri_n[tri_id : tri_id + 1]
            if (is_tri and scene.static.n_tris)
            else jnp.zeros((1, 3), dtype)
        )
        return integrator.HitInfo(
            t=jnp.asarray([tv], dtype=dtype),
            valid=jnp.ones((1,), bool),
            obj=jnp.asarray([obj_id], jnp.int32),
            prim=jnp.asarray([prim_id], jnp.int32),
            tri=jnp.asarray([tri_id], jnp.int32),
            is_tri=jnp.asarray([is_tri]),
            tri_n=tri_n,
        )

    comps = integrator.prepare_hit(scene, o, d, mk_hit(t), cfg)
    if t_parity != t:
        n1, n2 = integrator.refraction_indices(scene, o, d, mk_hit(t_parity), cfg)
        comps = comps._replace(n1=n1, n2=n2)
    return integrator.Comps(*[np.asarray(f)[0] for f in comps])


def _as_scene_tri_obj(scene):
    return scene.tri_obj


def color_at_single(scene, origin, direction, cfg=None, dtype=jnp.float64):
    """World::color_at for one ray (src/world.rs:80-98)."""
    cfg = cfg or RenderConfig(dtype=str(np.dtype(dtype)))
    o = jnp.asarray([origin], dtype=dtype)
    d = jnp.asarray([direction], dtype=dtype)
    return np.asarray(integrator.color_at(scene, o, d, cfg))[0]


def is_shadowed(scene, point, dtype=jnp.float64, cfg=None):
    """World::is_shadowed (src/world.rs:100-114)."""
    cfg = cfg or RenderConfig(dtype=str(np.dtype(dtype)))
    p = jnp.asarray([point], dtype=dtype)
    return bool(np.asarray(integrator.is_shadowed(scene, p, cfg))[0])


def _c(scene, comps, field):
    return jnp.asarray([getattr(comps, field)], dtype=scene.mat_ior.dtype)


def reflected_color(scene, origin, direction, t, prim_id, remaining,
                    dtype=jnp.float64, cfg=None):
    """World::reflected_color(comps, remaining) (src/world.rs:116-129)."""
    cfg = cfg or RenderConfig(dtype=str(np.dtype(dtype)))
    comps = comps_at(scene, origin, direction, t, prim_id=prim_id, dtype=dtype, cfg=cfg)
    obj = int(np.asarray(scene.prim_obj)[prim_id])
    reflective = float(np.asarray(scene.mat_reflective)[obj])
    if remaining < 1 or reflective == 0.0:
        return np.zeros(3)
    c = integrator.color_at(
        scene,
        jnp.asarray([comps.over_point], dtype=dtype),
        jnp.asarray([comps.reflectv], dtype=dtype),
        cfg,
        budget=remaining - 1,
    )
    return np.asarray(c)[0] * reflective


def refracted_color(scene, origin, direction, t, prim_id, remaining,
                    dtype=jnp.float64, cfg=None):
    """World::refracted_color(comps, remaining) (src/world.rs:131-163)."""
    cfg = cfg or RenderConfig(dtype=str(np.dtype(dtype)))
    comps = comps_at(scene, origin, direction, t, prim_id=prim_id, dtype=dtype, cfg=cfg)
    obj = int(np.asarray(scene.prim_obj)[prim_id])
    transparency = float(np.asarray(scene.mat_transparency)[obj])
    if remaining == 0 or transparency == 0.0:
        return np.zeros(3)
    n_ratio = comps.n1 / comps.n2
    cos_i = float(np.dot(comps.eyev, comps.normalv))
    sin2_t = n_ratio**2 * (1.0 - cos_i**2)
    if sin2_t > 1.0:
        return np.zeros(3)
    cos_t = float(np.sqrt(1.0 - sin2_t))
    direction_r = comps.normalv * (n_ratio * cos_i - cos_t) - comps.eyev * n_ratio
    c = integrator.color_at(
        scene,
        jnp.asarray([comps.under_point], dtype=dtype),
        jnp.asarray([direction_r], dtype=dtype),
        cfg,
        budget=remaining - 1,
    )
    return np.asarray(c)[0] * transparency


def shade_hit(scene, origin, direction, t, prim_id, remaining=5,
              dtype=jnp.float64, cfg=None):
    """World::shade_hit(comps, remaining) (src/world.rs:56-78)."""
    from .ops import lighting as lighting_ops
    from .ops import patterns as pattern_ops

    cfg = cfg or RenderConfig(dtype=str(np.dtype(dtype)))
    comps = comps_at(scene, origin, direction, t, prim_id=prim_id, dtype=dtype, cfg=cfg)
    obj = int(np.asarray(scene.prim_obj)[prim_id])

    pinv = np.asarray(scene.pat_inv)[obj]
    pat_p = pinv[:, :3] @ comps.point + pinv[:, 3]
    kind = int(np.asarray(scene.pat_kind)[obj])
    if kind == pattern_ops.NONE:
        base = jnp.asarray([np.asarray(scene.mat_color)[obj]], dtype=dtype)
    else:
        base = pattern_ops.color_at(
            jnp.asarray([pat_p], dtype=dtype),
            jnp.asarray([kind], jnp.int32),
            jnp.asarray([np.asarray(scene.pat_a)[obj]], dtype=dtype),
            jnp.asarray([np.asarray(scene.pat_b)[obj]], dtype=dtype),
        )
    shadowed = is_shadowed(scene, comps.over_point, dtype=dtype, cfg=cfg)
    surface = np.asarray(
        lighting_ops.lighting(
            base,
            jnp.asarray([np.asarray(scene.mat_ambient)[obj]], dtype=dtype),
            jnp.asarray([np.asarray(scene.mat_diffuse)[obj]], dtype=dtype),
            jnp.asarray([np.asarray(scene.mat_specular)[obj]], dtype=dtype),
            jnp.asarray([np.asarray(scene.mat_shininess)[obj]], dtype=dtype),
            scene.light_pos,
            scene.light_intensity,
            jnp.asarray([comps.point], dtype=dtype),
            jnp.asarray([comps.eyev], dtype=dtype),
            jnp.asarray([comps.normalv], dtype=dtype),
            jnp.asarray([shadowed]),
        )
    )[0]

    reflected = reflected_color(scene, origin, direction, t, prim_id, remaining - 1,
                                dtype=dtype, cfg=cfg)
    refracted = refracted_color(scene, origin, direction, t, prim_id, remaining - 1,
                                dtype=dtype, cfg=cfg)

    reflective = float(np.asarray(scene.mat_reflective)[obj])
    transparency = float(np.asarray(scene.mat_transparency)[obj])
    if reflective > 0.0 and transparency > 0.0:
        r = float(
            np.asarray(
                integrator.schlick(
                    jnp.asarray([np.dot(comps.eyev, comps.normalv)]),
                    jnp.asarray([comps.n1]),
                    jnp.asarray([comps.n2]),
                )
            )[0]
        )
        return surface + reflected * r + refracted * (1.0 - r)
    return surface + reflected + refracted
