"""Intersection/Computations conformance tests
(reference: src/intersection.rs:131-386, 16 tests)."""

import math

import numpy as np
import jax.numpy as jnp

from rtc_tpu import testing
from rtc_tpu.ops import transforms as X
from rtc_tpu.render import integrator
from rtc_tpu.scene import shapes as S
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.scene.world import World

from conftest import assert_almost_eq

EPSILON = 1e-5
S2 = math.sqrt(2.0)


# --- hit() selection (src/intersection.rs:158-200) --------------------------

def test_the_hit_when_all_intersections_have_positive_t():
    assert testing.hit([1.0, 2.0]) == 0


def test_the_hit_when_some_intersections_have_negative_t():
    assert testing.hit([-1.0, 1.0]) == 1


def test_the_hit_when_all_intersections_have_negative_t():
    assert testing.hit([-2.0, -1.0]) is None


def test_the_hit_is_always_the_lowest_nonnegative_intersection():
    assert testing.hit([5.0, 7.0, -3.0, 2.0]) == 3


# --- prepare_computations ----------------------------------------------------

def test_precomputing_the_state_of_an_intersection():
    scene = compile_scene(World(objects=[S.sphere()]), dtype=np.float64)
    c = testing.comps_at(scene, [0, 0, -5], [0, 0, 1], 4.0)
    assert_almost_eq(c.point, [0, 0, -1])
    assert_almost_eq(c.eyev, [0, 0, -1])
    assert_almost_eq(c.normalv, [0, 0, -1])
    assert not bool(c.inside)


def test_precomputing_the_reflection_vector():
    scene = compile_scene(World(objects=[S.plane()]), dtype=np.float64)
    c = testing.comps_at(scene, [0, 1, -1], [0, -S2 / 2, S2 / 2], S2)
    assert_almost_eq(c.reflectv, [0, S2 / 2, S2 / 2])


def test_the_hit_when_an_intersection_occurs_on_the_inside():
    scene = compile_scene(World(objects=[S.sphere()]), dtype=np.float64)
    c = testing.comps_at(scene, [0, 0, 0], [0, 0, 1], 1.0)
    assert_almost_eq(c.point, [0, 0, 1])
    assert_almost_eq(c.eyev, [0, 0, -1])
    assert bool(c.inside)
    # normal would have been (0, 0, 1) but is inverted
    assert_almost_eq(c.normalv, [0, 0, -1])


def test_the_hit_should_offset_the_point():
    s = S.sphere()
    s.set_transform(X.translation(0, 0, 1))
    scene = compile_scene(World(objects=[s]), dtype=np.float64)
    c = testing.comps_at(scene, [0, 0, -5], [0, 0, 1], 5.0)
    assert c.over_point[2] < -EPSILON / 2
    assert c.point[2] > c.over_point[2]


def test_the_under_point_is_offset_below_the_surface():
    s = S.glass_sphere()
    s.set_transform(X.translation(0, 0, 1))
    scene = compile_scene(World(objects=[s]), dtype=np.float64)
    c = testing.comps_at(scene, [0, 0, -5], [0, 0, 1], 5.0)
    assert c.under_point[2] > EPSILON / 2
    assert c.point[2] < c.under_point[2]


def _glass_ladder():
    """Three nested glass spheres (src/intersection.rs:287-325)."""
    a = S.glass_sphere(transform=X.scaling(2, 2, 2))
    a.material.refractive_index = 1.5
    b = S.glass_sphere(transform=X.translation(0, 0, -0.25))
    b.material.refractive_index = 2.0
    c = S.glass_sphere(transform=X.translation(0, 0, 0.25))
    c.material.refractive_index = 2.5
    return compile_scene(World(objects=[a, b, c]), dtype=np.float64)


def test_finding_n1_and_n2_at_various_intersections():
    scene = _glass_ladder()
    # sorted intersections: (t, prim)
    xs = [(2.0, 0), (2.75, 1), (3.25, 2), (4.75, 1), (5.25, 2), (6.0, 0)]
    expected = [
        (1.0, 1.5),
        (1.5, 2.0),
        (2.0, 2.5),
        (2.5, 2.5),
        (2.5, 1.5),
        (1.5, 1.0),
    ]
    for (t, prim), (n1, n2) in zip(xs, expected):
        c = testing.comps_at(scene, [0, 0, -4], [0, 0, 1], t, prim_id=prim)
        assert_almost_eq(c.n1, n1)
        assert_almost_eq(c.n2, n2)


# --- Schlick (src/intersection.rs:340-379) -----------------------------------

def _glass_scene():
    return compile_scene(World(objects=[S.glass_sphere()]), dtype=np.float64)


def _schlick(c):
    return float(
        np.asarray(
            integrator.schlick(
                jnp.asarray([np.dot(c.eyev, c.normalv)]),
                jnp.asarray([c.n1]),
                jnp.asarray([c.n2]),
            )
        )[0]
    )


def test_the_schlick_approximation_under_total_internal_reflection():
    scene = _glass_scene()
    c = testing.comps_at(scene, [0, 0, S2 / 2], [0, 1, 0], S2 / 2)
    assert _schlick(c) == 1.0


def test_the_schlick_approximation_with_a_perpendicular_viewing_angle():
    scene = _glass_scene()
    c = testing.comps_at(scene, [0, 0, 0], [0, 1, 0], 1.0)
    assert_almost_eq(_schlick(c), 0.04)


def test_the_schlick_approximation_with_small_angle_and_n2_gt_n1():
    scene = _glass_scene()
    c = testing.comps_at(scene, [0, 0.99, -2], [0, 0, 1], 1.8589)
    assert_almost_eq(_schlick(c), 0.48873)


# --- public intersection-list API (reference: src/world.rs:43-54) ------------
#
# World::intersect -> sorted Intersections + hit() as PUBLIC, reusable API.


def test_intersect_all_world_sorted():
    """intersecting_a_world_with_a_ray (src/world.rs:178-189): the default
    world's two concentric spheres give ts [4, 4.5, 5.5, 6]."""
    from rtc_tpu import intersect_all
    from rtc_tpu.scene.world import default_world
    from rtc_tpu.scene.compile import compile_scene
    from rtc_tpu.utils.config import RenderConfig

    scene = compile_scene(default_world(), dtype=jnp.float64)
    cfg = RenderConfig(dtype="float64")
    o = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
    xs = intersect_all(scene, o, d, cfg)
    v = np.asarray(xs.valid[0])
    assert int(v.sum()) == 4
    assert_almost_eq(np.asarray(xs.t[0])[v], [4.0, 4.5, 5.5, 6.0])
    # ts sorted ascending over the whole buffer prefix
    assert list(np.asarray(xs.obj[0])[v]) == [0, 1, 1, 0]


def test_intersect_all_k_truncates():
    from rtc_tpu import intersect_all
    from rtc_tpu.scene.world import default_world
    from rtc_tpu.scene.compile import compile_scene
    from rtc_tpu.utils.config import RenderConfig

    scene = compile_scene(default_world(), dtype=jnp.float64)
    cfg = RenderConfig(dtype="float64")
    o = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
    xs = intersect_all(scene, o, d, cfg, k=2)
    assert xs.t.shape == (1, 2)
    assert_almost_eq(np.asarray(xs.t[0]), [4.0, 4.5])


def test_intersect_all_merges_prims_and_triangles():
    from rtc_tpu import intersect_all
    from rtc_tpu.scene.compile import compile_scene
    from rtc_tpu.scene.shapes import sphere, triangle
    from rtc_tpu.scene.world import World
    from rtc_tpu.utils.config import RenderConfig
    from rtc_tpu.ops import transforms as X

    tri = triangle([-1, -1, 1], [1, -1, 1], [0, 1, 1])  # plane z=1
    s = sphere(transform=X.translation(0, 0, 4))
    w = World(objects=[s, tri])
    scene = compile_scene(w, dtype=jnp.float64)
    cfg = RenderConfig(dtype="float64")
    o = jnp.asarray([[0.0, 0.0, -2.0]], jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
    xs = intersect_all(scene, o, d, cfg)
    v = np.asarray(xs.valid[0])
    ts = np.asarray(xs.t[0])[v]
    objs = np.asarray(xs.obj[0])[v]
    assert_almost_eq(ts, [3.0, 5.0, 7.0])   # triangle at z=1, sphere 3..5
    assert list(objs) == [1, 0, 0]          # tri is object 1 (after the prim)


def test_hit_index_semantics():
    """The four hit() cases (src/intersection.rs:158-200) through the public
    API: all-positive, mixed, all-negative, lowest-nonnegative."""
    from rtc_tpu.render.integrator import Intersections, hit_index

    t = jnp.asarray([
        [1.0, 2.0],     # all positive -> index 0
        [-1.0, 1.0],    # mixed -> index 1
        [-2.0, -1.0],   # all negative -> -1
        [-3.0, 2.0],    # lowest nonnegative -> index 1
    ])
    v = jnp.ones_like(t, dtype=bool)
    xs = Intersections(t=t, obj=jnp.zeros_like(t, dtype=jnp.int32), valid=v)
    assert list(np.asarray(hit_index(xs))) == [0, 1, -1, 1]


def test_intersect_all_keeps_negative_ts():
    """A ray originating inside the sphere keeps the negative t in the list
    (src/shape.rs:727-737: ts [-1, 1])."""
    from rtc_tpu import intersect_all
    from rtc_tpu.render.integrator import hit_index
    from rtc_tpu.scene.compile import compile_scene
    from rtc_tpu.scene.shapes import sphere
    from rtc_tpu.scene.world import World
    from rtc_tpu.utils.config import RenderConfig

    scene = compile_scene(World(objects=[sphere()]), dtype=jnp.float64)
    cfg = RenderConfig(dtype="float64")
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
    xs = intersect_all(scene, o, d, cfg)
    v = np.asarray(xs.valid[0])
    assert_almost_eq(np.asarray(xs.t[0])[v], [-1.0, 1.0])
    assert int(np.asarray(hit_index(xs))[0]) == 1


# --- barycentric u/v on the public list (src/intersection.rs:381-386) --------
#
# The reference's smooth-triangle u/v support is a commented-out stub; the
# book tests it pins are implemented here through the public API.


def test_intersect_all_surfaces_triangle_uv():
    """an_intersection_with_a_smooth_triangle_stores_u_v (the book test the
    reference comments out, src/intersection.rs:381-386): ray (-0.2, 0.3, -2)
    -> +z over triangle (0,1,0)/(-1,0,0)/(1,0,0) carries u=0.45, v=0.25."""
    from rtc_tpu import intersect_all
    from rtc_tpu.scene.shapes import triangle
    from rtc_tpu.utils.config import RenderConfig

    tri = triangle([0, 1, 0], [-1, 0, 0], [1, 0, 0])
    scene = compile_scene(World(objects=[tri]), dtype=jnp.float64)
    cfg = RenderConfig(dtype="float64")
    o = jnp.asarray([[-0.2, 0.3, -2.0]], jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
    xs = intersect_all(scene, o, d, cfg)
    i = int(np.asarray(integrator.hit_index(xs))[0])
    assert i >= 0
    assert_almost_eq(float(xs.u[0, i]), 0.45)
    assert_almost_eq(float(xs.v[0, i]), 0.25)


def test_intersect_all_uv_zero_on_analytic_prims():
    """Mixed scene: the sphere's slots carry u = v = 0; the triangle's slot
    carries its barycentric coordinates."""
    from rtc_tpu import intersect_all
    from rtc_tpu.scene.shapes import sphere, triangle
    from rtc_tpu.ops import transforms as X
    from rtc_tpu.utils.config import RenderConfig

    tri = triangle([-1, -1, 1], [1, -1, 1], [0, 1, 1])
    s = sphere(transform=X.translation(0, 0, 4))
    scene = compile_scene(World(objects=[s, tri]), dtype=jnp.float64)
    cfg = RenderConfig(dtype="float64")
    o = jnp.asarray([[0.0, -0.5, -2.0]], jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
    xs = intersect_all(scene, o, d, cfg)
    v = np.asarray(xs.valid[0])
    objs = np.asarray(xs.obj[0])[v]
    us = np.asarray(xs.u[0])[v]
    vs = np.asarray(xs.v[0])[v]
    # triangle rows carry real barycentrics; sphere rows are exactly zero
    tri_rows = objs == 1
    assert tri_rows.any() and (~tri_rows).any()
    assert (us[~tri_rows] == 0.0).all() and (vs[~tri_rows] == 0.0).all()
    # hit point (0, -0.5, 1): p1=(-1,-1,1) e1=(2,0,0) e2=(1,2,0)
    # -> u + v weights reproduce the point
    assert (us[tri_rows] > 0).all() and (vs[tri_rows] > 0).all()
    p = np.array([-1.0, -1.0, 1.0]) + us[tri_rows][0] * np.array([2.0, 0, 0]) \
        + vs[tri_rows][0] * np.array([1.0, 2.0, 0])
    assert_almost_eq(p, [0.0, -0.5, 1.0])


# --- strict-reference containers mode (src/intersection.rs:29-62) ------------
#
# The reference's n1/n2 walk includes EVERY object in the containers census;
# the default compile mode only enrolls refractive ones. The degenerate case
# where they differ: a ray inside a glass sphere that has also entered an
# opaque ior == 1 object.


def _containers_fixture(mode):
    from rtc_tpu.ops import transforms as X
    from rtc_tpu.scene.materials import Material
    from rtc_tpu.utils.config import RenderConfig

    outer = S.sphere(transform=X.scaling(2, 2, 2))
    outer.material = Material(transparency=1.0, refractive_index=1.5)
    inner = S.sphere(transform=X.scaling(0.5, 0.5, 0.5))
    inner.material = Material(transparency=0.0, refractive_index=1.0)
    scene = compile_scene(World(objects=[outer, inner]), dtype=np.float64,
                          containers=mode)
    cfg = RenderConfig(dtype="float64")
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
    hit = integrator.closest_hit(scene, o, d, cfg)
    assert_almost_eq(float(hit.t[0]), 0.5)        # inner sphere's far wall
    n1, n2 = integrator.refraction_indices(scene, o, d, hit, cfg)
    return float(n1[0]), float(n2[0])


def test_containers_all_matches_reference_walk():
    """Reference walk (src/intersection.rs:29-62) over the sorted list
    [-2 outer, -0.5 inner, +0.5 inner(hit), +2 outer]: at the hit,
    containers == [outer, inner] -> n1 = inner.ior = 1.0; toggling the hit
    object leaves [outer] -> n2 = 1.5."""
    assert _containers_fixture("all") == (1.0, 1.5)


def test_containers_refractive_default_diverges_documented():
    """Default mode: the opaque ior-1 inner sphere is not a container, so
    n1 = 1.5 (still inside the glass) and n2 = the entered material's ior.
    This is the documented deviation; 'all' restores reference semantics."""
    assert _containers_fixture("refractive") == (1.5, 1.0)


def test_containers_all_matches_default_on_refractive_only_scene():
    """When every object is refractive the two modes are identical —
    pinned on the book's glass-sphere-ladder scene values (n2 column of
    src/intersection.rs:287-325)."""
    import dataclasses

    from rtc_tpu.ops import transforms as X
    from rtc_tpu.scene.materials import Material
    from rtc_tpu.utils.config import RenderConfig

    def ladder(mode):
        a = S.glass_sphere(transform=X.scaling(2, 2, 2))
        a.material = dataclasses.replace(a.material, refractive_index=1.5)
        b = S.glass_sphere(transform=X.translation(0, 0, -0.25))
        b.material = dataclasses.replace(b.material, refractive_index=2.0)
        c = S.glass_sphere(transform=X.translation(0, 0, 0.25))
        c.material = dataclasses.replace(c.material, refractive_index=2.5)
        return compile_scene(World(objects=[a, b, c]), dtype=np.float64,
                             containers=mode)

    cfg = RenderConfig(dtype="float64")
    o = jnp.asarray([[0.0, 0.0, -4.0]], jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
    for mode in ("refractive", "all"):
        scene = ladder(mode)
        hit = integrator.closest_hit(scene, o, d, cfg)
        n1, n2 = integrator.refraction_indices(scene, o, d, hit, cfg)
        assert_almost_eq(float(n1[0]), 1.0)
        assert_almost_eq(float(n2[0]), 1.5)
