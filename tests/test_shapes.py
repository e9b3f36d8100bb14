"""Shape conformance tests (reference: src/shape.rs:648-1653, 60 tests).

All intersections/normals run through the compiled SoA pipeline via
rtc_tpu.testing so the book's scalar tables validate the production kernels.
"""

import math

import numpy as np
import pytest

from rtc_tpu import testing
from rtc_tpu.ops import matrices as M
from rtc_tpu.ops import transforms as X
from rtc_tpu.scene import shapes as S
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.scene.materials import Material
from rtc_tpu.scene.world import World

from conftest import assert_almost_eq

PI = math.pi
S3 = math.sqrt(3.0)


def xs_of(shape, origin, direction):
    ts, objs = testing.intersect_shape(shape, origin, direction)
    return ts, objs


# --- Sphere -----------------------------------------------------------------

def test_the_default_transformation():
    s = S.sphere()
    assert_almost_eq(s.transform, np.eye(4))


def test_assigning_a_transformation():
    s = S.sphere()
    s.set_transform(X.translation(2, 3, 4))
    assert_almost_eq(s.transform, X.translation(2, 3, 4))


def test_the_default_material():
    assert S.sphere().material == Material()


def test_assigning_a_material():
    s = S.sphere()
    s.material = Material(ambient=1.0)
    assert s.material == Material(ambient=1.0)


def test_a_ray_intersects_a_sphere_at_two_points():
    ts, _ = xs_of(S.sphere(), [0, 0, -5], [0, 0, 1])
    assert len(ts) == 2
    assert_almost_eq(ts, [4.0, 6.0])


def test_a_ray_intersects_a_sphere_at_a_tangent():
    ts, _ = xs_of(S.sphere(), [0, 1, -5], [0, 0, 1])
    assert len(ts) == 2
    assert_almost_eq(ts, [5.0, 5.0])


def test_a_ray_misses_a_sphere():
    ts, _ = xs_of(S.sphere(), [0, 2, -5], [0, 0, 1])
    assert len(ts) == 0


def test_a_ray_originates_inside_a_sphere():
    ts, _ = xs_of(S.sphere(), [0, 0, 0], [0, 0, 1])
    assert_almost_eq(ts, [-1.0, 1.0])


def test_a_sphere_is_behind_a_ray():
    ts, _ = xs_of(S.sphere(), [0, 0, 5], [0, 0, 1])
    assert_almost_eq(ts, [-6.0, -4.0])


def test_intersect_sets_the_object_on_the_intersection():
    _, objs = xs_of(S.sphere(), [0, 0, -5], [0, 0, 1])
    assert list(objs) == [0, 0]


def test_intersecting_a_scaled_sphere_with_a_ray():
    s = S.sphere()
    s.set_transform(X.scaling(2, 2, 2))
    ts, _ = xs_of(s, [0, 0, -5], [0, 0, 1])
    assert_almost_eq(ts, [3.0, 7.0])


def test_intersecting_a_translated_sphere_with_a_ray():
    s = S.sphere()
    s.set_transform(X.translation(5, 0, 0))
    ts, _ = xs_of(s, [0, 0, -5], [0, 0, 1])
    assert len(ts) == 0


@pytest.mark.parametrize(
    "point,normal",
    [
        ([1, 0, 0], [1, 0, 0]),
        ([0, 1, 0], [0, 1, 0]),
        ([0, 0, 1], [0, 0, 1]),
        ([S3 / 3, S3 / 3, S3 / 3], [S3 / 3, S3 / 3, S3 / 3]),
    ],
)
def test_the_normal_on_a_sphere(point, normal):
    assert_almost_eq(testing.normal_at(S.sphere(), point), normal)


def test_the_normal_is_a_normalized_vector():
    n = testing.normal_at(S.sphere(), [S3 / 3, S3 / 3, S3 / 3])
    assert_almost_eq(np.linalg.norm(n), 1.0)


def test_computing_the_normal_on_a_translated_sphere():
    s = S.sphere()
    s.set_transform(X.translation(0, 1, 0))
    n = testing.normal_at(s, [0, 1.70711, -0.70711])
    assert_almost_eq(n, [0, 0.70711, -0.70711])


def test_computing_the_normal_on_a_transformed_sphere():
    s = S.sphere()
    s.set_transform(M.matmul(X.scaling(1, 0.5, 1), X.rotation_z(PI / 5)))
    n = testing.normal_at(s, [0, math.sqrt(2) / 2, -math.sqrt(2) / 2])
    assert_almost_eq(n, [0, 0.97014, -0.24254])


def test_a_helper_for_producing_a_sphere_with_a_glassy_material():
    s = S.glass_sphere()
    assert_almost_eq(s.transform, np.eye(4))
    assert s.material.transparency == 1.0
    assert s.material.refractive_index == 1.5


# --- Shape / group space conversions ---------------------------------------

def _nested_sphere(scale):
    """g1(rotY(pi/2)) > g2(scale) > sphere(translate(5,0,0)) — transforms are
    pushed into the leaf exactly like the reference (src/shape.rs:207-218)."""
    s = S.sphere()
    s.set_transform(X.translation(5, 0, 0))
    g2 = S.group([s])
    g2.set_transform(scale)
    g1 = S.group([g2])
    g1.set_transform(X.rotation_y(PI / 2))
    return g1, s


def test_converting_a_point_from_world_to_object_space():
    g1, s = _nested_sphere(X.scaling(2, 2, 2))
    scene = compile_scene(World(objects=[g1]), dtype=np.float64)
    inv = np.asarray(scene.prim_inv)[0]
    p = inv[:, :3] @ np.array([-2.0, 0.0, -10.0]) + inv[:, 3]
    assert_almost_eq(p, [0.0, 0.0, -1.0])


def test_converting_a_normal_from_object_to_world_space():
    g1, s = _nested_sphere(X.scaling(1, 2, 3))
    scene = compile_scene(World(objects=[g1]), dtype=np.float64)
    invT = np.asarray(scene.prim_invT)[0]
    n = invT @ np.array([S3 / 3, S3 / 3, S3 / 3])
    n = n / np.linalg.norm(n)
    assert_almost_eq(n, [0.28571, 0.42857, -0.85714])


def test_finding_the_normal_on_a_child_object():
    g1, s = _nested_sphere(X.scaling(1, 2, 3))
    n = testing.normal_at(g1, [1.7321, 1.1547, -5.5774])
    assert_almost_eq(n, [0.28570, 0.42854, -0.85716])


# --- Planes -----------------------------------------------------------------

def test_the_normal_of_a_plane_is_constant_everywhere():
    for p in ([0, 0, 0], [10, 0, -10], [-5, 0, 150]):
        assert_almost_eq(testing.normal_at(S.plane(), p), [0, 1, 0])


def test_intersect_with_a_ray_parallel_to_the_plane():
    ts, _ = xs_of(S.plane(), [0, 10, 0], [0, 0, 1])
    assert len(ts) == 0


def test_intersect_with_a_coplanar_ray():
    ts, _ = xs_of(S.plane(), [0, 0, 0], [0, 0, 1])
    assert len(ts) == 0


def test_a_ray_intersecting_a_plane_from_above():
    ts, objs = xs_of(S.plane(), [0, 1, 0], [0, -1, 0])
    assert_almost_eq(ts, [1.0])
    assert objs[0] == 0


def test_a_ray_intersecting_a_plane_from_below():
    ts, _ = xs_of(S.plane(), [0, -1, 0], [0, 1, 0])
    assert_almost_eq(ts, [1.0])


# --- Cubes ------------------------------------------------------------------

@pytest.mark.parametrize(
    "origin,direction,t1,t2",
    [
        ([5, 0.5, 0], [-1, 0, 0], 4, 6),
        ([-5, 0.5, 0], [1, 0, 0], 4, 6),
        ([0.5, 5, 0], [0, -1, 0], 4, 6),
        ([0.5, -5, 0], [0, 1, 0], 4, 6),
        ([0.5, 0, 5], [0, 0, -1], 4, 6),
        ([0.5, 0, -5], [0, 0, 1], 4, 6),
        ([0, 0.5, 0], [0, 0, 1], -1, 1),
    ],
)
def test_a_ray_intersects_a_cube(origin, direction, t1, t2):
    ts, _ = xs_of(S.cube(), origin, direction)
    assert_almost_eq(ts, [t1, t2])


@pytest.mark.parametrize(
    "origin,direction",
    [
        ([-2, 0, 0], [0.2673, 0.5345, 0.8018]),
        ([0, -2, 0], [0.8018, 0.2673, 0.5345]),
        ([0, 0, -2], [0.5345, 0.8018, 0.2673]),
        ([2, 0, 2], [0, 0, -1]),
        ([0, 2, 2], [0, -1, 0]),
        ([2, 2, 0], [-1, 0, 0]),
    ],
)
def test_a_ray_misses_a_cube(origin, direction):
    ts, _ = xs_of(S.cube(), origin, direction)
    assert len(ts) == 0


@pytest.mark.parametrize(
    "point,normal",
    [
        ([1, 0.5, -0.8], [1, 0, 0]),
        ([-1, -0.2, 0.9], [-1, 0, 0]),
        ([-0.4, 1, -0.1], [0, 1, 0]),
        ([0.3, -1, -0.7], [0, -1, 0]),
        ([-0.6, 0.3, 1], [0, 0, 1]),
        ([0.4, 0.4, -1], [0, 0, -1]),
        ([1, 1, 1], [1, 0, 0]),
        ([-1, -1, -1], [-1, 0, 0]),
    ],
)
def test_the_normal_on_the_surface_of_a_cube(point, normal):
    assert_almost_eq(testing.normal_at(S.cube(), point), normal)


# --- Cylinders --------------------------------------------------------------

def norm(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


@pytest.mark.parametrize(
    "origin,direction",
    [([1, 0, 0], [0, 1, 0]), ([0, 0, 0], [0, 1, 0]), ([0, 0, -5], [1, 1, 1])],
)
def test_a_ray_misses_a_cylinder(origin, direction):
    ts, _ = xs_of(S.infinite_cylinder(), origin, norm(direction))
    assert len(ts) == 0


@pytest.mark.parametrize(
    "origin,direction,t0,t1",
    [
        ([1, 0, -5], [0, 0, 1], 5, 5),
        ([0, 0, -5], [0, 0, 1], 4, 6),
        ([0.5, 0, -5], [0.1, 1, 1], 6.80798, 7.08872),
    ],
)
def test_a_ray_strikes_a_cylinder(origin, direction, t0, t1):
    ts, _ = xs_of(S.infinite_cylinder(), origin, norm(direction))
    assert_almost_eq(ts, [t0, t1])


@pytest.mark.parametrize(
    "point,normal",
    [
        ([1, 0, 0], [1, 0, 0]),
        ([0, 5, -1], [0, 0, -1]),
        ([0, -2, 1], [0, 0, 1]),
        ([-1, 1, 0], [-1, 0, 0]),
    ],
)
def test_normal_vector_on_a_cylinder(point, normal):
    assert_almost_eq(testing.normal_at(S.infinite_cylinder(), point), normal)


def test_the_default_minimum_and_maximum_for_a_cylinder():
    c = S.infinite_cylinder()
    assert c.minimum == -np.inf and c.maximum == np.inf


def test_the_default_closed_value_for_a_cylinder():
    assert not S.infinite_cylinder().capped


@pytest.mark.parametrize(
    "origin,direction,count",
    [
        ([0, 1.5, 0], [0.1, 1, 0], 0),
        ([0, 3, -5], [0, 0, 1], 0),
        ([0, 0, -5], [0, 0, 1], 0),
        ([0, 2, -5], [0, 0, 1], 0),
        ([0, 1, -5], [0, 0, 1], 0),
        ([0, 1.5, -2], [0, 0, 1], 2),
    ],
)
def test_intersecting_a_constrained_cylinder(origin, direction, count):
    ts, _ = xs_of(S.cylinder(1.0, 2.0, False), origin, direction)
    assert len(ts) == count


@pytest.mark.parametrize(
    "origin,direction,count",
    [
        ([0, 3, 0], [0, -1, 0], 2),
        ([0, 3, -2], [0, -1, 2], 2),
        ([0, 4, -2], [0, -1, 1], 2),  # corner case
        ([0, 0, -2], [0, 1, 2], 2),
        ([0, -1, -2], [0, 1, 1], 2),  # corner case
    ],
)
def test_intersecting_the_caps_of_a_closed_cylinder(origin, direction, count):
    ts, _ = xs_of(S.cylinder(1.0, 2.0, True), origin, norm(direction))
    assert len(ts) == count


@pytest.mark.parametrize(
    "point,normal",
    [
        ([0, 1, 0], [0, -1, 0]),
        ([0.5, 1, 0], [0, -1, 0]),
        ([0, 1, 0.5], [0, -1, 0]),
        ([0, 2, 0], [0, 1, 0]),
        ([0.5, 2, 0], [0, 1, 0]),
        ([0, 2, 0.5], [0, 1, 0]),
    ],
)
def test_the_normal_vector_on_a_cylinder_s_end_caps(point, normal):
    assert_almost_eq(testing.normal_at(S.cylinder(1.0, 2.0, True), point), normal)


# --- Cones ------------------------------------------------------------------

@pytest.mark.parametrize(
    "origin,direction,t0,t1",
    [
        ([0, 0, -5], [0, 0, 1], 5, 5),
        ([0, 0, -5], [1, 1, 1], 8.66025, 8.66025),
        ([1, 1, -5], [-0.5, -1, 1], 4.55006, 49.44994),
    ],
)
def test_intersecting_a_cone_with_a_ray(origin, direction, t0, t1):
    ts, _ = xs_of(S.infinite_cone(), origin, norm(direction))
    assert_almost_eq(ts, [t0, t1])


def test_intersecting_a_cone_with_a_ray_parallel_to_one_of_its_halves():
    ts, _ = xs_of(S.infinite_cone(), [0, 0, -1], norm([0, 1, 1]))
    assert_almost_eq(ts, [0.35355])


@pytest.mark.parametrize(
    "origin,direction,count",
    [
        ([0, 0, -5], [0, 1, 0], 0),
        ([0, 0, -0.25], [0, 1, 1], 2),
        ([0, 0, -0.25], [0, 1, 0], 4),
    ],
)
def test_intersecting_a_cone_s_end_caps(origin, direction, count):
    ts, _ = xs_of(S.cone(-0.5, 0.5, True), origin, norm(direction))
    assert len(ts) == count


@pytest.mark.parametrize(
    "point,normal",
    [
        ([0, 0, 0], [0, 0, 0]),
        ([1, 1, 1], [1, -math.sqrt(2), 1]),
        ([-1, -1, 0], [-1, 1, 0]),
    ],
)
def test_computing_the_normal_vector_on_a_cone(point, normal):
    n = testing.normal_at(S.infinite_cone(), point)
    expected = np.asarray(normal, dtype=np.float64)
    nrm = np.linalg.norm(expected)
    if nrm > 0:
        expected = expected / nrm
    assert_almost_eq(n, expected)


# --- Groups -----------------------------------------------------------------

def test_creating_a_new_group():
    g = S.group()
    assert_almost_eq(g.transform, np.eye(4))
    assert g.children == []


def test_adding_a_child_to_a_group():
    g = S.group()
    s = S.sphere()
    g.push_shape(s)
    assert g.children[0] is s


def test_intersecting_a_ray_with_an_empty_group():
    scene = compile_scene(World(objects=[S.group()]), dtype=np.float64)
    assert scene.static.n_prims == 0 and scene.static.n_tris == 0


def test_intersecting_a_ray_with_a_nonempty_group():
    s1 = S.sphere()
    s2 = S.sphere()
    s2.set_transform(X.translation(0, 0, -3))
    s3 = S.sphere()
    s3.set_transform(X.translation(5, 0, 0))
    g = S.group([s1, s2, s3])
    ts, objs = xs_of(g, [0, 0, -5], [0, 0, 1])
    assert len(ts) == 4
    # sorted by t: s2, s2, s1, s1 (src/shape.rs:426-432)
    assert list(objs) == [1, 1, 0, 0]


def test_intersecting_a_transformed_group():
    s = S.sphere()
    s.set_transform(X.translation(5, 0, 0))
    g = S.group([s])
    g.set_transform(X.scaling(2, 2, 2))
    ts, _ = xs_of(g, [10, 0, -10], [0, 0, 1])
    assert len(ts) == 2


def test_set_transform_twice_raises():
    g = S.sphere()
    g.set_transform(X.translation(1, 0, 0))
    with pytest.raises(RuntimeError):
        g.set_transform(X.translation(1, 0, 0))


# --- Triangles --------------------------------------------------------------

def _tri():
    return S.triangle([0, 1, 0], [-1, 0, 0], [1, 0, 0])


def test_constructing_a_triangle():
    t = _tri()
    e1, e2, n = S.triangle_edges(t.p1[None], t.p2[None], t.p3[None])
    assert_almost_eq(e1[0], [-1, -1, 0])
    assert_almost_eq(e2[0], [1, -1, 0])
    assert_almost_eq(n[0], [0, 0, -1])


def test_intersecting_a_ray_parallel_to_the_triangle():
    ts, _ = xs_of(_tri(), [0, -1, -2], [0, 1, 0])
    assert len(ts) == 0


def test_a_ray_misses_the_p1_p3_edge():
    ts, _ = xs_of(_tri(), [1, 1, -2], [0, 0, 1])
    assert len(ts) == 0


def test_a_ray_misses_the_p1_p2_edge():
    ts, _ = xs_of(_tri(), [-1, 1, -2], [0, 0, 1])
    assert len(ts) == 0


def test_a_ray_misses_the_p2_p3_edge():
    ts, _ = xs_of(_tri(), [0, -1, -2], [0, 0, 1])
    assert len(ts) == 0


def test_a_ray_strikes_a_triangle():
    ts, _ = xs_of(_tri(), [0, 0.5, -2], [0, 0, 1])
    assert_almost_eq(ts, [2.0])


def test_finding_the_normal_on_a_triangle():
    t = _tri()
    for p in ([0, 0.5, 0], [-0.5, 0.75, 0], [0.5, 0.25, 0]):
        assert_almost_eq(testing.normal_at(t, p), [0, 0, -1])
