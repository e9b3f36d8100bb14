"""World/integrator conformance tests (reference: src/world.rs:166-547, 24 tests)."""

import math

import numpy as np

from rtc_tpu import testing
from rtc_tpu.ops import transforms as X
from rtc_tpu.scene import shapes as S
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.scene.materials import Material, test_pattern
from rtc_tpu.scene.world import PointLight, World, default_world

from conftest import assert_almost_eq

S2 = math.sqrt(2.0)
RECURSION_LIMIT = 5
WHITE = (1.0, 1.0, 1.0)


def compiled(w):
    return compile_scene(w, dtype=np.float64)


def test_creating_a_world():
    w = World(light=PointLight((0, 0, 0), WHITE))
    assert w.objects == []
    assert w.light.position == (0, 0, 0)


def test_the_default_world():
    w = default_world()
    assert w.light.position == (-10.0, 10.0, -10.0)
    assert w.objects[0].material.color == (0.8, 1.0, 0.6)
    assert w.objects[0].material.diffuse == 0.7
    assert w.objects[0].material.specular == 0.2
    assert_almost_eq(w.objects[1].transform, np.diag([0.5, 0.5, 0.5, 1.0]))


def test_intersect_a_world_with_a_ray():
    w = default_world()
    g = S.group(w.objects)
    ts, _ = testing.intersect_shape(g, [0, 0, -5], [0, 0, 1])
    assert_almost_eq(ts, [4.0, 4.5, 5.5, 6.0])


def test_shading_an_intersection():
    scene = compiled(default_world())
    c = testing.shade_hit(scene, [0, 0, -5], [0, 0, 1], 4.0, prim_id=0,
                          remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0.38066, 0.47583, 0.2855])


def test_shading_an_intersection_from_the_inside():
    w = default_world()
    w.light = PointLight((0.0, 0.25, 0.0), WHITE)
    scene = compiled(w)
    c = testing.shade_hit(scene, [0, 0, 0], [0, 0, 1], 0.5, prim_id=1,
                          remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0.90498, 0.90498, 0.90498])


def test_the_color_when_a_ray_misses():
    scene = compiled(default_world())
    c = testing.color_at_single(scene, [0, 0, -5], [0, 1, 0])
    assert_almost_eq(c, [0, 0, 0])


def test_the_color_when_a_ray_hits():
    scene = compiled(default_world())
    c = testing.color_at_single(scene, [0, 0, -5], [0, 0, 1])
    assert_almost_eq(c, [0.38066, 0.47583, 0.2855])


def test_the_color_with_an_intersection_behind_the_ray():
    w = default_world()
    w.objects[0].material.ambient = 1.0
    w.objects[1].material.ambient = 1.0
    scene = compiled(w)
    c = testing.color_at_single(scene, [0, 0, 0.75], [0, 0, -1])
    assert_almost_eq(c, w.objects[1].material.color)


def test_there_is_no_shadow_when_nothing_is_collinear_with_point_and_light():
    scene = compiled(default_world())
    assert not testing.is_shadowed(scene, [0, 10, 0])


def test_the_shadow_when_an_object_is_between_the_point_and_the_light():
    scene = compiled(default_world())
    assert testing.is_shadowed(scene, [10, -10, 10])


def test_there_is_no_shadow_when_an_object_is_behind_the_light():
    scene = compiled(default_world())
    assert not testing.is_shadowed(scene, [-20, 20, -20])


def test_there_is_no_shadow_when_an_object_is_behind_the_point():
    scene = compiled(default_world())
    assert not testing.is_shadowed(scene, [-2, 2, -2])


def test_shade_hit_is_given_an_intersection_in_shadow():
    s1 = S.sphere()
    s2 = S.sphere(transform=X.translation(0, 0, 10))
    w = World(objects=[s1, s2], light=PointLight((0, 0, -10), WHITE))
    scene = compiled(w)
    c = testing.shade_hit(scene, [0, 0, 5], [0, 0, 1], 4.0, prim_id=1,
                          remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0.1, 0.1, 0.1])


def test_the_reflected_color_for_a_nonreflective_material():
    w = default_world()
    w.objects[1].material.ambient = 1.0
    scene = compiled(w)
    c = testing.reflected_color(scene, [0, 0, 5], [0, 0, 1], 1.0, prim_id=1,
                                remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0, 0, 0])


def _reflective_floor_world():
    w = default_world()
    shape = S.plane(transform=X.translation(0, -1, 0),
                    material=Material(reflective=0.5))
    w.objects.append(shape)
    return w


def test_the_reflected_color_for_a_reflective_material():
    scene = compiled(_reflective_floor_world())
    c = testing.reflected_color(scene, [0, 0, -3], [0, -S2 / 2, S2 / 2], S2,
                                prim_id=2, remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0.19033, 0.23791, 0.14274])


def test_shade_hit_with_a_reflective_material():
    scene = compiled(_reflective_floor_world())
    c = testing.shade_hit(scene, [0, 0, -3], [0, -S2 / 2, S2 / 2], S2,
                          prim_id=2, remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0.87675, 0.92434, 0.82918])


def test_color_at_with_mutually_reflective_surfaces():
    lower = S.plane(transform=X.translation(0, -1, 0), material=Material(reflective=1.0))
    upper = S.plane(transform=X.translation(0, 1, 0), material=Material(reflective=1.0))
    w = World(objects=[lower, upper], light=PointLight((0, 0, 0), WHITE))
    scene = compiled(w)
    c = testing.color_at_single(scene, [0, 0, 0], [0, 1, 0])
    assert np.all(np.isfinite(c))  # terminates, no NaN/inf


def test_the_reflected_color_at_the_maximum_recursive_depth():
    scene = compiled(_reflective_floor_world())
    c = testing.reflected_color(scene, [0, 0, -3], [0, -S2 / 2, S2 / 2], S2,
                                prim_id=2, remaining=0)
    assert_almost_eq(c, [0, 0, 0])


def test_the_refracted_color_with_an_opaque_surface():
    scene = compiled(default_world())
    c = testing.refracted_color(scene, [0, 0, -5], [0, 0, 1], 4.0, prim_id=0,
                                remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0, 0, 0])


def _glassy_outer_world():
    w = default_world()
    w.objects[0].material.transparency = 1.0
    w.objects[0].material.refractive_index = 1.5
    return w


def test_the_refracted_color_at_the_maximum_recursive_depth():
    scene = compiled(_glassy_outer_world())
    c = testing.refracted_color(scene, [0, 0, -5], [0, 0, 1], 4.0, prim_id=0,
                                remaining=0)
    assert_almost_eq(c, [0, 0, 0])


def test_the_refracted_color_under_total_internal_reflection():
    scene = compiled(_glassy_outer_world())
    c = testing.refracted_color(scene, [0, 0, S2 / 2], [0, 1, 0], S2 / 2,
                                prim_id=0, remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0, 0, 0])


def test_the_refracted_color_with_a_refracted_ray():
    w = default_world()
    w.objects[0].material.ambient = 1.0
    w.objects[0].material.pattern = test_pattern()
    w.objects[1].material.transparency = 1.0
    w.objects[1].material.refractive_index = 1.5
    scene = compiled(w)
    c = testing.refracted_color(scene, [0, 0, 0.1], [0, 1, 0], 0.4899,
                                prim_id=1, remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0.0, 0.99888, 0.04721], eps=1e-4)


def _transparent_floor_world(reflective=0.0):
    w = default_world()
    floor = S.plane(
        transform=X.translation(0, -1, 0),
        material=Material(transparency=0.5, refractive_index=1.5, reflective=reflective),
    )
    w.objects.append(floor)
    ball = S.sphere(
        transform=X.translation(0, -3.5, -0.5),
        material=Material(color=(1.0, 0.0, 0.0), ambient=0.5),
    )
    w.objects.append(ball)
    return w


def test_shade_hit_with_a_transparent_material():
    scene = compiled(_transparent_floor_world())
    c = testing.shade_hit(scene, [0, 0, -3], [0, -S2 / 2, S2 / 2], S2,
                          prim_id=2, remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0.93642, 0.68642, 0.68642])


def test_shade_hit_with_a_reflective_transparent_material():
    scene = compiled(_transparent_floor_world(reflective=0.5))
    c = testing.shade_hit(scene, [0, 0, -3], [0, -S2 / 2, S2 / 2], S2,
                          prim_id=2, remaining=RECURSION_LIMIT)
    assert_almost_eq(c, [0.93391, 0.69643, 0.69243])
