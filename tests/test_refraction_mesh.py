"""Refraction through triangle meshes: n1/n2 container semantics.

The reference's containers walk is shape-agnostic (src/intersection.rs:29-62):
ANY object — including a closed triangle mesh — acts as a refractive
container. These tests pin the vectorized crossing-parity equivalent for
meshes:

  * the book's glass-ladder table (src/intersection.rs:287-325) reproduced
    with triangulated cube meshes whose nesting order along the ray matches
    the book's three overlapping glass spheres — same expected n1/n2 table;
  * a mixed analytic-sphere-inside-glass-mesh scene checked against a direct
    Python implementation of the reference's containers walk;
  * the production render path (color_at) on a glass mesh actually bends
    light (differs from a straight-through render).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import assert_almost_eq

from rtc_tpu.render import integrator
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.scene.materials import Material
from rtc_tpu.scene.shapes import mesh, sphere
from rtc_tpu.scene.world import PointLight, World
from rtc_tpu.ops import transforms as X
from rtc_tpu.utils.config import RenderConfig

CFG = RenderConfig(dtype="float64")


def cube_mesh(material=None, transform=None):
    """A closed unit cube (+-1) as 12 triangles with outward winding
    (reference winding convention n = e2 x e1, src/shape.rs:188)."""
    corners = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
        dtype=np.float64)
    # each face as two triangles; orientation irrelevant for containment
    # parity (crossings are counted, not signed)
    faces = [
        (0, 1, 3), (0, 3, 2),  # x = -1
        (4, 6, 7), (4, 7, 5),  # x = +1
        (0, 4, 5), (0, 5, 1),  # y = -1
        (2, 3, 7), (2, 7, 6),  # y = +1
        (0, 2, 6), (0, 6, 4),  # z = -1
        (1, 5, 7), (1, 7, 3),  # z = +1
    ]
    f = np.asarray(faces)
    return mesh(corners[f[:, 0]], corners[f[:, 1]], corners[f[:, 2]],
                material=material, transform=transform)


def glass(ior):
    return Material(transparency=1.0, refractive_index=ior)


def crossings(scene, o, d, eps):
    """All (t, obj, is_tri, gid) crossings of the scene along one ray,
    sorted ascending — built from the candidate sweeps so each entry can be
    replayed as a production HitInfo."""
    o1 = jnp.asarray([o], jnp.float64)
    d1 = jnp.asarray([d], jnp.float64)
    out = []
    if scene.static.n_prims:
        t, v = integrator.prim_candidates(scene, o1, d1, eps)
        t, v = np.asarray(t)[0], np.asarray(v)[0]
        for n in range(t.shape[0]):
            for s in range(4):
                if v[n, s]:
                    out.append((float(t[n, s]),
                                int(np.asarray(scene.prim_obj)[n]), False, n))
    if scene.static.n_tris:
        t, v = integrator.tri_candidates(scene, o1, d1, eps)
        t, v = np.asarray(t)[0], np.asarray(v)[0]
        for i in np.where(v)[0]:
            out.append((float(t[i]), int(np.asarray(scene.tri_obj)[i]), True,
                        int(i)))
    return sorted(out)


def production_n1_n2(scene, o, d, t, obj, is_tri, gid):
    """refraction_indices through the production path for one chosen hit."""
    hit = integrator.HitInfo(
        t=jnp.asarray([t], jnp.float64),
        valid=jnp.ones((1,), bool),
        obj=jnp.asarray([obj], jnp.int32),
        prim=jnp.asarray([0 if is_tri else gid], jnp.int32),
        tri=jnp.asarray([gid if is_tri else 0], jnp.int32),
        is_tri=jnp.asarray([is_tri]),
        tri_n=jnp.zeros((1, 3), jnp.float64),
    )
    n1, n2 = integrator.refraction_indices(
        scene, jnp.asarray([o], jnp.float64), jnp.asarray([d], jnp.float64),
        hit, CFG)
    return float(n1[0]), float(n2[0])


def containers_walk(xs, iors, hit_i):
    """Direct Python transcription of the reference's containers walk
    (src/intersection.rs:29-62) over a sorted (t, obj, ...) list."""
    containers = []
    for i, (_, obj, _, _) in enumerate(xs):
        if i == hit_i:
            n1 = iors[containers[-1]] if containers else 1.0
        if obj in containers:
            containers.remove(obj)
        else:
            containers.append(obj)
        if i == hit_i:
            n2 = iors[containers[-1]] if containers else 1.0
            return n1, n2
    raise AssertionError("hit index out of range")


# the book's glass-ladder expectations (src/intersection.rs:301-309)
LADDER = [
    (1.0, 1.5),
    (1.5, 2.0),
    (2.0, 2.5),
    (2.5, 2.5),
    (2.5, 1.5),
    (1.5, 1.0),
]


def ladder_world_mesh():
    """The book's A/B/C overlapping glass ladder with cubes: A scale 2
    (z in [-2,2]), B at z-0.25 (z in [-1.25,0.75]), C at z+0.25
    (z in [-0.75,1.25]) — the crossing order along +z from z=-4 is identical
    to the sphere ladder's, so the book's n1/n2 table applies verbatim."""
    a = cube_mesh(material=glass(1.5), transform=X.scaling(2, 2, 2))
    b = cube_mesh(material=glass(2.0), transform=X.translation(0, 0, -0.25))
    c = cube_mesh(material=glass(2.5), transform=X.translation(0, 0, 0.25))
    return World(objects=[a, b, c], light=PointLight((-10, 10, -10), (1, 1, 1)))


def test_mesh_glass_ladder_matches_book_table():
    scene = compile_scene(ladder_world_mesh(), dtype=jnp.float64)
    # off-center so the ray crosses face interiors, not the shared triangle
    # diagonals (an exact edge hit yields two same-t crossings — the
    # reference's walk would likewise toggle twice, src/intersection.rs:40-49)
    o, d = [0.3, 0.1, -4.0], [0.0, 0.0, 1.0]
    xs = crossings(scene, o, d, CFG.epsilon)
    # each boundary plane is crossed on one of its two triangles -> 6 hits
    assert len(xs) == 6
    for i, (t, obj, is_tri, gid) in enumerate(xs):
        n1, n2 = production_n1_n2(scene, o, d, t, obj, is_tri, gid)
        assert_almost_eq([n1, n2], list(LADDER[i]))


def test_mesh_ladder_agrees_with_containers_walk_oracle():
    scene = compile_scene(ladder_world_mesh(), dtype=jnp.float64)
    o, d = [0.37, 0.13, -4.0], [0.0, 0.0, 1.0]  # off-axis ray
    xs = crossings(scene, o, d, CFG.epsilon)
    iors = np.asarray(scene.mat_ior)
    for i, (t, obj, is_tri, gid) in enumerate(xs):
        got = production_n1_n2(scene, o, d, t, obj, is_tri, gid)
        want = containers_walk(xs, iors, i)
        assert_almost_eq(list(got), list(want))


def test_sphere_inside_glass_mesh():
    """Mixed containers: an analytic glass sphere nested inside a glass mesh
    cube — analytic and mesh crossing counts merge into one stack."""
    outer = cube_mesh(material=glass(1.5), transform=X.scaling(2, 2, 2))
    inner = sphere(material=glass(2.0))
    w = World(objects=[outer, inner], light=PointLight((-10, 10, -10), (1, 1, 1)))
    scene = compile_scene(w, dtype=jnp.float64)
    o, d = [0.2, 0.1, -5.0], [0.0, 0.0, 1.0]  # off the face diagonals
    xs = crossings(scene, o, d, CFG.epsilon)
    assert len(xs) == 4  # enter cube, enter sphere, exit sphere, exit cube
    iors = np.asarray(scene.mat_ior)
    expected = [(1.0, 1.5), (1.5, 2.0), (2.0, 1.5), (1.5, 1.0)]
    for i, (t, obj, is_tri, gid) in enumerate(xs):
        got = production_n1_n2(scene, o, d, t, obj, is_tri, gid)
        assert_almost_eq(list(got), list(expected[i]))
        assert_almost_eq(list(got), list(containers_walk(xs, iors, i)))


def test_glass_mesh_bends_light_in_render():
    """End-to-end: color through a refractive mesh must use Snell refraction
    (n1 != n2), i.e. differ from a transparent pass-through (ior 1.0)."""
    from rtc_tpu.scene.shapes import plane
    from rtc_tpu.scene.materials import gradient_pattern

    # continuous pattern: ANY lateral refraction offset changes the color
    # (checkers could land both bent and unbent rays on same-parity squares)
    floor = plane(material=Material(
        pattern=gradient_pattern((1, 0, 0), (0, 0, 1)),
        specular=0.0))

    def scene_with_ior(ior):
        g = cube_mesh(
            material=Material(transparency=0.9, refractive_index=ior,
                              diffuse=0.1, ambient=0.0, specular=0.0),
            transform=X.translation(0, 2.0, 0))
        w = World(objects=[floor, g], light=PointLight((-10, 10, -10), (1, 1, 1)))
        return compile_scene(w, dtype=jnp.float64)

    # slanted ray entering the cube's top face toward the floor; budget 8 so
    # the refracted chain reaches the floor (each secondary costs 3 budget:
    # primary 8 -> enter-cube child 5 -> exit-cube grandchild 2 shades floor)
    cfg8 = RenderConfig(dtype="float64", max_depth=8)
    o = jnp.asarray([[0.4, 5.0, -1.2]], jnp.float64)
    d = jnp.asarray([[-0.12, -1.0, 0.35]], jnp.float64)
    d = d / jnp.linalg.norm(d)
    c_glass = np.asarray(integrator.color_at(scene_with_ior(1.5), o, d, cfg8))[0]
    c_thru = np.asarray(integrator.color_at(scene_with_ior(1.0), o, d, cfg8))[0]
    assert np.any(np.abs(c_glass - c_thru) > 1e-3), (
        f"refraction had no effect: glass={c_glass} passthrough={c_thru}")
