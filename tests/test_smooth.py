"""Smooth (Phong-interpolated) triangles — the book feature the reference
stubs out (src/obj_file.rs:295-335, src/intersection.rs:381-386)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtc_tpu import testing
from rtc_tpu.io.obj import Parser
from rtc_tpu.models.scenes import REGISTRY
from rtc_tpu.render import integrator
from rtc_tpu.render.renderer import render
from rtc_tpu.scene import shapes as S
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.scene.world import World
from rtc_tpu.utils.config import RenderConfig

from conftest import assert_almost_eq


def _smooth_tri_scene():
    """The book's canonical smooth triangle: p=(0,1,0),(-1,0,0),(1,0,0),
    normals n1=(0,1,0), n2=(-1,0,0), n3=(1,0,0)."""
    m = S.mesh(
        v1=[[0, 1, 0]], v2=[[-1, 0, 0]], v3=[[1, 0, 0]],
        vn1=[[0, 1, 0]], vn2=[[-1, 0, 0]], vn3=[[1, 0, 0]],
    )
    return compile_scene(World(objects=[m]), dtype=np.float64)


def test_vn_records_parse_in_nonstrict_mode():
    text = "v 0 1 0\nv -1 0 0\nv 1 0 0\nvn 0 1 0\nvn -1 0 0\nvn 1 0 0\nf 1//1 2//2 3//3\n"
    p = Parser.from_obj_str(text, strict=False)
    assert len(p.normals_list) == 3
    m = p.group_mesh(None)
    assert m.vn1 is not None
    assert_almost_eq(m.vn1[0], [0, 1, 0])
    assert_almost_eq(m.vn2[0], [-1, 0, 0])


def test_smooth_scene_static_flag():
    scene = _smooth_tri_scene()
    assert scene.static.any_smooth
    assert scene.tri_sn1.shape[0] == scene.static.n_tris


def test_smooth_normal_interpolates_with_uv():
    """Book: 'an intersection with a smooth triangle' at u=0.45, v=0.25
    interpolates to normal ~(-0.5547, 0.83205, 0)."""
    scene = _smooth_tri_scene()
    cfg = RenderConfig(dtype="float64")
    # ray hitting the triangle at u=0.45, v=0.25: point = p1 + u*e1 + v*e2
    # with e1 = p2-p1 = (-1,-1,0), e2 = p3-p1 = (1,-1,0)
    u, v = 0.45, 0.25
    px = 0 + u * -1 + v * 1
    py = 1 + u * -1 + v * -1
    o = jnp.asarray([[px, py, -2.0]], dtype=jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float64)
    hit = integrator.closest_hit(scene, o, d, cfg)
    assert bool(hit.valid[0])
    n = np.asarray(hit.tri_n)[0]
    expected = np.array([-1 * u + 1 * v, 1 * (1 - u - v), 0.0])
    expected /= np.linalg.norm(expected)
    assert_almost_eq(n, expected, eps=1e-9)


def test_flat_mesh_mixed_with_smooth_keeps_face_normals():
    flat = S.mesh(v1=[[0, 1, 5]], v2=[[-1, 0, 5]], v3=[[1, 0, 5]])
    smooth = S.mesh(
        v1=[[0, 1, 0]], v2=[[-1, 0, 0]], v3=[[1, 0, 0]],
        vn1=[[0, 1, 0]], vn2=[[-1, 0, 0]], vn3=[[1, 0, 0]],
    )
    scene = compile_scene(World(objects=[flat, smooth]), dtype=np.float64)
    cfg = RenderConfig(dtype="float64")
    o = jnp.asarray([[0.0, 0.5, 2.0]], dtype=jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float64)  # hits flat tri at z=5
    hit = integrator.closest_hit(scene, o, d, cfg)
    assert bool(hit.valid[0])
    n = np.asarray(hit.tri_n)[0]
    assert_almost_eq(np.abs(n), [0, 0, 1])  # face normal, not interpolated


def test_smooth_vertex_normals_on_shared_vertices():
    # two triangles sharing an edge at 90 degrees: shared-vertex normals
    # average the face normals
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64)
    faces = np.array([[0, 1, 2], [0, 3, 1]])
    n = S.smooth_vertex_normals(verts, faces)
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0)


def test_teapot_smooth_renders_and_differs_from_flat():
    world_f, cam = REGISTRY["teapot"](32)
    world_s, _ = REGISTRY["teapot_smooth"](32)
    cfg = RenderConfig(ray_tile=512, dtype="float32")
    img_f = np.asarray(render(compile_scene(world_f, dtype=np.float32), cam, cfg))
    img_s = np.asarray(render(compile_scene(world_s, dtype=np.float32), cam, cfg))
    assert np.all(np.isfinite(img_s))
    # smooth shading visibly changes the lighting but not the silhouette
    hit_f = img_f.sum(-1) > 0
    hit_s = img_s.sum(-1) > 0
    assert (hit_f == hit_s).mean() > 0.97
    assert np.abs(img_f - img_s).max() > 0.01
