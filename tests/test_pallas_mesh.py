"""Pallas two-level mesh kernel vs brute-force sweep (interpret mode on CPU;
the same kernel compiles natively on TPU)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from rtc_tpu.models.scenes import REGISTRY
from rtc_tpu.render import integrator
from rtc_tpu.render.camera import camera_rays
from rtc_tpu.render.renderer import render
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.utils.config import RenderConfig
from rtc_tpu.utils.constants import BIG


def rays_for(cam, dtype=jnp.float32):
    return camera_rays(
        jnp.asarray(cam.transform_inverse, dtype),
        cam.hsize, cam.vsize,
        jnp.asarray(cam.half_width, dtype),
        jnp.asarray(cam.half_height, dtype),
        jnp.asarray(cam.pixel_size, dtype), dtype)


@pytest.fixture(scope="module")
def teapot32():
    world, cam = REGISTRY["teapot"](32)
    scene = compile_scene(world, dtype=np.float32)
    o, d = rays_for(cam)
    return scene, o, d


IMPLS = ("pallas_interpret", "mxu_interpret")


@pytest.mark.parametrize("impl", IMPLS)
def test_pallas_matches_bruteforce(teapot32, impl):
    scene, o, d = teapot32
    brute = RenderConfig(dtype="float32", mesh_impl="bruteforce")
    pallas = RenderConfig(dtype="float32", mesh_impl=impl)
    t_b, i_b = integrator.mesh_closest(scene, o, d, brute)
    t_p, i_p = integrator.mesh_closest(scene, o, d, pallas)
    t_b, t_p = np.asarray(t_b), np.asarray(t_p)
    hit_b, hit_p = t_b < BIG / 2, t_p < BIG / 2
    np.testing.assert_array_equal(hit_b, hit_p)
    np.testing.assert_allclose(t_p[hit_p], t_b[hit_b], rtol=1e-5, atol=1e-6)
    # winning triangles agree except where two tris tie at the same t
    same = np.asarray(i_b) == np.asarray(i_p)
    assert same[hit_b].mean() > 0.99


@pytest.mark.parametrize("impl", IMPLS)
def test_pallas_render_matches_bruteforce(teapot32, impl):
    scene, o, d = teapot32
    world, cam = REGISTRY["teapot"](32)
    img_b = np.asarray(render(scene, cam, RenderConfig(
        dtype="float32", ray_tile=512, mesh_impl="bruteforce")))
    img_p = np.asarray(render(scene, cam, RenderConfig(
        dtype="float32", ray_tile=512, mesh_impl=impl)))
    diff = np.max(np.abs(img_b - img_p), axis=-1)
    assert (diff > 1e-4).mean() < 0.01


@pytest.mark.parametrize("impl", IMPLS)
def test_pallas_grad_flows_through_refinement(teapot32, impl):
    import jax

    scene, o, d = teapot32
    cfg = RenderConfig(dtype="float32", mesh_impl=impl)
    mid = o.shape[0] // 2  # center rays actually hit the teapot
    o, d = o[mid : mid + 64], d[mid : mid + 64]

    def loss(tri_p1):
        s = dataclasses.replace(scene, tri_p1=tri_p1)
        t, idx = integrator.mesh_closest(s, o, d, cfg)
        return jnp.sum(jnp.where(t < BIG / 2, t, 0.0))

    g = jax.grad(loss)(scene.tri_p1)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0.0


@pytest.mark.parametrize("impl", IMPLS)
def test_kernel_grad_matches_bruteforce(teapot32, impl):
    """The custom_jvp around the forward-only kernel must give the same
    vertex/ray gradients as differentiating the brute-force sweep."""
    import jax

    scene, o, d = teapot32
    mid = o.shape[0] // 2
    o, d = o[mid : mid + 64], d[mid : mid + 64]

    def loss_fn(cfg):
        def loss(tri_p1, o, d):
            s = dataclasses.replace(scene, tri_p1=tri_p1)
            t, idx = integrator.mesh_closest(s, o, d, cfg)
            return jnp.sum(jnp.where(t < BIG / 2, t, 0.0))
        return loss

    gk = jax.grad(loss_fn(RenderConfig(dtype="float32", mesh_impl=impl)),
                  argnums=(0, 1, 2))(scene.tri_p1, o, d)
    gb = jax.grad(loss_fn(RenderConfig(dtype="float32", mesh_impl="bruteforce")),
                  argnums=(0, 1, 2))(scene.tri_p1, o, d)
    for a, b in zip(gk, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_blocked_streaming_matches_single_call(teapot32):
    """Meshes beyond the VMEM budget stream in cluster superblocks; results
    must match the single-block kernel exactly."""
    from rtc_tpu.ops.pallas.mesh_intersect import (
        mesh_any_hit_mxu, mesh_closest_hit_mxu)

    scene, o, d = teapot32
    o = o[::7][:256]
    d = d[::7][:256]
    leaf = scene.static.cluster_size
    args = (scene.tri_p1, scene.tri_e1, scene.tri_e2, scene.cluster_aabb,
            scene.super_aabb)
    kw = dict(n_super=scene.static.n_super, leaf=leaf, interpret=True)
    t1, i1 = mesh_closest_hit_mxu(o, d, *args, **kw)
    # budget of 2 clusters -> many superblocks
    t2, i2 = mesh_closest_hit_mxu(o, d, *args, vmem_tri_budget=2 * leaf, **kw)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)

    mt = jnp.full(o.shape[:1], 50.0, jnp.float32)
    h1 = mesh_any_hit_mxu(o, d, mt, *args, **kw)
    h2 = mesh_any_hit_mxu(o, d, mt, *args, vmem_tri_budget=2 * leaf, **kw)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
