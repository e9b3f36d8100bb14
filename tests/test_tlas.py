"""Instanced (TLAS) mesh path: compile-time table construction, kernel
parity vs the bruteforce sweep (interpret mode), shading/shadow parity, and
gradients through the instanced custom-JVP.

The reference renders repeated groups by re-walking one shape tree per ray
(src/shape.rs:399-436); the TPU-native equivalent keeps the unique geometry
VMEM-resident once and transforms ray tiles into instance space in-kernel
(rtc_tpu/ops/pallas/mesh_intersect.py: _kernel_mxu_tlas)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtc_tpu.models.scenes import REGISTRY, cow_herd_world, _cam
from rtc_tpu.render import integrator
from rtc_tpu.render.camera import camera_rays
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.utils.config import RenderConfig

BF = RenderConfig(dtype="float32", mesh_impl="bruteforce")
KERN = RenderConfig(dtype="float32", mesh_impl="mxu_interpret")


@pytest.fixture(scope="module")
def herd():
    """3x3 cows: 52k world triangles (> VMEM budget -> TLAS eligible),
    one unique 5,804-triangle mesh."""
    world = cow_herd_world(3, 3)
    cam = _cam(64, [0, 10, -18], [0, 3, 2])
    scene = compile_scene(world)
    dt = jnp.float32
    o, d = camera_rays(
        jnp.asarray(cam.transform_inverse, dt), cam.hsize, cam.vsize,
        jnp.asarray(cam.half_width, dt), jnp.asarray(cam.half_height, dt),
        jnp.asarray(cam.pixel_size, dt), dt)
    return scene, o, d


def test_tlas_built(herd):
    scene, _, _ = herd
    st = scene.static
    assert st.tlas_n_inst == 16   # 9 real instances padded to 16
    assert st.tlas_n_mesh == 1
    assert st.tlas_cm > 0
    tl = scene.tlas
    assert tl.p1.shape == (st.tlas_n_mesh * st.tlas_cm * st.cluster_size, 3)
    assert tl.gid.shape == (st.tlas_n_inst, st.tlas_cm * st.cluster_size)


def test_tlas_not_built_when_single_or_small():
    # single cow fits VMEM: stays on the flat world-table path
    world, _ = REGISTRY["cow"](64)
    assert compile_scene(world).static.tlas_n_inst == 0


def test_tlas_gid_roundtrip(herd):
    """Instance-local rows must map to the world-table rows holding the SAME
    triangle pushed through the instance transform."""
    scene, _, _ = herd
    tl = scene.tlas
    st = scene.static
    tm = st.tlas_cm * st.cluster_size
    p1w = np.asarray(scene.tri_p1)
    A = np.asarray(tl.inst_ab)[:, :9].reshape(-1, 3, 3)
    b = np.asarray(tl.inst_ab)[:, 9:]
    up1 = np.asarray(tl.p1)
    ue1 = np.asarray(tl.e1)
    gid = np.asarray(tl.gid)
    for i in (0, 4, 8):
        m = int(np.asarray(tl.inst_mesh)[i])
        real = np.abs(ue1[m * tm:(m + 1) * tm]).sum(1) > 0
        back = p1w[gid[i][real]] @ A[i].T + b[i]
        np.testing.assert_allclose(
            back, up1[m * tm:(m + 1) * tm][real], atol=1e-4)


def test_tlas_closest_parity(herd):
    scene, o, d = herd
    t_b, i_b = integrator.mesh_closest(scene, o, d, BF)
    t_k, i_k = integrator.mesh_closest(scene, o, d, KERN)
    t_b, t_k, i_b, i_k = map(np.asarray, (t_b, t_k, i_b, i_k))
    hit_b, hit_k = t_b < 1e29, t_k < 1e29
    assert (hit_b == hit_k).all()
    assert hit_b.sum() > 100
    np.testing.assert_allclose(t_b[hit_b], t_k[hit_b], atol=5e-4)
    # winner ids agree through the gid mapping (same world-table rows)
    assert (i_b[hit_b] == i_k[hit_b]).mean() > 0.999


def test_tlas_normals_and_obj(herd):
    """In-kernel payload (world normal + object id) vs the gathered ones."""
    scene, o, d = herd
    t_k, i_k, n_k = integrator.mesh_closest(scene, o, d, KERN, want_n=True)
    hit = np.asarray(t_k) < 1e29
    n_ref = np.asarray(scene.tri_n)[np.asarray(i_k)]
    np.testing.assert_allclose(
        np.asarray(n_k)[hit], n_ref[hit], atol=1e-3)
    hit_info = integrator.closest_hit(scene, o, d, KERN)
    obj_ref = np.asarray(scene.tri_obj)[np.asarray(i_k)]
    np.testing.assert_array_equal(
        np.asarray(hit_info.obj)[hit], obj_ref[hit])


def test_tlas_shadow_parity(herd):
    scene, o, d = herd
    t_b, i_b = integrator.mesh_closest(scene, o, d, BF)
    t_safe = jnp.where(t_b < 1e29, t_b, 1.0)
    n = scene.tri_n[i_b]
    # the renderer's over-point (hit + eps * n) — querying the raw surface
    # point is backend-noise at t == 0
    p = o + d * t_safe[:, None] + n * BF.epsilon
    live = t_b < 1e29
    s_b = np.asarray(integrator.is_shadowed(scene, p, BF, live=live))
    s_k = np.asarray(integrator.is_shadowed(scene, p, KERN, live=live))
    agree = (s_b == s_k) | ~np.asarray(live)
    assert agree.mean() > 0.999


def test_tlas_color_parity(herd):
    scene, o, d = herd
    c_b = np.asarray(integrator.color_at(scene, o, d, BF))
    c_k = np.asarray(integrator.color_at(scene, o, d, KERN))
    assert np.abs(c_b - c_k).max() < 1e-3


def test_tlas_camera_gradients(herd):
    """d(sum t)/d(origin) through the instanced custom-JVP matches the
    bruteforce (fully differentiable) path."""
    scene, o, d = herd
    sl = slice(0, 256)
    o_s, d_s = o[sl], d[sl]

    def loss(cfg):
        def f(shift):
            t, _ = integrator.mesh_closest(scene, o_s + shift, d_s, cfg)
            return jnp.sum(jnp.where(t < 1e29, t, 0.0))
        return f

    z = jnp.zeros((3,), jnp.float32)
    g_b = np.asarray(jax.grad(loss(BF))(z))
    g_k = np.asarray(jax.grad(loss(KERN))(z))
    np.testing.assert_allclose(g_b, g_k, rtol=1e-3, atol=1e-3)


# --- smooth (corner-normal-blending) instanced path --------------------------
#
# cow_herd_smooth composes the two capabilities the reference lacks: smooth
# triangles (stubbed at src/intersection.rs:381-386) and instancing. The
# TLAS kernel blends the winner's OBJECT-space corner normals with its
# in-kernel (u, v) and pushes the blend through the instance
# inverse-transpose (mesh_intersect._kernel_mxu_tlas with_sn).

@pytest.fixture(scope="module")
def herd_sn():
    from rtc_tpu.models.scenes import cow_herd_smooth_world

    world = cow_herd_smooth_world(3, 3)
    cam = _cam(64, [0, 10, -18], [0, 3, 2])
    scene = compile_scene(world)
    dt = jnp.float32
    o, d = camera_rays(
        jnp.asarray(cam.transform_inverse, dt), cam.hsize, cam.vsize,
        jnp.asarray(cam.half_width, dt), jnp.asarray(cam.half_height, dt),
        jnp.asarray(cam.pixel_size, dt), dt)
    return scene, o, d


def test_tlas_smooth_built(herd_sn):
    scene, _, _ = herd_sn
    st = scene.static
    assert st.tlas_n_inst == 16 and st.tlas_sn and st.any_smooth
    tm = st.tlas_n_mesh * st.tlas_cm * st.cluster_size
    assert scene.tlas.sn.shape == (tm, 9)
    # real rows carry unit corner normals
    sn = np.asarray(scene.tlas.sn)
    real = np.abs(np.asarray(scene.tlas.e1)).sum(1) > 0
    for k in range(3):
        np.testing.assert_allclose(
            np.linalg.norm(sn[real, 3 * k:3 * k + 3], axis=1), 1.0, atol=1e-5)


def test_tlas_smooth_closest_parity(herd_sn):
    scene, o, d = herd_sn
    t_b, i_b = integrator.mesh_closest(scene, o, d, BF)
    t_k, i_k = integrator.mesh_closest(scene, o, d, KERN)
    t_b, t_k, i_b, i_k = map(np.asarray, (t_b, t_k, i_b, i_k))
    hit_b, hit_k = t_b < 1e29, t_k < 1e29
    assert (hit_b == hit_k).all()
    assert hit_b.sum() > 100
    np.testing.assert_allclose(t_b[hit_b], t_k[hit_b], atol=5e-4)
    assert (i_b[hit_b] == i_k[hit_b]).mean() > 0.999


def test_tlas_smooth_normal_parity(herd_sn):
    """In-kernel blended world normal vs an XLA-side recompute: winner's
    (u, v) from a gathered Möller-Trumbore on the WORLD table + blend of the
    world-space corner slabs (the flat path's smooth formula)."""
    from rtc_tpu.ops import intersect

    scene, o, d = herd_sn
    t_k, i_k, n_k = integrator.mesh_closest(scene, o, d, KERN, want_n=True)
    hit = np.asarray(t_k) < 1e29
    idx = np.asarray(i_k)
    _, _, u, v = intersect.triangle(
        o, d, scene.tri_p1[idx], scene.tri_e1[idx], scene.tri_e2[idx],
        KERN.epsilon)
    u, v = np.asarray(u)[:, None], np.asarray(v)[:, None]
    g1 = np.asarray(scene.tri_sn1)[idx]
    g2 = np.asarray(scene.tri_sn2)[idx]
    g3 = np.asarray(scene.tri_sn3)[idx]
    n_ref = (1.0 - u - v) * g1 + u * g2 + v * g3
    n_ref /= np.maximum(np.linalg.norm(n_ref, axis=1, keepdims=True), 1e-12)
    dots = np.sum(np.asarray(n_k) * n_ref, axis=1)
    assert (dots[hit] > 0.999).mean() > 0.995


def test_tlas_smooth_color_parity(herd_sn):
    scene, o, d = herd_sn
    c_b = np.asarray(integrator.color_at(scene, o, d, BF))
    c_k = np.asarray(integrator.color_at(scene, o, d, KERN))
    # smooth normals amplify sub-ulp (u, v) differences on silhouette
    # triangles; bound the bulk tightly and allow isolated knife edges
    err = np.abs(c_b - c_k).max(axis=1)
    assert np.quantile(err, 0.999) < 2e-3 and (err > 0.05).sum() <= 2


def test_tlas_smooth_gradients(herd_sn):
    scene, o, d = herd_sn
    sl = slice(0, 256)
    o_s, d_s = o[sl], d[sl]

    def loss(cfg):
        def f(shift):
            t, _ = integrator.mesh_closest(scene, o_s + shift, d_s, cfg)
            return jnp.sum(jnp.where(t < 1e29, t, 0.0))
        return f

    z = jnp.zeros((3,), jnp.float32)
    g_b = np.asarray(jax.grad(loss(BF))(z))
    g_k = np.asarray(jax.grad(loss(KERN))(z))
    np.testing.assert_allclose(g_b, g_k, rtol=1e-3, atol=1e-3)


def test_tlas_prim_sharding_falls_back_to_flat(herd):
    """Documented behavior (integrator._use_tlas): under primitive sharding
    the TLAS tables are unused and the flat world-table path serves the
    scene — instance-table sharding is NOT implemented. This test pins the
    docstring's claim."""
    import dataclasses

    scene, _, _ = herd
    assert integrator._use_tlas(scene, KERN, "mxu_interpret")
    sharded = dataclasses.replace(KERN, prim_axis="prims")
    assert not integrator._use_tlas(scene, sharded, "mxu_interpret")
