"""Differentiable rendering: autodiff vs finite differences (BASELINE.json
'pixel-grad allclose vs finite-diff')."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtc_tpu.diff import render_grad as RG
from rtc_tpu.models.scenes import REGISTRY
from rtc_tpu.render import integrator
from rtc_tpu.render.camera import camera_rays
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.utils.config import RenderConfig

CFG = RenderConfig(dtype="float64")


def rays_for(cam, n=None):
    o, d = camera_rays(
        jnp.asarray(cam.transform_inverse, jnp.float64),
        cam.hsize, cam.vsize, cam.half_width, cam.half_height, cam.pixel_size,
        dtype=jnp.float64,
    )
    return o, d


@pytest.fixture(scope="module")
def setup():
    world, cam = REGISTRY["glass_spheres"](16)
    scene = compile_scene(world, dtype=np.float64)
    o, d = rays_for(cam)
    target = jnp.zeros_like(o) + 0.25
    params = RG.extract_params(scene)
    return params, scene, o, d, target


@pytest.mark.parametrize(
    "name,index",
    [
        ("mat_color", (0, 1)),
        ("mat_ambient", (0,)),
        ("mat_diffuse", (0,)),
        ("mat_reflective", (1,)),
        ("mat_transparency", (1,)),
        ("mat_ior", (1,)),
        ("light_pos", (1,)),
        ("light_intensity", (2,)),
        ("pat_a", (0, 0)),
    ],
)
def test_grad_matches_finite_diff(setup, name, index):
    params, scene, o, d, target = setup
    ad, fd = RG.finite_diff_check(params, scene, o, d, target, CFG, name, index)
    assert np.isfinite(ad) and np.isfinite(fd)
    np.testing.assert_allclose(ad, fd, rtol=2e-3, atol=1e-7)


def test_transform_grads_flow(setup):
    params, scene, o, d, target = setup
    params = RG.extract_params(scene, RG.DEFAULT_PARAMS + RG.TRANSFORM_PARAMS)
    ad, fd = RG.finite_diff_check(params, scene, o, d, target, CFG,
                                  "prim_inv", (1, 0, 3))
    assert np.isfinite(ad) and abs(ad) > 0
    np.testing.assert_allclose(ad, fd, rtol=5e-3, atol=1e-7)


def test_grads_are_nan_free_everywhere(setup):
    params, scene, o, d, target = setup
    _, grads = RG.loss_and_grad(params, scene, o, d, target, CFG)
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), f"non-finite grad in {k}"


def test_optimization_reduces_loss(setup):
    import optax

    params, scene, o, d, target = setup
    tx = optax.adam(5e-2)
    step = RG.make_train_step(tx, CFG)
    opt_state = tx.init(params)
    l0 = None
    loss = None
    for i in range(10):
        params, opt_state, loss = step(params, opt_state, scene, o, d, target)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0


# --- camera-pose gradients ----------------------------------------------------


def test_camera_pose_gradients_match_finite_diff():
    """Gradients of the render w.r.t. camera pose (from/to/up/fov) vs central
    finite differences — ray-gen is traceable end-to-end."""
    from rtc_tpu.diff import render_grad as RG
    from rtc_tpu.scene.world import default_world

    scene = compile_scene(default_world(), dtype=jnp.float64)
    cfg = RenderConfig(dtype="float64")
    hsize = vsize = 8
    cam = RG.camera_params([0.0, 1.5, -5.0], [0.0, 1.0, 0.0],
                           [0.0, 1.0, 0.0], math.pi / 3)
    # target: render from a slightly different pose
    cam_t = RG.camera_params([0.1, 1.4, -5.0], [0.0, 1.0, 0.0],
                             [0.0, 1.0, 0.0], math.pi / 3 + 0.05)
    o_t, d_t = RG.camera_pose_rays(cam_t, hsize, vsize, jnp.float64)
    target = integrator.color_at(scene, o_t, d_t, cfg)

    loss = lambda c: RG.camera_render_loss(c, scene, target, cfg, hsize, vsize)
    grads = jax.grad(loss)(cam)

    eps = 1e-6
    for name, index in (("cam_from", (0,)), ("cam_from", (2,)),
                        ("cam_to", (1,)), ("cam_fov", ())):
        def loss_at(v):
            c = dict(cam)
            c[name] = c[name].at[index].set(v) if index else jnp.asarray(v, jnp.float64)
            return float(loss(c))

        v0 = float(cam[name][index]) if index else float(cam[name])
        fd = (loss_at(v0 + eps) - loss_at(v0 - eps)) / (2 * eps)
        ad = float(grads[name][index]) if index else float(grads[name])
        assert abs(ad - fd) < 1e-4 * max(1.0, abs(fd)), (
            f"{name}[{index}]: autodiff {ad} vs finite-diff {fd}")
        assert abs(ad) > 1e-12, f"{name}[{index}] gradient is dead"


def test_camera_pose_recovery_step():
    """A few SGD steps on the camera pose reduce the pose-mismatch loss."""
    from rtc_tpu.diff import render_grad as RG
    from rtc_tpu.scene.world import default_world

    scene = compile_scene(default_world(), dtype=jnp.float64)
    cfg = RenderConfig(dtype="float64")
    hsize = vsize = 8
    true_cam = RG.camera_params([0.0, 1.5, -5.0], [0.0, 1.0, 0.0],
                                [0.0, 1.0, 0.0], math.pi / 3)
    o_t, d_t = RG.camera_pose_rays(true_cam, hsize, vsize, jnp.float64)
    target = integrator.color_at(scene, o_t, d_t, cfg)

    cam = RG.camera_params([0.15, 1.45, -5.0], [0.0, 1.0, 0.0],
                           [0.0, 1.0, 0.0], math.pi / 3)
    loss = lambda c: RG.camera_render_loss(c, scene, target, cfg, hsize, vsize)
    vg = jax.jit(jax.value_and_grad(loss))
    l0, _ = vg(cam)
    lr = 1.0
    for _ in range(60):
        l, g = vg(cam)
        cam = jax.tree_util.tree_map(lambda p, gr: p - lr * gr, cam, g)
    l1, _ = vg(cam)
    assert float(l1) < 0.5 * float(l0), (float(l0), float(l1))
