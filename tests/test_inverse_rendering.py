"""Inverse rendering: recover scene parameters from a target image by
gradient descent through the full renderer — the end-to-end differentiable
capability (BASELINE north star), impossible in the reference."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from rtc_tpu.diff import render_grad as RG
from rtc_tpu.ops import transforms as X
from rtc_tpu.render import integrator
from rtc_tpu.render.camera import Camera, camera_rays
from rtc_tpu.scene import shapes as S
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.scene.materials import Material
from rtc_tpu.scene.world import PointLight, World
from rtc_tpu.utils.config import RenderConfig

CFG = RenderConfig(dtype="float64")


def _setup(color=(0.2, 0.8, 0.3), tx=0.0):
    s = S.sphere(transform=X.translation(tx, 0, 0), material=Material(color=color))
    world = World(objects=[s], light=PointLight((-10, 10, -10), (1, 1, 1)))
    scene = compile_scene(world, dtype=np.float64)
    cam = Camera(24, 24, np.pi / 3)
    cam.set_transform(np.asarray(X.view_transform([0, 0, -4], [0, 0, 0], [0, 1, 0]),
                                 dtype=np.float64))
    o, d = camera_rays(jnp.asarray(cam.transform_inverse, jnp.float64),
                       cam.hsize, cam.vsize, cam.half_width, cam.half_height,
                       cam.pixel_size, jnp.float64)
    return scene, o, d


def test_recover_material_color():
    """Start from the wrong color, fit the rendered image to the target."""
    target_scene, o, d = _setup(color=(0.9, 0.1, 0.2))
    target = integrator.color_at(target_scene, o, d, CFG)

    scene, _, _ = _setup(color=(0.5, 0.5, 0.5))
    params = RG.extract_params(scene, names=("mat_color",))
    tx = optax.adam(0.1)
    step = RG.make_train_step(tx, CFG)
    opt_state = tx.init(params)
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state, scene, o, d, target)
    fit = np.asarray(params["mat_color"])[0]
    np.testing.assert_allclose(fit, [0.9, 0.1, 0.2], atol=0.02)


def test_recover_object_translation():
    """Recover an object's position through the hit-point gradients
    (implicit differentiation of t via the candidate closed forms).

    Gradients here are interior-shading gradients — silhouette edges are step
    functions with no gradient (ARCHITECTURE.md, gradients section), so the
    recoverable offset is one where the silhouettes mostly overlap."""
    target_scene, o, d = _setup(tx=0.15)
    target = integrator.color_at(target_scene, o, d, CFG)

    scene, _, _ = _setup(tx=0.0)
    params = RG.extract_params(scene, names=("prim_inv",))
    tx_opt = optax.adam(0.01)
    step = RG.make_train_step(tx_opt, CFG)
    opt_state = tx_opt.init(params)
    l0 = None
    for _ in range(80):
        params, opt_state, loss = step(params, opt_state, scene, o, d, target)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < 0.35 * l0
    # the optimized inverse translation should approach -0.15 in x
    inv = np.asarray(params["prim_inv"])[0]
    assert -0.2 < inv[0, 3] < -0.09


def test_param_checkpoint_roundtrip(tmp_path):
    """Orbax (or npz-fallback) save/restore of the trainable parameter
    pytree preserves every table bit-exactly."""
    import numpy as np

    from rtc_tpu.diff import checkpoint as ckpt
    from rtc_tpu.diff import render_grad as RG
    from rtc_tpu.models.scenes import REGISTRY
    from rtc_tpu.scene.compile import compile_scene

    world, _ = REGISTRY["three_spheres"](16)
    scene = compile_scene(world, dtype=np.float32)
    params = RG.extract_params(scene)
    path = ckpt.save(str(tmp_path / "params"), params, step=3)
    restored = ckpt.restore(path)
    assert set(restored) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(restored[k]))
