"""Differentiable rendering: gradients of the image w.r.t. scene parameters.

Beyond-reference capability (BASELINE.json north star): the whole wavefront
integrator is pure jnp, so `jax.grad` flows through shading, Phong, Fresnel,
refraction directions, and hit positions (via the min/gather of candidate ts
— implicit-function gradients of t come for free because each candidate t is
a closed-form differentiable function of ray and primitive parameters).

Discontinuities (hit/miss boundaries, shadow edges, pattern parity) are step
functions with zero/undefined gradient, as in any non-edge-sampling
differentiable ray tracer; gradients are exact a.e. and finite everywhere
(NaN-safe guards in the kernels).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..render import integrator
from ..scene.compile import Scene
from ..utils.config import DEFAULT_CONFIG, RenderConfig

# Scene fields exposed as trainable parameters: materials, light, patterns,
# and object transforms (via the inverse slabs — the natural device-side
# parameterization; keep prim_inv/prim_invT consistent by optimizing the
# inverse directly and deriving invT inside the step).
MATERIAL_PARAMS = (
    "mat_color", "mat_ambient", "mat_diffuse", "mat_specular",
    "mat_shininess", "mat_reflective", "mat_transparency", "mat_ior",
)
LIGHT_PARAMS = ("light_pos", "light_intensity")
PATTERN_PARAMS = ("pat_a", "pat_b")
TRANSFORM_PARAMS = ("prim_inv",)

DEFAULT_PARAMS = MATERIAL_PARAMS + LIGHT_PARAMS + PATTERN_PARAMS


def extract_params(scene: Scene, names=DEFAULT_PARAMS) -> Dict[str, jnp.ndarray]:
    return {n: getattr(scene, n) for n in names}


def inject_params(scene: Scene, params: Dict[str, jnp.ndarray]) -> Scene:
    repl = dict(params)
    if "prim_inv" in repl and scene.static.n_prims:
        # keep the normal-transform slab consistent with the optimized inverse
        repl["prim_invT"] = jnp.swapaxes(repl["prim_inv"][:, :, :3], -1, -2)
    return dataclasses.replace(scene, **repl)


def render_loss(params, scene: Scene, o, d, target, cfg: RenderConfig):
    """Mean-squared error between the rendered wavefront and a target."""
    img = integrator.color_at(inject_params(scene, params), o, d, cfg)
    return jnp.mean((img - target) ** 2)


@partial(jax.jit, static_argnames=("cfg",))
def loss_and_grad(params, scene: Scene, o, d, target, cfg: RenderConfig):
    return jax.value_and_grad(render_loss)(params, scene, o, d, target, cfg)


def make_train_step(tx, cfg: RenderConfig = DEFAULT_CONFIG):
    """SGD/Adam step over scene parameters with any optax transform."""

    @partial(jax.jit, static_argnames=())
    def train_step(params, opt_state, scene, o, d, target):
        loss, grads = jax.value_and_grad(render_loss)(params, scene, o, d, target, cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


# --- camera-pose differentiability ------------------------------------------
#
# Ray generation is traceable (render/camera.py: camera_rays), so the camera
# pose (from/to/up of the view transform, src/transformations.rs:80-93, and
# the field of view, src/camera.rs:16-41) is just another parameter pytree.

CAMERA_PARAMS = ("cam_from", "cam_to", "cam_up", "cam_fov")


def camera_params(frm, to, up, fov) -> Dict[str, jnp.ndarray]:
    """Pack a camera pose as a trainable parameter pytree."""
    f = lambda x: jnp.asarray(x, jnp.result_type(float))
    return {"cam_from": f(frm), "cam_to": f(to), "cam_up": f(up),
            "cam_fov": f(fov)}


def camera_pose_rays(cam: Dict[str, jnp.ndarray], hsize: int, vsize: int,
                     dtype=jnp.float32):
    """Differentiable primary-ray wavefront from pose parameters: traced
    view_transform -> (differentiable) matrix inverse -> camera_rays. Returns
    (o, d) of shape (H*V, 3)."""
    from ..ops import transforms as X
    from ..render.camera import camera_rays

    v = X.view_transform(cam["cam_from"], cam["cam_to"], cam["cam_up"])
    inv = jnp.linalg.inv(jnp.asarray(v, dtype))
    half_view = jnp.tan(jnp.asarray(cam["cam_fov"], dtype) / 2.0)
    aspect = hsize / vsize
    if aspect >= 1.0:
        half_width, half_height = half_view, half_view / aspect
    else:
        half_width, half_height = half_view * aspect, half_view
    pixel_size = half_width * 2.0 / hsize
    return camera_rays(inv, hsize, vsize, half_width, half_height,
                       pixel_size, dtype)


def camera_render_loss(cam: Dict[str, jnp.ndarray], scene: Scene, target,
                       cfg: RenderConfig, hsize: int, vsize: int):
    """MSE between the pose-parameterized render and a target image — the
    inverse-rendering objective for camera calibration."""
    o, d = camera_pose_rays(cam, hsize, vsize, cfg.jnp_dtype())
    img = integrator.color_at(scene, o, d, cfg)
    return jnp.mean((img - target.reshape(-1, 3)) ** 2)


def finite_diff_check(params, scene, o, d, target, cfg, name: str, index: Tuple,
                      eps: float = 1e-4):
    """Central finite difference of one parameter entry vs autodiff."""
    _, grads = loss_and_grad(params, scene, o, d, target, cfg)

    def loss_at(v):
        p = dict(params)
        p[name] = p[name].at[index].set(v)
        return float(render_loss(p, scene, o, d, target, cfg))

    v0 = float(params[name][index])
    fd = (loss_at(v0 + eps) - loss_at(v0 - eps)) / (2 * eps)
    return float(grads[name][index]), fd
