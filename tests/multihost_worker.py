"""Multi-process worker for tests/test_multihost.py.

Usage: python multihost_worker.py <process_id> <num_processes> <port>

Each process gets 2 virtual CPU devices, joins the localhost coordinator,
renders three_spheres through parallel.multihost.render_multihost, and runs
one cross-host gradient-psum train step. Process 0 compares the assembled
image and the psum-reduced gradients against single-process references
computed locally (every process holds the full scene), printing
MULTIHOST_OK on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
    process_id=pid)

import numpy as np
import jax.numpy as jnp

from rtc_tpu.diff import render_grad as RG
from rtc_tpu.models.scenes import REGISTRY
from rtc_tpu.parallel import multihost
from rtc_tpu.render import integrator
from rtc_tpu.render.camera import camera_rays
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.utils.config import RenderConfig


def main() -> int:
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    world, cam = REGISTRY["three_spheres"](16)
    scene = compile_scene(world, dtype=jnp.float32)
    cfg = RenderConfig(dtype="float32", ray_tile=64)

    img = multihost.render_multihost(scene, cam, cfg)
    loss, grads = multihost.train_step_multihost(scene, cam, cfg)
    assert np.isfinite(loss), loss

    if jax.process_index() != 0:
        assert img is None
        print(f"proc {pid}: ok (loss={loss:.6f})")
        return 0

    # --- process-0 verification against single-process references ----------
    # reference image: plain local wavefront shading on this host's device
    dtype = jnp.float32
    o, d = camera_rays(
        jnp.asarray(cam.transform_inverse, dtype), cam.hsize, cam.vsize,
        jnp.asarray(cam.half_width, dtype), jnp.asarray(cam.half_height, dtype),
        jnp.asarray(cam.pixel_size, dtype), dtype)
    ref = np.asarray(integrator.color_at(scene, o, d, cfg)).reshape(
        cam.vsize, cam.hsize, 3)
    img_err = float(np.max(np.abs(np.asarray(img) - ref)))
    assert img_err < 1e-5, f"multihost image err {img_err:.2e}"

    # reference grads: unsharded global loss
    params = RG.extract_params(scene)
    target = jnp.full_like(o, 0.5)
    n_total = o.shape[0] * 3

    def loss_ref(p):
        sp = RG.inject_params(scene, p)
        im = integrator.color_at(sp, o, d, cfg)
        return jnp.sum((im - target) ** 2) / n_total

    gref = jax.grad(loss_ref)(params)
    gerr = 0.0
    for k in grads:
        denom = float(jnp.max(jnp.abs(gref[k]))) or 1.0
        gerr = max(gerr, float(np.max(np.abs(grads[k] - np.asarray(gref[k])))) / denom)
    assert gerr < 1e-4, f"multihost grads err {gerr:.2e}"

    print(f"MULTIHOST_OK procs={nproc} img_err={img_err:.2e} "
          f"grad_err={gerr:.2e} loss={loss:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
