"""Benchmark: cow.obj at 1080p-class resolution on the available device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

The reference publishes no numbers ("Optimize! This is slow.",
reference README.md:23), so vs_baseline is measured against the driver's
north-star target of 100M rays/s (BASELINE.json): vs_baseline = value / 1e8.

Ray accounting: the wavefront integrator casts, per pixel, one closest-hit
sweep + one shadow sweep per live bounce-tree node (cow scene: reflective
material -> 2 nodes at budget 5 -> 4 sweeps/pixel).
"""

import json
import sys
import time


def check_kernel_parity(scene, cam, cfg) -> None:
    """On-device kernel correctness gate: the production (MXU/Pallas,
    non-interpret) closest-hit and any-hit results must equal the pure-jnp
    brute-force sweep ON THE REAL CHIP for a 10k-ray cow wavefront. The test
    suite pins kernels in interpret mode on CPU; this catches Mosaic lowering
    bugs that would otherwise ship silently. Crashes the bench on mismatch."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtc_tpu.render import integrator
    from rtc_tpu.render.camera import camera_rays

    if integrator._resolve_mesh_impl(scene, cfg, cfg.jnp_dtype()) not in \
            integrator._KERNEL_IMPLS:
        print("kernel parity: skipped (brute-force impl active)",
              file=sys.stderr)
        return

    dtype = cfg.jnp_dtype()
    o, d = camera_rays(
        jnp.asarray(cam.transform_inverse, dtype), cam.hsize, cam.vsize,
        jnp.asarray(cam.half_width, dtype), jnp.asarray(cam.half_height, dtype),
        jnp.asarray(cam.pixel_size, dtype), dtype)
    R = 10240
    step = max(1, o.shape[0] // R)
    o, d = o[::step][:R], d[::step][:R]

    t_k, i_k = integrator.mesh_closest(scene, o, d, cfg)
    cfg_bf = dataclasses.replace(cfg, mesh_impl="bruteforce")
    t_b, i_b = integrator.mesh_closest(scene, o, d, cfg_bf)
    t_k, i_k, t_b, i_b = map(np.asarray, (t_k, i_k, t_b, i_b))
    from rtc_tpu.utils.constants import BIG

    hit_k, hit_b = t_k < BIG * 0.5, t_b < BIG * 0.5
    assert (hit_k == hit_b).all(), (
        f"kernel/bruteforce hit masks differ on {(hit_k != hit_b).sum()} rays")
    dt = np.abs(t_k - t_b)[hit_k]
    assert (dt <= 1e-3).all(), f"closest-hit t diverges: max {dt.max()}"
    # indices must match except at genuine ties (equal t to tolerance)
    idx_mismatch = hit_k & (i_k != i_b)
    assert (np.abs(t_k - t_b)[idx_mismatch] <= 1e-3).all(), (
        "kernel picked a non-closest triangle")

    # any-hit occlusion parity from free-space points (mid-way to each hit:
    # ON-surface origins would make every ray a self-intersection knife edge
    # where kernel-vs-brute MT roundoff legitimately disagrees at t ~ 0)
    t_safe = jnp.asarray(np.where(hit_k, t_k * 0.5, 1.0), dtype)
    point = o + d * t_safe[:, None]
    occ_k = integrator.is_shadowed(scene, point, cfg,
                                   live=jnp.asarray(hit_k))
    occ_b = integrator.is_shadowed(scene, point, cfg_bf,
                                   live=jnp.asarray(hit_k))
    nd = int((np.asarray(occ_k) != np.asarray(occ_b)).sum())
    # silhouette knife-edges may still flip a whisker of rays
    assert nd <= max(2, R // 2048), f"occlusion parity: {nd} rays differ"
    print(f"kernel parity ok on {jax.devices()[0].device_kind}: "
          f"max |dt|={float(dt.max()) if dt.size else 0.0:.2e}, "
          f"occlusion diffs={nd}/{R}", file=sys.stderr)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    width = int(args[0]) if args else 1920
    scene_name = "cow"
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene_name = a.split("=", 1)[1]

    import jax

    from rtc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from rtc_tpu.models.scenes import REGISTRY
    from rtc_tpu.render.renderer import render
    from rtc_tpu.scene.compile import compile_scene
    from rtc_tpu.utils.config import RenderConfig
    from rtc_tpu.utils.profiling import rays_per_pixel

    import jax.numpy as jnp

    from rtc_tpu.render import integrator

    world, cam = REGISTRY[scene_name](width)

    # ray-tile 8192 measures fastest on the v5 lite chip: big tiles lose
    # more to shading-stage HBM residency than they save in lax.map steps
    # (measured 33.0M rays/s at 8192 vs 24.8M at 614400, cow 1080p)
    tile = 8192
    for a in sys.argv[1:]:
        if a.startswith("--tile="):
            tile = int(a.split("=", 1)[1])

    cfg = RenderConfig(dtype="float32", ray_tile=tile)
    scene = compile_scene(world, dtype=cfg.jnp_dtype())

    import jax.numpy as jnp

    def run():
        # reduce to a scalar on device; fetched once after the timing loop so
        # the remote-attached backend's ~27 ms host round-trip latency is not
        # charged per frame (device executes enqueued programs back-to-back)
        return jnp.sum(render(scene, cam, cfg))

    float(run())  # compile + warmup
    if "--no-parity" not in sys.argv:
        check_kernel_parity(scene, cam, cfg)

    iters = 5
    t0 = time.perf_counter()
    acc = [run() for _ in range(iters)]
    float(acc[-1])  # one synchronizing fetch; forces the whole queue
    wall = (time.perf_counter() - t0) / iters

    n_pix = cam.hsize * cam.vsize
    casts = n_pix * rays_per_pixel(
        cfg.max_depth, scene.static.any_reflective, scene.static.any_refractive)
    rays_per_s = casts / wall

    print(json.dumps({
        "metric": f"rays/s ({scene_name} {cam.hsize}x{cam.vsize}, depth 5, f32, "
                  f"{jax.devices()[0].device_kind})",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / 1e8, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
