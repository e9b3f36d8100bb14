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

    world, cam = REGISTRY[scene_name](width)
    cfg = RenderConfig(dtype="float32", ray_tile=8192)
    scene = compile_scene(world, dtype=cfg.jnp_dtype())

    import jax.numpy as jnp

    def run():
        # reduce to a scalar on device; fetched once after the timing loop so
        # the remote-attached backend's ~27 ms host round-trip latency is not
        # charged per frame (device executes enqueued programs back-to-back)
        return jnp.sum(render(scene, cam, cfg))

    float(run())  # compile + warmup

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
