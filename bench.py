"""Benchmark: cow.obj at 1080p-class resolution on the available device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

The reference publishes no numbers ("Optimize! This is slow.",
reference README.md:23), so vs_baseline is measured against the driver's
north-star target of 100M rays/s (BASELINE.json): vs_baseline = value / 1e8.

Ray accounting: the wavefront integrator casts, per pixel, one closest-hit
sweep + one shadow sweep per live bounce-tree node (cow scene: reflective
material -> 2 nodes at budget 5 -> 4 sweeps/pixel).

--scene=NAME benches another registry scene (teapot_smooth, glass_teapot,
cow_herd, ...). The suite rows (smooth / refractive / 523k-tri streaming /
instanced-smooth) are benched BY DEFAULT and printed as JSON lines to
STDERR, keeping the cow line as the single stdout metric — so every
BASELINE.md row regenerates on each driver run. --no-suite skips them.
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
    # keep the BRUTE-FORCE reference's dense (R, T) sweep under ~1 GB for
    # huge scenes (the kernel side streams and would handle any R)
    n_tris = max(int(scene.static.n_tris), 1)
    R = min(10240, max(512, (250_000_000 // n_tris) // 512 * 512))
    step = max(1, o.shape[0] // R)
    o, d = o[::step][:R], d[::step][:R]

    t_k, i_k = integrator.mesh_closest(scene, o, d, cfg)
    cfg_bf = dataclasses.replace(cfg, mesh_impl="bruteforce")

    # jit + chunk the dense (R, T) reference so XLA fuses the per-triangle
    # intermediates (eager mode would materialize (R, T, 3) cross products —
    # gigabytes for the 523k-triangle herd)
    brute = jax.jit(lambda o, d: integrator.mesh_closest(scene, o, d, cfg_bf))
    chunk = max(128, (50_000_000 // max(int(scene.static.n_tris), 1)) // 128 * 128)
    parts = [brute(o[i:i + chunk], d[i:i + chunk])
             for i in range(0, R, chunk)]
    t_b = np.concatenate([np.asarray(p[0]) for p in parts])
    i_b = np.concatenate([np.asarray(p[1]) for p in parts])
    t_k, i_k = map(np.asarray, (t_k, i_k))
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
    occ_bf = jax.jit(lambda p, lv: integrator.is_shadowed(
        scene, p, cfg_bf, live=lv))
    live = jnp.asarray(hit_k)
    occ_b = np.concatenate([
        np.asarray(occ_bf(point[i:i + chunk], live[i:i + chunk]))
        for i in range(0, R, chunk)])
    nd = int((np.asarray(occ_k) != occ_b).sum())
    # silhouette knife-edges may still flip a whisker of rays
    assert nd <= max(2, R // 2048), f"occlusion parity: {nd} rays differ"
    print(f"kernel parity ok on {jax.devices()[0].device_kind}: "
          f"max |dt|={float(dt.max()) if dt.size else 0.0:.2e}, "
          f"occlusion diffs={nd}/{R}", file=sys.stderr)


SUITE_SCENES = ("teapot_smooth", "glass_teapot", "cow_herd",
                "cow_herd_smooth")

# measured per-scene shading-tile optima (see main())
DEFAULT_TILE = 262144
TILE_BY_SCENE = {"cow": 460800, "teapot_smooth": 460800,
                 "glass_teapot": 8192}


def bench_scene(scene_name: str, width: int, tile: int, parity: bool) -> dict:
    """Compile + time one scene; returns the metric dict."""
    import jax
    import jax.numpy as jnp

    from rtc_tpu.models.scenes import REGISTRY
    from rtc_tpu.render.renderer import render
    from rtc_tpu.scene.compile import compile_scene
    from rtc_tpu.utils.config import RenderConfig
    from rtc_tpu.utils.profiling import rays_per_pixel

    world, cam = REGISTRY[scene_name](width)
    cfg = RenderConfig(dtype="float32", ray_tile=tile)
    scene = compile_scene(world, dtype=cfg.jnp_dtype())

    def run():
        return jnp.sum(render(scene, cam, cfg))

    float(run())
    if parity:
        check_kernel_parity(scene, cam, cfg)
    iters = 5
    t0 = time.perf_counter()
    acc = [run() for _ in range(iters)]
    float(acc[-1])
    wall = (time.perf_counter() - t0) / iters
    n_pix = cam.hsize * cam.vsize
    casts = n_pix * rays_per_pixel(
        cfg.max_depth, scene.static.any_reflective, scene.static.any_refractive)
    rays_per_s = casts / wall
    return {
        "metric": f"rays/s ({scene_name} {cam.hsize}x{cam.vsize}, depth 5, "
                  f"f32, {jax.devices()[0].device_kind})",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / 1e8, 4),
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    width = int(args[0]) if args else 1920
    scene_name = "cow"
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene_name = a.split("=", 1)[1]

    from rtc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    # Measured per-scene shading-tile optima (v5 lite, 1080p; round-5 tile
    # sweep in BASELINE.md). Since the SoA shading stage, LARGE tiles win on
    # opaque scenes (8192 -> 262144 lifted cow 144 -> 150M, 460800 -> 152.7M;
    # the old 8192 optimum predated it) — EXCEPT refractive integrators,
    # whose per-ray census state blows the working set (glass_teapot 44.1M
    # at 8192 vs 35.3M at 262144).
    tile = None
    for a in sys.argv[1:]:
        if a.startswith("--tile="):
            tile = int(a.split("=", 1)[1])
    parity = "--no-parity" not in sys.argv

    def tile_for(name):
        if tile is not None:
            return tile
        return TILE_BY_SCENE.get(name, DEFAULT_TILE)

    row = bench_scene(scene_name, width, tile_for(scene_name), parity)
    if "--no-suite" not in sys.argv:
        for extra in SUITE_SCENES:
            if extra != scene_name:
                print(json.dumps(
                    bench_scene(extra, width, tile_for(extra), False)),
                    file=sys.stderr, flush=True)
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
