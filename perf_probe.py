"""Component timing for the cow bench (run on TPU; also works on CPU, slow).

Measures, per stage, where the end-to-end frame time goes so optimization
targets the real bottleneck:

  full        the production render (bench.py's run)
  depth1      primary node only (closest + shadow; no secondary sweeps)
  noshadow    full depth, shadows off (closest sweeps only)
  closest     one closest-hit kernel sweep over the primary wavefront
  anyhit      one occlusion sweep over the primary hits' shadow rays
  refl_closest one closest-hit sweep over the REFLECTED wavefront
               (incoherent directions — tests the in-kernel schedule's cull)

Usage: python perf_probe.py [width] [--scene=cow]
"""

import dataclasses
import json
import sys
import time


def timeit(fn, iters=3):
    float(fn())  # compile + warm, FORCED (block_until_ready is a no-op on axon)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    # force the queue once at the end (device executes back-to-back)
    float(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    width = int(args[0]) if args else 1920
    scene_name = "cow"
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene_name = a.split("=", 1)[1]

    from rtc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from rtc_tpu.models.scenes import REGISTRY
    from rtc_tpu.render import integrator
    from rtc_tpu.render.renderer import render, _device_morton_perm
    from rtc_tpu.render.camera import camera_rays
    from rtc_tpu.scene.compile import compile_scene
    from rtc_tpu.utils.config import RenderConfig
    from rtc_tpu.ops.vec import dot, normalize, reflect

    world, cam = REGISTRY[scene_name](width)
    cfg = RenderConfig(dtype="float32", ray_tile=8192)
    scene = compile_scene(world, dtype=cfg.jnp_dtype())
    dtype = cfg.jnp_dtype()

    o, d = camera_rays(
        jnp.asarray(cam.transform_inverse, dtype), cam.hsize, cam.vsize,
        jnp.asarray(cam.half_width, dtype), jnp.asarray(cam.half_height, dtype),
        jnp.asarray(cam.pixel_size, dtype), dtype)
    perm = _device_morton_perm(cam.vsize, cam.hsize)[0]
    o, d = o[perm], d[perm]
    o = jax.device_put(o)
    d = jax.device_put(d)
    R = o.shape[0]
    res = {}

    res["full"] = timeit(lambda: jnp.sum(render(scene, cam, cfg)))

    cfg_d1 = dataclasses.replace(cfg, max_depth=1)
    res["depth1"] = timeit(lambda: jnp.sum(render(scene, cam, cfg_d1)))

    cfg_ns = dataclasses.replace(cfg, shadows=False)
    res["noshadow"] = timeit(lambda: jnp.sum(render(scene, cam, cfg_ns)))

    # raw kernel sweeps (jit-wrapped; mesh_closest dispatches the MXU kernel)
    @jax.jit
    def closest(o, d):
        t, i = integrator.mesh_closest(scene, o, d, cfg)
        return jnp.sum(t * 0 + i)

    res["closest"] = timeit(lambda: closest(o, d))

    # hit points + shadow rays of the primary wavefront
    @jax.jit
    def prim_hits(o, d):
        t, i = integrator.mesh_closest(scene, o, d, cfg)
        valid = t < 1e29
        t_safe = jnp.where(valid, t, 1.0)
        p = o + d * t_safe[:, None]
        n = scene.tri_n[i]
        far = jnp.asarray(1e12, o.dtype)
        over = jnp.where(valid[:, None], p + n * cfg.epsilon, far)
        rdir = jnp.where(valid[:, None], reflect(d, n), 0.5773502692)
        return over, rdir, valid

    over, rdir, valid = jax.block_until_ready(prim_hits(o, d))

    @jax.jit
    def anyhit(pt, live):
        return jnp.sum(integrator.is_shadowed(scene, pt, cfg, live=live))

    res["anyhit"] = timeit(lambda: anyhit(over, valid))

    @jax.jit
    def refl_closest(po, pd):
        t, i = integrator.mesh_closest(scene, po, pd, cfg)
        return jnp.sum(t * 0 + i)

    res["refl_closest"] = timeit(lambda: refl_closest(over, rdir))

    # shading-stage isolation: color_at directly (no lax.map, whole
    # wavefront), the tiled _shade_rays, and depth-1 variants
    from rtc_tpu.render import renderer as RR

    cfg_d1 = dataclasses.replace(cfg, max_depth=1)

    @jax.jit
    def colorat_full(o, d):
        return jnp.sum(integrator.color_at(scene, o, d, cfg))

    res["colorat_full"] = timeit(lambda: colorat_full(o, d))

    @jax.jit
    def colorat_d1(o, d):
        return jnp.sum(integrator.color_at(scene, o, d, cfg_d1))

    res["colorat_d1_full"] = timeit(lambda: colorat_d1(o, d))

    res["shade_8192"] = timeit(
        lambda: jnp.sum(RR._shade_rays(scene, o, d, cfg)))
    res["shade_8192_d1"] = timeit(
        lambda: jnp.sum(RR._shade_rays(scene, o, d, cfg_d1)))

    # (the traversal schedule is computed in-kernel now; there is no
    # XLA-side schedule pass left to time)
    n_pix = cam.hsize * cam.vsize
    print(json.dumps({k: round(v, 4) for k, v in res.items()}))
    print(json.dumps({
        "primary_rays_per_s_closest": round(R / res["closest"]),
        "anyhit_rays_per_s": round(R / res["anyhit"]),
        "refl_rays_per_s": round(R / res["refl_closest"]),
        "full_frame_ms": round(res["full"] * 1e3, 1),
        "colorat_d1_ms": round(res["colorat_d1_full"]*1e3,1),
        "pixels": n_pix,
    }))
    return 0





def gather_probe(width=1920):
    """Isolate TPU gather costs: the shading path's per-ray payload gathers
    (tri_n[idx], tri_obj[idx], unpermute) are random-access and may dominate
    the non-kernel frame time."""
    import time

    from rtc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtc_tpu.models.scenes import REGISTRY
    from rtc_tpu.scene.compile import compile_scene

    world, cam = REGISTRY["cow"](width)
    scene = compile_scene(world, dtype=jnp.float32)
    R = cam.hsize * cam.vsize
    T = scene.tri_n.shape[0]
    rng = np.random.default_rng(0)
    idx = jax.device_put(jnp.asarray(rng.integers(0, T, size=R), jnp.int32))
    perm = jax.device_put(jnp.asarray(rng.permutation(R), jnp.int32))
    colors = jax.device_put(jnp.ones((R, 3), jnp.float32))

    def timeit(fn, iters=5):
        float(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(out)
        return (time.perf_counter() - t0) / iters

    f_tri = jax.jit(lambda i: jnp.sum(scene.tri_n[i]))
    f_obj = jax.jit(lambda i: jnp.sum(scene.tri_obj[i]))
    f_unp = jax.jit(lambda p: jnp.sum(colors[p]))
    g_tri = timeit(lambda: f_tri(idx))
    g_obj = timeit(lambda: f_obj(idx))
    g_unperm = timeit(lambda: f_unp(perm))
    # one-hot matmul alternative for the small-table gather
    import json
    print(json.dumps({
        "gather_tri_n_ms": round(g_tri * 1e3, 2),
        "gather_tri_obj_ms": round(g_obj * 1e3, 2),
        "gather_unpermute_ms": round(g_unperm * 1e3, 2),
        "R": R, "T": T,
    }))


def visit_sim(width=1920, scene_name="cow"):
    """EXACT host-side simulation of the MXU kernel's in-kernel traversal
    schedule (mesh_intersect._kernel_mxu_body): per 512-ray Morton tile,
    per-cluster conservative entry ts, per-ray exit-bound seeding, and the
    front-to-back selection-sort visit loop with the ordered early exit.
    Counts how many cluster VISITS (MXU pair-test matmuls) each sweep
    actually performs — the number that turns measured sweep times into MXU
    utilization for the roofline (BASELINE.md)."""
    from rtc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtc_tpu.models.scenes import REGISTRY
    from rtc_tpu.ops.pallas.mesh_intersect import (
        _ray_features, _tri_features)
    from rtc_tpu.ops.vec import reflect
    from rtc_tpu.render.camera import camera_rays_for_pixels
    from rtc_tpu.render.renderer import _device_morton_perm
    from rtc_tpu.scene.compile import compile_scene

    world, cam = REGISTRY[scene_name](width)
    scene = compile_scene(world, dtype=jnp.float32)
    leaf = scene.static.cluster_size
    C = scene.static.n_clusters
    _, _, px, py = _device_morton_perm(cam.vsize, cam.hsize)
    dtype = jnp.float32
    o, d = camera_rays_for_pixels(
        jnp.asarray(cam.transform_inverse, dtype), px, py,
        jnp.asarray(cam.half_width, dtype), jnp.asarray(cam.half_height, dtype),
        jnp.asarray(cam.pixel_size, dtype), dtype)
    feat = _tri_features(scene.tri_p1, scene.tri_e1, scene.tri_e2, leaf)
    aabb = np.asarray(scene.cluster_aabb)           # (C, 6) lo|hi
    BIGF = np.float32(1e30)

    rt = 512
    R = o.shape[0]
    pad = (-R) % rt
    o = jnp.pad(o, ((0, pad), (0, 0)))
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=0.57735)

    @jax.jit
    def tile_tables(o_t, d_t):
        """Per tile: (entry (C,), seed (rt,), tmin (rt, C))."""
        rayf = _ray_features(o_t, d_t)              # (rt, 10)
        lo = jnp.asarray(aabb[:, :3].T)             # (3, C)
        hi = jnp.asarray(aabb[:, 3:].T)
        empty = jnp.any(lo > hi, axis=0)            # (C,)
        tmin = None
        tmax = None
        for ax in range(3):
            dax = rayf[:, ax:ax + 1]
            oax = rayf[:, 6 + ax:7 + ax]
            near0 = jnp.abs(dax) < 1e-30
            inv = jnp.where(near0, jnp.where(dax >= 0, BIGF, -BIGF),
                            1.0 / jnp.where(near0, 1.0, dax))
            t1 = (lo[ax][None, :] - oax) * inv
            t2 = (hi[ax][None, :] - oax) * inv
            lo_t = jnp.minimum(t1, t2)
            hi_t = jnp.maximum(t1, t2)
            tmin = lo_t if tmin is None else jnp.maximum(tmin, lo_t)
            tmax = hi_t if tmax is None else jnp.minimum(tmax, hi_t)
        ov = (tmax >= tmin) & ~empty[None, :] & (tmax >= 0.0)
        entry_r = jnp.where(ov, jnp.maximum(tmin, 0.0), BIGF)
        entry = jnp.min(entry_r, axis=0)            # (C,)
        exit_r = jnp.max(jnp.where(ov, tmax, -BIGF), axis=1)
        seed = jnp.minimum(exit_r * 1.00001 + 1e-4, BIGF)
        # full Moller-Trumbore tmin per (ray, cluster) — same features as
        # the kernel's pair-test matmul
        w = rayf @ feat                              # (rt, 4T)
        T4 = feat.shape[1]
        w = w.reshape(rt, C, 4, leaf)
        det, sh, dq, eq = w[:, :, 0], w[:, :, 1], w[:, :, 2], w[:, :, 3]
        det_ok = jnp.abs(det) >= 1e-7
        f = 1.0 / jnp.where(det_ok, det, 1.0)
        u, v, t = f * sh, f * dq, f * eq
        ok = (det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t >= 0.0))
        tmin_rc = jnp.min(jnp.where(ok, t, BIGF), axis=2)   # (rt, C)
        return entry, seed, tmin_rc

    batched_tables = jax.jit(jax.vmap(tile_tables))

    def sweep_stats(o_all, d_all, label):
        n_tiles = o_all.shape[0] // rt
        ent = np.zeros((n_tiles, C), np.float32)
        sd = np.zeros((n_tiles, rt), np.float32)
        tm = np.zeros((n_tiles, rt, C), np.float32)
        ob = o_all[:n_tiles * rt].reshape(n_tiles, rt, 3)
        db = d_all[:n_tiles * rt].reshape(n_tiles, rt, 3)
        chunk = 128
        for i in range(0, n_tiles, chunk):
            e, s, m = jax.device_get(
                batched_tables(ob[i:i + chunk], db[i:i + chunk]))
            ent[i:i + chunk], sd[i:i + chunk], tm[i:i + chunk] = e, s, m
        overlapped = (ent < BIGF * 0.5).sum(axis=1)          # (tiles,)
        # lockstep selection-sort loop across all tiles
        work = ent.copy()
        t_best = np.minimum(sd, BIGF)
        visits = np.zeros(n_tiles, np.int64)
        alive = np.ones(n_tiles, bool)
        for _ in range(C):
            m = work.min(axis=1)
            t_max = t_best.max(axis=1)
            alive = alive & (m < BIGF * 0.5) & (t_max > m)
            if not alive.any():
                break
            c = work.argmin(axis=1)
            rows = np.arange(n_tiles)
            tc = tm[rows, :, c]                             # (tiles, rt)
            t_best = np.where(alive[:, None], np.minimum(t_best, tc), t_best)
            work[rows, c] = np.where(alive, BIGF, work[rows, c])
            visits += alive
        mxu_flops_visit = rt * 10 * 4 * leaf * 2
        stats = {
            "sweep": label, "tiles": int(n_tiles), "clusters": int(C),
            "leaf": int(leaf),
            "visits_total": int(visits.sum()),
            "visits_per_tile_mean": round(float(visits.mean()), 2),
            "visits_per_tile_p95": int(np.percentile(visits, 95)),
            "overlap_per_tile_mean": round(float(overlapped.mean()), 2),
            "early_exit_saving": round(
                1.0 - visits.sum() / max(overlapped.sum(), 1), 3),
            "mxu_gflop_per_sweep": round(
                visits.sum() * mxu_flops_visit / 1e9, 2),
        }
        print(json.dumps(stats), flush=True)
        return stats

    sweep_stats(o, d, "primary_closest")

    # reflected wavefront (same construction as perf_probe main)
    @jax.jit
    def mk_refl(o, d):
        from rtc_tpu.render import integrator
        from rtc_tpu.utils.config import RenderConfig
        cfg = RenderConfig(dtype="float32", ray_tile=8192)
        t, i = integrator.mesh_closest(scene, o, d, cfg)
        valid = t < 1e29
        t_safe = jnp.where(valid, t, 1.0)
        p = o + d * t_safe[:, None]
        n = scene.tri_n[jnp.where(valid, i, 0)]
        far = jnp.asarray(1e12, o.dtype)
        o2 = jnp.where(valid[:, None], p + n * 1e-4, far)
        d2 = jnp.where(valid[:, None], reflect(d, n), 0.57735)
        return o2, d2

    o2, d2 = jax.device_get(mk_refl(o, d))
    sweep_stats(jnp.asarray(o2), jnp.asarray(d2), "reflected_closest")
    return 0


def kernel_micro(width=1920):
    """Decompose the closest-sweep cost: all-sky wavefront (every tile
    union-gates off -> pure grid/DMA/gate floor), half/quarter wavefronts
    (per-ray scaling), and the real primary wavefront."""
    from rtc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import json

    import jax
    import jax.numpy as jnp

    from rtc_tpu.models.scenes import REGISTRY
    from rtc_tpu.render import integrator
    from rtc_tpu.render.camera import camera_rays_for_pixels
    from rtc_tpu.render.renderer import _device_morton_perm
    from rtc_tpu.scene.compile import compile_scene
    from rtc_tpu.utils.config import RenderConfig

    world, cam = REGISTRY["cow"](width)
    cfg = RenderConfig(dtype="float32", ray_tile=8192)
    scene = compile_scene(world, dtype=jnp.float32)
    dt = jnp.float32
    _, _, px, py = _device_morton_perm(cam.vsize, cam.hsize)
    o, d = camera_rays_for_pixels(
        jnp.asarray(cam.transform_inverse, dt), px, py,
        jnp.asarray(cam.half_width, dt), jnp.asarray(cam.half_height, dt),
        jnp.asarray(cam.pixel_size, dt), dt)
    o = jax.device_put(o)
    d = jax.device_put(d)
    R = o.shape[0]

    @jax.jit
    def closest(o, d):
        t, i = integrator.mesh_closest(scene, o, d, cfg)
        return jnp.sum(t * 0 + i)

    res = {"R": R}
    res["real_ms"] = round(timeit(lambda: closest(o, d)) * 1e3, 2)
    # sky: origin far above, direction +y — zero union-box overlap
    o_sky = jnp.zeros_like(o) + jnp.asarray([0.0, 100.0, 0.0], dt)
    d_sky = jnp.zeros_like(d) + jnp.asarray([0.0, 1.0, 0.0], dt)
    res["sky_ms"] = round(timeit(lambda: closest(o_sky, d_sky)) * 1e3, 2)
    for frac in (2, 4):
        res[f"real_R/{frac}_ms"] = round(
            timeit(lambda: closest(o[::frac], d[::frac])) * 1e3, 2)
        res[f"sky_R/{frac}_ms"] = round(
            timeit(lambda: closest(o_sky[::frac], d_sky[::frac])) * 1e3, 2)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    if "--gathers" in sys.argv:
        sys.exit(gather_probe() or 0)
    if "--visits" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        w = int(args[0]) if args else 1920
        sys.exit(visit_sim(w) or 0)
    if "--kernel-micro" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        w = int(args[0]) if args else 1920
        sys.exit(kernel_micro(w) or 0)
    sys.exit(main())
