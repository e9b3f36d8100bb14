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


if __name__ == "__main__":
    if "--gathers" in sys.argv:
        sys.exit(gather_probe() or 0)
    sys.exit(main())
