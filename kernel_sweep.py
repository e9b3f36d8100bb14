"""Sweep the MXU kernel's structural parameters on the cow wavefront.

leaf (cluster size, baked at scene compile) x ray_tile (kernel tile), timed
for the coherent primary wavefront and the incoherent reflected wavefront
(exact schedule). Each new (leaf, rt) pair is a fresh Mosaic compile on the
remote backend (~minutes first time; cached afterwards in .jax_cache).

Usage: python kernel_sweep.py [width] [--leafs=64,128] [--rts=256,512]
"""

import json
import sys
import time


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    width = int(args[0]) if args else 1920
    leafs = (64, 128, 256)
    rts = (128, 256, 512)
    for a in sys.argv[1:]:
        if a.startswith("--leafs="):
            leafs = tuple(int(x) for x in a.split("=", 1)[1].split(","))
        if a.startswith("--rts="):
            rts = tuple(int(x) for x in a.split("=", 1)[1].split(","))

    from rtc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from rtc_tpu.models.scenes import REGISTRY
    from rtc_tpu.ops.pallas.mesh_intersect import (
        mesh_any_hit_mxu, mesh_closest_hit_mxu)
    from rtc_tpu.render.renderer import _device_morton_perm
    from rtc_tpu.render.camera import camera_rays_for_pixels
    from rtc_tpu.scene.compile import compile_scene
    from rtc_tpu.ops.vec import reflect

    world, cam = REGISTRY["cow"](width)
    dtype = jnp.float32
    _, _, px, py = _device_morton_perm(cam.vsize, cam.hsize)
    o, d = camera_rays_for_pixels(
        jnp.asarray(cam.transform_inverse, dtype), px, py,
        jnp.asarray(cam.half_width, dtype), jnp.asarray(cam.half_height, dtype),
        jnp.asarray(cam.pixel_size, dtype), dtype)
    o = jax.device_put(o)
    d = jax.device_put(d)
    R = o.shape[0]

    def timeit(fn, iters=3):
        float(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(out)
        return (time.perf_counter() - t0) / iters

    for leaf in leafs:
        scene = compile_scene(world, dtype=dtype, cluster_size=leaf)
        st = scene.static

        # reflected wavefront for this scene build
        @jax.jit
        def mk_refl(o, d):
            t, i = mesh_closest_hit_mxu(
                o, d, scene.tri_p1, scene.tri_e1, scene.tri_e2,
                scene.cluster_aabb, scene.super_aabb,
                n_super=st.n_super, leaf=leaf, ray_tile=256)
            valid = i >= 0
            t_safe = jnp.where(valid, t, 1.0)
            p = o + d * t_safe[:, None]
            n = scene.tri_n[jnp.where(valid, i, 0)]
            far = jnp.asarray(1e12, o.dtype)
            o2 = jnp.where(valid[:, None], p + n * 1e-4, far)
            d2 = jnp.where(valid[:, None], reflect(d, n), 0.5773502692)
            return o2, d2

        o2, d2 = mk_refl(o, d)
        float(jnp.sum(o2))

        for rt in rts:
            def prim():
                t, i = mesh_closest_hit_mxu(
                    o, d, scene.tri_p1, scene.tri_e1, scene.tri_e2,
                    scene.cluster_aabb, scene.super_aabb,
                    n_super=st.n_super, leaf=leaf, ray_tile=rt)
                return jnp.sum(t * 0 + i)

            def refl():
                t, i = mesh_closest_hit_mxu(
                    o2, d2, scene.tri_p1, scene.tri_e1, scene.tri_e2,
                    scene.cluster_aabb, scene.super_aabb,
                    n_super=st.n_super, leaf=leaf, ray_tile=rt)
                return jnp.sum(t * 0 + i)

            tp = timeit(prim)
            tr = timeit(refl)
            print(json.dumps({
                "leaf": leaf, "rt": rt, "n_clusters": st.n_clusters,
                "prim_ms": round(tp * 1e3, 1),
                "prim_mrays": round(R / tp / 1e6, 1),
                "refl_ms": round(tr * 1e3, 1),
                "refl_mrays": round(R / tr / 1e6, 1),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
