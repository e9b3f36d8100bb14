"""Whole-integrator cross-validation: production color_at vs the independent
NumPy transliteration of the reference integrator (tests/oracle.py).

For every registry scene, ~100 random camera rays are shaded by BOTH
implementations in float64 and compared allclose. This is the only
whole-render check that does not share code (or goldens) with production:
the golden images are self-goldens (tests/test_golden.py:3-8), so a
systematic error in a shared assumption would be invisible there — not here.

Rays are drawn from random pixels of each scene's own camera (hit-heavy,
realistic incidence angles). Knife-edge rays (shadow-epsilon boundaries,
silhouettes) could legitimately disagree between two f64 implementations
evaluating in different operation orders; with the fixed seed below none do.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import oracle as O
from rtc_tpu.models.scenes import REGISTRY
from rtc_tpu.render import integrator
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.utils.config import RenderConfig

# (n_rays, max_depth); glass_teapot at depth 8 exercises the deepest
# refraction chains (VERDICT r3 item 3); the 523k-tri herd gets fewer rays
# (oracle sweeps are O(T) per ray) but the same full-depth semantics
SPECS = {
    "default_world": (100, 5),
    "three_spheres": (100, 5),
    "glass_spheres": (100, 5),
    "table": (100, 5),
    "hexagon": (100, 5),
    "teapot": (100, 5),
    "teapot_smooth": (100, 5),
    "glass_teapot": (100, 8),
    "cow": (100, 5),
    "pumpkin": (100, 5),
    "teddy": (100, 5),
    "single_sphere": (100, 5),
    "cow_herd": (12, 5),
    "cow_herd_smooth": (12, 5),   # instanced + smooth (TLAS sn path's scene)
}

WIDTH = 64


def _rays(cam, n, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, cam.hsize, size=n)
    py = rng.integers(0, cam.vsize, size=n)
    os, ds = [], []
    for x, y in zip(px, py):
        o, d = O.camera_ray(cam, int(x), int(y))
        os.append(o)
        ds.append(d)
    return np.array(os), np.array(ds)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_production_matches_reference_oracle(name):
    n, depth = SPECS[name]
    world, cam = REGISTRY[name](WIDTH)
    o, d = _rays(cam, n, seed=1234)

    ora = O.Oracle(world, max_depth=depth)
    expected = np.array([ora.color_at(o[i], d[i]) for i in range(n)])

    scene = compile_scene(world, dtype=np.float64)
    cfg = RenderConfig(dtype="float64", mesh_impl="bruteforce", max_depth=depth)
    got = np.asarray(integrator.color_at(
        scene, jnp.asarray(o, jnp.float64), jnp.asarray(d, jnp.float64), cfg))

    np.testing.assert_allclose(got, expected, atol=1e-9, rtol=0)
