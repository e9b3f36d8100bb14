"""Golden-image regression tests.

The Rust reference can't be executed here (no Rust toolchain in the image),
so these goldens are OUR f64 renders, frozen after the conformance suite
(231 book tests) validated the semantics. They pin end-to-end behavior across
refactors: any change to intersection, shading, patterns, shadows,
reflection/refraction, or mesh handling shows up as a pixel diff.
"""

import os

import numpy as np
import pytest

from rtc_tpu.models.scenes import REGISTRY
from rtc_tpu.render.renderer import render
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.utils.config import RenderConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

SPECS = {
    "default_world": 24,
    "three_spheres": 32,
    "glass_spheres": 32,
    "table": 32,
    "hexagon": 32,
    "teapot": 24,
    "teapot_smooth": 24,
}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_golden(name):
    path = os.path.join(GOLDEN, f"{name}.npy")
    golden = np.load(path)
    world, cam = REGISTRY[name](SPECS[name])
    scene = compile_scene(world, dtype=np.float64)
    img = np.asarray(render(scene, cam, RenderConfig(dtype="float64", ray_tile=512)))
    np.testing.assert_allclose(img, golden, atol=1e-9, rtol=0)
