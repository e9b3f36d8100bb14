"""Regenerate the golden images (run from the repo root):

    python tests/golden/regen.py

Goldens are OUR f64 CPU renders (the Rust reference can't execute in this
image), frozen as regression anchors. Semantics are pinned independently by
the book-conformance suite (261 scalar tests); goldens pin end-to-end
behavior. Renders are ulp-sensitive at decision boundaries (shadow/hit
epsilons — knife-edge pixels can flip when XLA fusion changes), so goldens
may only be regenerated after an INTENTIONAL pipeline change with the full
conformance suite green; the diff vs the previous goldens must be reviewed
to be confined to isolated boundary pixels.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from rtc_tpu.models.scenes import REGISTRY
from rtc_tpu.render.renderer import render
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.utils.config import RenderConfig

SPECS = {
    "default_world": 24,
    "three_spheres": 32,
    "glass_spheres": 32,
    "table": 32,
    "hexagon": 32,
    "teapot": 24,
    "teapot_smooth": 24,
    "glass_teapot": (24, 8),  # depth 8: refraction chain reaches the floor
    # flagship bench/driver scenes: every scene the benchmarks run is pinned
    "cow": 32,
    "pumpkin": 24,
    "teddy": 24,
    "single_sphere": 24,
}

HERE = os.path.dirname(__file__)

# the reference's DEFAULT render width (src/main.rs:77): full-resolution
# anchors for EVERY registry scene (except the 523k-tri herd — hours on
# CPU), stored as <name>_w400.npy. The tiny goldens above mathematically
# cannot see sub-pixel-scale regressions (silhouettes, checker parity,
# refraction chains); these can. glass_teapot keeps its depth-8 budget.
def _spec_w(v):
    return (400, v[1]) if isinstance(v, tuple) else 400


FULLWIDTH_SPECS = {name: _spec_w(v) for name, v in SPECS.items()}


def _spec(v):
    """SPECS value: width or (width, max_depth)."""
    return v if isinstance(v, tuple) else (v, 5)


def _regen(name, width, depth, path):
    world, cam = REGISTRY[name](width)
    scene = compile_scene(world, dtype=np.float64)
    img = np.asarray(
        render(scene, cam,
               RenderConfig(dtype="float64", ray_tile=512, max_depth=depth)))
    old = np.load(path) if os.path.exists(path) else None
    np.save(path, img)
    if old is not None and old.shape == img.shape:
        d = np.abs(old - img).max(axis=2)
        print(f"{os.path.basename(path)}: {int((d > 1e-9).sum())} px changed, "
              f"max {d.max():.3e}")
    else:
        print(f"{os.path.basename(path)}: written")


import sys


def main():
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if "--fullwidth-only" not in sys.argv:
        for name in sorted(SPECS):
            if only and name not in only:
                continue
            width, depth = _spec(SPECS[name])
            _regen(name, width, depth, os.path.join(HERE, f"{name}.npy"))
    for name in sorted(FULLWIDTH_SPECS):
        if only and name not in only:
            continue
        width, depth = _spec(FULLWIDTH_SPECS[name])
        _regen(name, width, depth, os.path.join(HERE, f"{name}_w400.npy"))


if __name__ == "__main__":
    main()
