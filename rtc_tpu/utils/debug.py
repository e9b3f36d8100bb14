"""Debugging & validation utilities (SURVEY.md §5).

The reference's only "sanitizer" is Rust's borrow checker plus panics on
invariant violations (src/shape.rs:200-204, obj_file.rs:42). Here:

  * data races are impossible by construction (pure functional JAX);
  * `validate_world` front-loads the host-side checks the reference scatters
    through panics (invertible transforms, sane material ranges, exactly one
    light);
  * `nan_debug` / `checked_color_at` wrap renders with jax.debug_nans /
    checkify to localize numeric faults in kernels.
"""

from __future__ import annotations

import contextlib
from typing import List

import numpy as np


def validate_world(world) -> List[str]:
    """Return a list of problems (empty == valid). Raises nothing."""
    problems: List[str] = []
    if world.light is None:
        problems.append("world has no light (exactly one point light required)")

    def walk(shape, path):
        if shape.kind == "group":
            for i, c in enumerate(shape.children):
                walk(c, f"{path}.children[{i}]")
            return
        det = np.linalg.det(shape.transform)
        if not np.isfinite(det) or abs(det) < 1e-12:
            problems.append(f"{path}: transform is singular (det={det:g}) "
                            f"(reference panics at src/shape.rs:215)")
        m = shape.material
        for name in ("ambient", "diffuse", "specular", "reflective", "transparency"):
            v = getattr(m, name)
            if not np.isfinite(v) or v < 0:
                problems.append(f"{path}: material.{name}={v} out of range")
        if m.refractive_index <= 0:
            problems.append(f"{path}: refractive_index must be positive")
        if shape.kind in ("cylinder", "cone") and shape.minimum > shape.maximum:
            problems.append(f"{path}: minimum > maximum")
        if shape.kind == "mesh" and shape.v1 is not None:
            if not (len(shape.v1) == len(shape.v2) == len(shape.v3)):
                problems.append(f"{path}: mesh corner arrays disagree in length")

    for i, obj in enumerate(world.objects):
        walk(obj, f"objects[{i}]")
    return problems


@contextlib.contextmanager
def nan_debug():
    """Enable jax NaN debugging for the enclosed block."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked_color_at(scene, o, d, cfg):
    """color_at under checkify: returns (error, colors); error.throw() raises
    with a kernel-level location if a NaN/inf was produced."""
    import jax
    from jax.experimental import checkify

    from ..render import integrator

    def f(scene, o, d):
        out = integrator.color_at(scene, o, d, cfg)
        checkify.check(jax.numpy.isfinite(out).all(), "non-finite color output")
        return out

    checked = checkify.checkify(f, errors=checkify.float_checks)
    return checked(scene, o, d)
