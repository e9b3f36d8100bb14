"""Host-side material & pattern descriptions (reference: src/material.rs:3-29,
src/pattern.rs:14-66).

These are plain Python/numpy objects used while *building* a scene; the
compiler (rtc_tpu.scene.compile) packs them into per-object device tables.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..ops import patterns as pattern_ops


def _color(c) -> Tuple[float, float, float]:
    arr = np.asarray(c, dtype=np.float64).reshape(3)
    return (float(arr[0]), float(arr[1]), float(arr[2]))


@dataclasses.dataclass
class Pattern:
    """A procedural pattern + its own transform (reference: src/pattern.rs:14-19).

    kind is one of rtc_tpu.ops.patterns.{STRIPE,GRADIENT,RING,CHECKERS,TEST}.
    """

    kind: int
    a: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    b: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float64)
    )

    def set_transform(self, m) -> "Pattern":
        """(reference: src/pattern.rs:63-66)"""
        self.transform = np.asarray(m, dtype=np.float64).reshape(4, 4)
        return self


def stripe_pattern(a, b) -> Pattern:
    return Pattern(pattern_ops.STRIPE, _color(a), _color(b))


def gradient_pattern(a, b) -> Pattern:
    return Pattern(pattern_ops.GRADIENT, _color(a), _color(b))


def ring_pattern(a, b) -> Pattern:
    return Pattern(pattern_ops.RING, _color(a), _color(b))


def checkers_pattern(a, b) -> Pattern:
    return Pattern(pattern_ops.CHECKERS, _color(a), _color(b))


def test_pattern() -> Pattern:
    """(reference: src/pattern.rs:55-61)"""
    return Pattern(pattern_ops.TEST)


# factory, not a pytest case (the name mirrors the reference's
# Pattern::test_pattern and is imported into test modules)
test_pattern.__test__ = False


@dataclasses.dataclass
class Material:
    """Defaults exactly as the reference (src/material.rs:17-29)."""

    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    ambient: float = 0.1
    diffuse: float = 0.9
    specular: float = 0.9
    shininess: float = 200.0
    reflective: float = 0.0
    pattern: Optional[Pattern] = None
    transparency: float = 0.0
    refractive_index: float = 1.0

    def replace(self, **kw) -> "Material":
        return dataclasses.replace(self, **kw)
