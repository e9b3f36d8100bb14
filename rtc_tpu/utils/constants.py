"""Numeric tolerance policy.

The reference uses a single EPSILON = 1e-5 everywhere (reference: src/utils.rs:2) —
for float comparisons, for the plane/triangle parallel-ray guards, and for the
shadow-acne offsets (over_point/under_point). We keep the same value as the
*semantic* epsilon so the book's 5-decimal expectations hold in f64 conformance
mode, and expose a separate configurable shadow bias for f32 renders where 1e-5
can sit below the representable resolution at scene scale.
"""

EPSILON = 1e-5

# Large-but-finite sentinel used for "no hit" so that min-reductions stay NaN-free.
BIG = 1e30


def is_almost_equal(a, b, eps: float = EPSILON):
    """Scalar/array approximate equality (reference: src/utils.rs:4-6)."""
    import jax.numpy as jnp

    return jnp.abs(a - b) < eps
