"""Square-matrix helpers mirroring the reference Matrix<SIZE> API surface.

The reference implements const-generic 2/3/4 matrices with recursive cofactor
determinants and cofactor inverses (src/matrix.rs:41-157). Here matrices are
plain (..., n, n) jnp arrays; determinant/inverse lower to XLA's LU path, and
the cofactor-flavored API (submatrix/minor/cofactor) is kept for conformance
tests and users of the reference API. All ops broadcast over batch dims.

Scene compilation does NOT go through the generic inverse: affine transforms
are inverted analytically in float64 on the host (see rtc_tpu.scene.compile),
which is both faster and more accurate than the reference's per-ray cofactor
inverse (src/shape.rs:249-253 recomputed it per intersection call).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.constants import EPSILON


def identity(n: int = 4, dtype=None):
    """(reference: src/matrix.rs:19-27)"""
    return jnp.eye(n, dtype=dtype or jnp.result_type(float))


def transpose(m):
    """(reference: src/matrix.rs:29-39)"""
    return jnp.swapaxes(m, -1, -2)


def matmul(a, b):
    """Matrix x matrix (reference: src/matrix.rs:187-205)."""
    return a @ b


def mul_tuple(m, t):
    """4x4 matrix x homogeneous tuple (reference: src/matrix.rs:207-227)."""
    return jnp.einsum("...ij,...j->...i", m, t)


def submatrix(m, row: int, col: int):
    """Delete one row and one column (reference: src/matrix.rs:55-113).

    row/col must be static Python ints (shape changes).
    """
    n = m.shape[-1]
    rows = [i for i in range(n) if i != row]
    cols = [j for j in range(n) if j != col]
    return m[..., rows, :][..., :, cols]


def determinant(m):
    """(reference: src/matrix.rs:41-52)"""
    return jnp.linalg.det(m)


def minor(m, row: int, col: int):
    """Determinant of the submatrix (reference: src/matrix.rs:115-121)."""
    return determinant(submatrix(m, row, col))


def cofactor(m, row: int, col: int):
    """Sign-adjusted minor (reference: src/matrix.rs:123-136)."""
    sign = -1.0 if (row + col) % 2 else 1.0
    return sign * minor(m, row, col)


def is_invertible(m, eps: float = EPSILON):
    """The reference's inverse() returns None on a zero determinant
    (src/matrix.rs:138-157); here singularity is a predicate."""
    return jnp.abs(determinant(m)) > eps


def inverse(m):
    """General inverse (reference: src/matrix.rs:138-157). Singular input
    produces non-finite values rather than None — check is_invertible first
    when the reference's Option semantics are needed."""
    return jnp.linalg.inv(m)


def almost_equal(a, b, eps: float = EPSILON):
    """Elementwise approximate equality, all-reduced (src/matrix.rs:174-185)."""
    return jnp.all(jnp.abs(a - b) < eps, axis=(-2, -1))
