"""Matrix conformance tests (reference: src/matrix.rs:230-560, 24 tests)."""

import numpy as np

from rtc_tpu.ops import matrices as M
from rtc_tpu.ops import tuples as T

from conftest import assert_almost_eq


def A(rows):
    return np.array(rows, dtype=np.float64)


def test_constructing_and_inspecting_a_4x4_matrix():
    m = A([[1, 2, 3, 4], [5.5, 6.5, 7.5, 8.5], [9, 10, 11, 12], [13.5, 14.5, 15.5, 16.5]])
    assert m[0][0] == 1 and m[0][3] == 4 and m[1][0] == 5.5
    assert m[1][2] == 7.5 and m[2][2] == 11 and m[3][0] == 13.5 and m[3][2] == 15.5


def test_2x2_and_3x3_representable():
    m2 = A([[-3, 5], [1, -2]])
    assert m2[0][0] == -3 and m2[0][1] == 5 and m2[1][0] == 1 and m2[1][1] == -2
    m3 = A([[-3, 5, 0], [1, -2, -7], [0, 1, 1]])
    assert m3[0][0] == -3 and m3[1][1] == -2 and m3[2][2] == 1


def test_matrix_equality():
    a = A([[1, 2, 3, 4], [5, 6, 7, 8], [9, 8, 7, 6], [5, 4, 3, 2]])
    b = a.copy()
    assert bool(M.almost_equal(a, b))
    c = a.copy()
    c[0, 0] = 2
    c[3, 3] = 1
    assert not bool(M.almost_equal(a, c))


def test_multiplying_two_matrices():
    a = A([[1, 2, 3, 4], [5, 6, 7, 8], [9, 8, 7, 6], [5, 4, 3, 2]])
    b = A([[-2, 1, 2, 3], [3, 2, 1, -1], [4, 3, 6, 5], [1, 2, 7, 8]])
    expected = A([[20, 22, 50, 48], [44, 54, 114, 108], [40, 58, 110, 102], [16, 26, 46, 42]])
    assert_almost_eq(M.matmul(a, b), expected)


def test_a_matrix_multiplied_by_a_tuple():
    a = A([[1, 2, 3, 4], [2, 4, 4, 2], [8, 6, 4, 1], [0, 0, 0, 1]])
    assert_almost_eq(M.mul_tuple(a, T.tuple4(1, 2, 3, 1)), [18, 24, 33, 1])


def test_multiplying_a_matrix_by_the_identity_matrix():
    a = A([[0, 1, 2, 4], [1, 2, 4, 8], [2, 4, 8, 16], [4, 8, 16, 32]])
    assert_almost_eq(M.matmul(a, M.identity(4)), a)


def test_multiplying_the_identity_matrix_by_a_tuple():
    a = T.tuple4(1, 2, 3, 4)
    assert_almost_eq(M.mul_tuple(M.identity(4), a), a)


def test_transposing_a_matrix():
    a = A([[0, 9, 3, 0], [9, 8, 0, 8], [1, 8, 5, 3], [0, 0, 5, 8]])
    expected = A([[0, 9, 1, 0], [9, 8, 8, 0], [3, 0, 5, 5], [0, 8, 3, 8]])
    assert_almost_eq(M.transpose(a), expected)


def test_transposing_the_identity_matrix():
    assert_almost_eq(M.transpose(M.identity(4)), M.identity(4))


def test_calculating_the_determinant_of_a_2x2_matrix():
    assert_almost_eq(M.determinant(A([[1, 5], [-3, 2]])), 17.0)


def test_a_submatrix_of_a_3x3_matrix_is_a_2x2_matrix():
    a = A([[1, 5, 0], [-3, 2, 7], [0, 6, -3]])
    assert_almost_eq(M.submatrix(a, 0, 2), A([[-3, 2], [0, 6]]))


def test_a_submatrix_of_a_4x4_matrix_is_a_3x3_matrix():
    a = A([[-6, 1, 1, 6], [-8, 5, 8, 6], [-1, 0, 8, 2], [-7, 1, -1, 1]])
    assert_almost_eq(M.submatrix(a, 2, 1), A([[-6, 1, 6], [-8, 8, 6], [-7, -1, 1]]))


def test_calculating_a_minor_of_a_3x3_matrix():
    a = A([[3, 5, 0], [2, -1, -7], [6, -1, 5]])
    assert_almost_eq(M.determinant(M.submatrix(a, 1, 0)), 25.0)
    assert_almost_eq(M.minor(a, 1, 0), 25.0)


def test_calculating_a_cofactor_of_a_3x3_matrix():
    a = A([[3, 5, 0], [2, -1, -7], [6, -1, 5]])
    assert_almost_eq(M.minor(a, 0, 0), -12.0)
    assert_almost_eq(M.cofactor(a, 0, 0), -12.0)
    assert_almost_eq(M.minor(a, 1, 0), 25.0)
    assert_almost_eq(M.cofactor(a, 1, 0), -25.0)


def test_calculating_the_determinant_of_a_3x3_matrix():
    a = A([[1, 2, 6], [-5, 8, -4], [2, 6, 4]])
    assert_almost_eq(M.cofactor(a, 0, 0), 56.0)
    assert_almost_eq(M.cofactor(a, 0, 1), 12.0)
    assert_almost_eq(M.cofactor(a, 0, 2), -46.0)
    assert_almost_eq(M.determinant(a), -196.0)


def test_calculating_the_determinant_of_a_4x4_matrix():
    a = A([[-2, -8, 3, 5], [-3, 1, 7, 3], [1, 2, -9, 6], [-6, 7, 7, -9]])
    assert_almost_eq(M.cofactor(a, 0, 0), 690.0)
    assert_almost_eq(M.cofactor(a, 0, 1), 447.0)
    assert_almost_eq(M.cofactor(a, 0, 2), 210.0)
    assert_almost_eq(M.cofactor(a, 0, 3), 51.0)
    assert_almost_eq(M.determinant(a), -4071.0)


def test_testing_an_invertible_matrix_for_invertibility():
    a = A([[6, 4, 4, 4], [5, 5, 7, 6], [4, -9, 3, -7], [9, 1, 7, -6]])
    assert_almost_eq(M.determinant(a), -2120.0)
    assert bool(M.is_invertible(a))


def test_testing_a_noninvertible_matrix_for_invertibility():
    a = A([[-4, 2, -2, -3], [9, 6, 2, 6], [0, -5, 1, -5], [0, 0, 0, 0]])
    assert_almost_eq(M.determinant(a), 0.0)
    assert not bool(M.is_invertible(a))


def test_calculating_the_inverse_of_a_matrix():
    a = A([[-5, 2, 6, -8], [1, -5, 1, 8], [7, 7, -6, -7], [1, -3, 7, 4]])
    b = np.asarray(M.inverse(a))
    assert_almost_eq(M.determinant(a), 532.0)
    assert_almost_eq(M.cofactor(a, 2, 3), -160.0)
    assert_almost_eq(b[3][2], -160.0 / 532.0)
    assert_almost_eq(M.cofactor(a, 3, 2), 105.0)
    assert_almost_eq(b[2][3], 105.0 / 532.0)
    expected = A([
        [0.21805, 0.45113, 0.24060, -0.04511],
        [-0.80827, -1.45677, -0.44361, 0.52068],
        [-0.07895, -0.22368, -0.05263, 0.19737],
        [-0.52256, -0.81391, -0.30075, 0.30639],
    ])
    assert_almost_eq(b, expected)


def test_calculating_the_inverse_of_another_matrix():
    a = A([[8, -5, 9, 2], [7, 5, 6, 1], [-6, 0, 9, 6], [-3, 0, -9, -4]])
    expected = A([
        [-0.15385, -0.15385, -0.28205, -0.53846],
        [-0.07692, 0.12308, 0.02564, 0.03077],
        [0.35897, 0.35897, 0.43590, 0.92308],
        [-0.69231, -0.69231, -0.76923, -1.92308],
    ])
    assert_almost_eq(M.inverse(a), expected)


def test_calculating_the_inverse_of_a_third_matrix():
    a = A([[9, 3, 0, 9], [-5, -2, -6, -3], [-4, 9, 6, 4], [-7, 6, 6, 2]])
    expected = A([
        [-0.04074, -0.07778, 0.14444, -0.22222],
        [-0.07778, 0.03333, 0.36667, -0.33333],
        [-0.02901, -0.14630, -0.10926, 0.12963],
        [0.17778, 0.06667, -0.26667, 0.33333],
    ])
    assert_almost_eq(M.inverse(a), expected)


def test_multiplying_a_product_by_its_inverse():
    a = A([[3, -9, 7, 3], [3, -8, 2, -9], [-4, 4, 4, 1], [-6, 5, -1, 1]])
    b = A([[8, 2, 2, 2], [3, -1, 7, 0], [7, 0, 5, 4], [6, -2, 0, 5]])
    c = M.matmul(a, b)
    assert_almost_eq(M.matmul(c, M.inverse(b)), a)


def test_batched_inverse_matches_loop():
    rng = np.random.default_rng(0)
    batch = rng.normal(size=(5, 4, 4)) + np.eye(4) * 4.0
    binv = np.asarray(M.inverse(batch))
    for i in range(5):
        assert_almost_eq(binv[i], np.linalg.inv(batch[i]))
