"""Transformation conformance tests (reference: src/transformations.rs:95-320, 23 tests)."""

import math

import numpy as np

from rtc_tpu.ops import matrices as M
from rtc_tpu.ops import transforms as X
from rtc_tpu.ops import tuples as T

from conftest import assert_almost_eq

PI = math.pi
S2 = math.sqrt(2.0)


def apply(m, t):
    return M.mul_tuple(np.asarray(m), t)


def test_multiplying_by_a_translation_matrix():
    assert_almost_eq(apply(X.translation(5, -3, 2), T.point(-3, 4, 5)), T.point(2, 1, 7))


def test_multiplying_by_the_inverse_of_a_translation_matrix():
    inv = M.inverse(X.translation(5, -3, 2))
    assert_almost_eq(apply(inv, T.point(-3, 4, 5)), T.point(-8, 7, 3))


def test_translation_does_not_affect_vectors():
    v = T.vector(-3, 4, 5)
    assert_almost_eq(apply(X.translation(5, -3, 2), v), v)


def test_a_scaling_matrix_applied_to_a_point():
    assert_almost_eq(apply(X.scaling(2, 3, 4), T.point(-4, 6, 8)), T.point(-8, 18, 32))


def test_a_scaling_matrix_applied_to_a_vector():
    assert_almost_eq(apply(X.scaling(2, 3, 4), T.vector(-4, 6, 8)), T.vector(-8, 18, 32))


def test_multiplying_by_the_inverse_of_a_scaling_matrix():
    inv = M.inverse(X.scaling(2, 3, 4))
    assert_almost_eq(apply(inv, T.vector(-4, 6, 8)), T.vector(-2, 2, 2))


def test_reflection_is_scaling_by_a_negative_value():
    assert_almost_eq(apply(X.scaling(-1, 1, 1), T.point(2, 3, 4)), T.point(-2, 3, 4))


def test_rotating_a_point_around_the_x_axis():
    p = T.point(0, 1, 0)
    assert_almost_eq(apply(X.rotation_x(PI / 4), p), T.point(0, S2 / 2, S2 / 2))
    assert_almost_eq(apply(X.rotation_x(PI / 2), p), T.point(0, 0, 1))


def test_the_inverse_of_an_x_rotation_rotates_in_the_opposite_direction():
    p = T.point(0, 1, 0)
    inv = M.inverse(X.rotation_x(PI / 4))
    assert_almost_eq(apply(inv, p), T.point(0, S2 / 2, -S2 / 2))


def test_rotating_a_point_around_the_y_axis():
    p = T.point(0, 0, 1)
    assert_almost_eq(apply(X.rotation_y(PI / 4), p), T.point(S2 / 2, 0, S2 / 2))
    assert_almost_eq(apply(X.rotation_y(PI / 2), p), T.point(1, 0, 0))


def test_rotating_a_point_around_the_z_axis():
    p = T.point(0, 1, 0)
    assert_almost_eq(apply(X.rotation_z(PI / 4), p), T.point(-S2 / 2, S2 / 2, 0))
    assert_almost_eq(apply(X.rotation_z(PI / 2), p), T.point(-1, 0, 0))


def test_shearing_transformations():
    p = T.point(2, 3, 4)
    assert_almost_eq(apply(X.shearing(1, 0, 0, 0, 0, 0), p), T.point(5, 3, 4))
    assert_almost_eq(apply(X.shearing(0, 1, 0, 0, 0, 0), p), T.point(6, 3, 4))
    assert_almost_eq(apply(X.shearing(0, 0, 1, 0, 0, 0), p), T.point(2, 5, 4))
    assert_almost_eq(apply(X.shearing(0, 0, 0, 1, 0, 0), p), T.point(2, 7, 4))
    assert_almost_eq(apply(X.shearing(0, 0, 0, 0, 1, 0), p), T.point(2, 3, 6))
    assert_almost_eq(apply(X.shearing(0, 0, 0, 0, 0, 1), p), T.point(2, 3, 7))


def test_individual_transformations_are_applied_in_sequence():
    p = T.point(1, 0, 1)
    a, b, c = X.rotation_x(PI / 2), X.scaling(5, 5, 5), X.translation(10, 5, 7)
    p2 = apply(a, p)
    assert_almost_eq(p2, T.point(1, -1, 0))
    p3 = apply(b, p2)
    assert_almost_eq(p3, T.point(5, -5, 0))
    p4 = apply(c, p3)
    assert_almost_eq(p4, T.point(15, 0, 7))


def test_chained_transformations_must_be_applied_in_reverse_order():
    p = T.point(1, 0, 1)
    t = M.matmul(M.matmul(X.translation(10, 5, 7), X.scaling(5, 5, 5)), X.rotation_x(PI / 2))
    assert_almost_eq(apply(t, p), T.point(15, 0, 7))


def test_the_transformation_matrix_for_the_default_orientation():
    t = X.view_transform([0, 0, 0], [0, 0, -1], [0, 1, 0])
    assert_almost_eq(t, M.identity(4))


def test_a_view_transformation_matrix_looking_in_positive_z_direction():
    t = X.view_transform([0, 0, 0], [0, 0, 1], [0, 1, 0])
    assert_almost_eq(t, X.scaling(-1, 1, -1))


def test_the_view_transformation_moves_the_world():
    t = X.view_transform([0, 0, 8], [0, 0, 0], [0, 1, 0])
    assert_almost_eq(t, X.translation(0, 0, -8))


def test_an_arbitrary_view_transformation():
    t = X.view_transform([1, 3, 2], [4, -2, 8], [1, 1, 0])
    expected = np.array([
        [-0.50709, 0.50709, 0.67612, -2.36643],
        [0.76772, 0.60609, 0.12122, -2.82843],
        [-0.35857, 0.59761, -0.71714, 0.00000],
        [0.00000, 0.00000, 0.00000, 1.00000],
    ])
    assert_almost_eq(t, expected)


def test_affine_inverse_matches_general_inverse():
    t = np.asarray(
        M.matmul(
            M.matmul(X.translation(1, -2, 3), X.rotation_y(0.7)),
            X.scaling(2.0, 0.5, 4.0),
        )
    )
    assert_almost_eq(X.affine_inverse(t), np.linalg.inv(t), eps=1e-9)


def test_transform_points_and_dirs():
    t = np.asarray(X.translation(1, 2, 3))
    p = np.array([[1.0, 1.0, 1.0]])
    assert_almost_eq(X.transform_points(t, p), [[2.0, 3.0, 4.0]])
    assert_almost_eq(X.transform_dirs(t, p), [[1.0, 1.0, 1.0]])
