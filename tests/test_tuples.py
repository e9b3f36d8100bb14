"""Tuple conformance tests (reference: src/tuple.rs:155-352, 26 tests)."""

import math

import numpy as np

from rtc_tpu.ops import tuples as T
from rtc_tpu.ops import vec

from conftest import assert_almost_eq


def test_a_tuple_with_w_eq_1_is_a_point():
    t = T.tuple4(4.3, -4.2, 3.1, 1.0)
    assert_almost_eq(t, [4.3, -4.2, 3.1, 1.0], eps=1e-12)
    assert bool(T.is_point(t))
    assert not bool(T.is_vector(t))


def test_a_tuple_with_w_eq_0_is_a_vector():
    t = T.tuple4(4.3, -4.2, 3.1, 0.0)
    assert not bool(T.is_point(t))
    assert bool(T.is_vector(t))


def test_point_creates_tuples_with_w_eq_1():
    assert_almost_eq(T.point(4.0, -4.0, 3.0), [4.0, -4.0, 3.0, 1.0])


def test_vector_creates_tuples_with_w_0():
    assert_almost_eq(T.vector(4.0, -4.0, 3.0), [4.0, -4.0, 3.0, 0.0])


def test_adding_two_tuples():
    a = T.tuple4(3.0, -2.0, 5.0, 1.0)
    b = T.tuple4(-2.0, 3.0, 1.0, 0.0)
    assert_almost_eq(a + b, [1.0, 1.0, 6.0, 1.0])


def test_subtracting_two_points():
    assert_almost_eq(T.point(3, 2, 1) - T.point(5, 6, 7), T.vector(-2, -4, -6))


def test_subtracting_vector_from_point():
    assert_almost_eq(T.point(3, 2, 1) - T.vector(5, 6, 7), T.point(-2, -4, -6))


def test_subtracting_vector_from_vector():
    assert_almost_eq(T.vector(3, 2, 1) - T.vector(5, 6, 7), T.vector(-2, -4, -6))


def test_subtracting_a_vector_from_the_zero_vector():
    assert_almost_eq(T.vector(0, 0, 0) - T.vector(1, -2, 3), T.vector(-1, 2, -3))


def test_negating_a_tuple():
    assert_almost_eq(-T.tuple4(1, -2, 3, -4), [-1.0, 2.0, -3.0, 4.0])


def test_multiplying_a_tuple_by_a_scalar():
    assert_almost_eq(T.tuple4(1, -2, 3, -4) * 3.5, [3.5, -7.0, 10.5, -14.0])


def test_multiplying_a_tuple_by_a_fraction():
    assert_almost_eq(T.tuple4(1, -2, 3, -4) * 0.5, [0.5, -1.0, 1.5, -2.0])


def test_dividing_a_tuple_by_a_scalar():
    assert_almost_eq(T.tuple4(1, -2, 3, -4) / 2.0, [0.5, -1.0, 1.5, -2.0])


def test_magnitudes_of_unit_vectors():
    for v in ([1, 0, 0], [0, 1, 0], [0, 0, 1]):
        assert_almost_eq(T.magnitude(T.vector(*v)), 1.0)


def test_computing_the_magnitude_of_vector_1_2_3():
    assert_almost_eq(T.magnitude(T.vector(1, 2, 3)), math.sqrt(14.0))


def test_computing_the_magnitude_of_neg_vector_1_2_3():
    assert_almost_eq(T.magnitude(T.vector(-1, -2, -3)), math.sqrt(14.0))


def test_normalizing_vector_4_0_0_gives_1_0_0():
    assert_almost_eq(T.normalize(T.vector(4, 0, 0)), T.vector(1, 0, 0))


def test_normalizing_vector_1_2_3():
    norm = T.normalize(T.vector(1, 2, 3))
    assert_almost_eq(norm, T.vector(0.26726124, 0.5345225, 0.8017837))
    assert_almost_eq(T.magnitude(norm), 1.0)


def test_normalizing_zero_vector_gives_zero():
    # reference guards the division (src/tuple.rs:54-57)
    assert_almost_eq(T.normalize(T.vector(0, 0, 0)), T.vector(0, 0, 0))


def test_the_dot_product_of_two_tuples():
    assert_almost_eq(T.dot(T.vector(1, 2, 3), T.vector(2, 3, 4)), 20.0)


def test_the_cross_product_of_two_vectors():
    a, b = T.vector(1, 2, 3), T.vector(2, 3, 4)
    assert_almost_eq(T.cross(a, b), T.vector(-1, 2, -1))
    assert_almost_eq(T.cross(b, a), T.vector(1, -2, 1))


def test_reflecting_a_vector_approaching_at_45_degrees():
    r = T.reflect(T.vector(1, -1, 0), T.vector(0, 1, 0))
    assert_almost_eq(r, T.vector(1, 1, 0))


def test_reflecting_a_vector_off_a_slanted_surface():
    s = math.sqrt(2.0) / 2.0
    r = T.reflect(T.vector(0, -1, 0), T.vector(s, s, 0))
    assert_almost_eq(r, T.vector(1, 0, 0))


# --- vec3 fast-path equivalents (renderer representation) -------------------

def test_vec3_ops_match_tuple_ops():
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([2.0, 3.0, 4.0])
    assert_almost_eq(vec.dot(a, b), 20.0)
    assert_almost_eq(vec.cross(a, b), [-1.0, 2.0, -1.0])
    assert_almost_eq(vec.magnitude(a), math.sqrt(14.0))
    assert_almost_eq(vec.normalize(np.array([4.0, 0.0, 0.0])), [1.0, 0.0, 0.0])
    assert_almost_eq(vec.normalize(np.zeros(3)), [0.0, 0.0, 0.0])
    s = math.sqrt(2.0) / 2.0
    assert_almost_eq(
        vec.reflect(np.array([0.0, -1.0, 0.0]), np.array([s, s, 0.0])), [1.0, 0.0, 0.0]
    )


def test_vec3_ops_batched():
    a = np.arange(12.0).reshape(4, 3)
    a[0] = 0.0
    n = vec.normalize(a)
    mags = vec.magnitude(n)
    assert_almost_eq(mags[1:], np.ones(3))
    assert_almost_eq(mags[0], 0.0)  # zero row stays zero
