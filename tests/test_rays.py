"""Ray conformance tests (reference: src/ray.rs:27-69, 4 tests)."""

import numpy as np

from rtc_tpu.ops import rays as R
from rtc_tpu.ops import transforms as X

from conftest import assert_almost_eq


def test_creating_and_querying_a_ray():
    r = R.ray([1, 2, 3], [4, 5, 6])
    assert_almost_eq(r.origin, [1, 2, 3])
    assert_almost_eq(r.direction, [4, 5, 6])


def test_computing_a_point_from_a_distance():
    r = R.ray([2, 3, 4], [1, 0, 0])
    assert_almost_eq(R.position(r, 0.0), [2, 3, 4])
    assert_almost_eq(R.position(r, 1.0), [3, 3, 4])
    assert_almost_eq(R.position(r, -1.0), [1, 3, 4])
    assert_almost_eq(R.position(r, 2.5), [4.5, 3, 4])


def test_translating_a_ray():
    r = R.ray([1, 2, 3], [0, 1, 0])
    r2 = R.transform(r, X.translation(3, 4, 5))
    assert_almost_eq(r2.origin, [4, 6, 8])
    assert_almost_eq(r2.direction, [0, 1, 0])


def test_scaling_a_ray():
    r = R.ray([1, 2, 3], [0, 1, 0])
    r2 = R.transform(r, X.scaling(2, 3, 4))
    assert_almost_eq(r2.origin, [2, 6, 12])
    # direction NOT renormalized (src/ray.rs:19-24)
    assert_almost_eq(r2.direction, [0, 3, 0])


def test_batched_rays():
    r = R.ray(np.zeros((4, 3)), np.tile([0.0, 0.0, 1.0], (4, 1)))
    p = R.position(r, np.arange(4.0))
    assert_almost_eq(p[:, 2], [0, 1, 2, 3])
