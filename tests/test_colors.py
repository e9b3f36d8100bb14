"""Color conformance tests (reference: src/color.rs:100-141, 5 tests)."""

from rtc_tpu.ops import colors as C

from conftest import assert_almost_eq


def test_colors_are_red_green_blue():
    assert_almost_eq(C.color(-0.5, 0.4, 1.7), [-0.5, 0.4, 1.7], eps=1e-12)


def test_adding_colors():
    assert_almost_eq(C.color(0.9, 0.6, 0.75) + C.color(0.7, 0.1, 0.25), [1.6, 0.7, 1.0])


def test_subtracting_colors():
    assert_almost_eq(C.color(0.9, 0.6, 0.75) - C.color(0.7, 0.1, 0.25), [0.2, 0.5, 0.5])


def test_multiplying_a_color_by_a_scalar():
    assert_almost_eq(C.color(0.2, 0.3, 0.4) * 2.0, [0.4, 0.6, 0.8])


def test_multiplying_a_color_by_a_color():
    assert_almost_eq(C.color(1.0, 0.2, 0.4) * C.color(0.9, 1.0, 0.1), [0.9, 0.2, 0.04])
