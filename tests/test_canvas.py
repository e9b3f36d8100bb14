"""Canvas/PPM conformance tests (reference: src/canvas.rs:66-175, 6 tests)."""

import numpy as np

from rtc_tpu.io.canvas import Canvas

from conftest import assert_almost_eq


def test_creating_a_canvas():
    c = Canvas(10, 20)
    assert c.width == 10 and c.height == 20
    assert np.all(c.pixels == 0.0)


def test_writing_pixels_to_canvas():
    c = Canvas(10, 20)
    c.set_pixel(2, 3, [1.0, 0.0, 0.0])
    assert_almost_eq(c.get_pixel(2, 3), [1.0, 0.0, 0.0])


def test_constructing_the_ppm_header():
    lines = Canvas(5, 3).to_ppm_string().split("\n")
    assert lines[0] == "P3"
    assert lines[1] == "5 3"
    assert lines[2] == "255"


def test_constructing_the_ppm_pixel_data():
    c = Canvas(5, 3)
    c.set_pixel(0, 0, [1.5, 0.0, 0.0])
    c.set_pixel(2, 1, [0.0, 0.5, 0.0])
    c.set_pixel(4, 2, [-0.5, 0.0, 1.0])
    lines = c.to_ppm_string().split("\n")
    assert len(lines) == 7
    assert lines[3] == "255 0 0 0 0 0 0 0 0 0 0 0 0 0 0"
    assert lines[4] == "0 0 0 0 0 0 0 128 0 0 0 0 0 0 0"
    assert lines[5] == "0 0 0 0 0 0 0 0 0 0 0 0 0 0 255"


def test_splitting_long_lines_in_ppm_files():
    c = Canvas(10, 2)
    c.pixels[:] = [1.0, 0.8, 0.6]
    lines = c.to_ppm_string().split("\n")
    assert len(lines) == 8
    assert lines[3] == "255 204 153 255 204 153 255 204 153 255 204 153 255 204 153 255 204"
    assert lines[4] == "153 255 204 153 255 204 153 255 204 153 255 204 153"
    assert lines[5] == "255 204 153 255 204 153 255 204 153 255 204 153 255 204 153 255 204"
    assert lines[6] == "153 255 204 153 255 204 153 255 204 153 255 204 153"


def test_ppm_files_are_terminated_by_a_newline_character():
    assert Canvas(5, 3).to_ppm_string().endswith("\n")


def test_light_has_position_and_intensity():
    """(reference: src/light.rs:24-31, the single light test)"""
    from rtc_tpu.scene.world import PointLight

    light = PointLight((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    assert light.position == (0.0, 0.0, 0.0)
    assert light.intensity == (1.0, 1.0, 1.0)
