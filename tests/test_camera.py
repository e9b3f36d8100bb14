"""Camera conformance tests (reference: src/camera.rs:82-156, 7 tests)."""

import math

import numpy as np
import jax.numpy as jnp

from rtc_tpu import Camera, compile_scene, default_world, render
from rtc_tpu.ops import matrices as M
from rtc_tpu.ops import transforms as X
from rtc_tpu.render.camera import camera_rays
from rtc_tpu.utils.config import RenderConfig

from conftest import assert_almost_eq

PI = math.pi
S2 = math.sqrt(2.0)


def ray_for_pixel(cam: Camera, px: int, py: int):
    o, d = camera_rays(
        jnp.asarray(cam.transform_inverse, jnp.float64),
        cam.hsize, cam.vsize, cam.half_width, cam.half_height, cam.pixel_size,
        dtype=jnp.float64,
    )
    idx = py * cam.hsize + px
    return np.asarray(o)[idx], np.asarray(d)[idx]


def test_constructing_a_camera():
    c = Camera(160, 120, PI / 2)
    assert c.hsize == 160 and c.vsize == 120
    assert c.field_of_view == PI / 2
    assert_almost_eq(c.transform, np.eye(4))


def test_the_pixel_size_for_a_horizontal_canvas():
    assert_almost_eq(Camera(200, 125, PI / 2).pixel_size, 0.01)


def test_the_pixel_size_for_a_vertical_canvas():
    assert_almost_eq(Camera(125, 200, PI / 2).pixel_size, 0.01)


def test_constructing_a_ray_through_the_center_of_the_canvas():
    c = Camera(201, 101, PI / 2)
    o, d = ray_for_pixel(c, 100, 50)
    assert_almost_eq(o, [0, 0, 0])
    assert_almost_eq(d, [0, 0, -1])


def test_constructing_a_ray_through_a_corner_of_the_canvas():
    c = Camera(201, 101, PI / 2)
    o, d = ray_for_pixel(c, 0, 0)
    assert_almost_eq(o, [0, 0, 0])
    assert_almost_eq(d, [0.66519, 0.33259, -0.66851])


def test_constructing_a_ray_when_the_camera_is_transformed():
    c = Camera(201, 101, PI / 2)
    c.set_transform(M.matmul(X.rotation_y(PI / 4), X.translation(0, -2, 5)))
    o, d = ray_for_pixel(c, 100, 50)
    assert_almost_eq(o, [0, 2, -5])
    assert_almost_eq(d, [S2 / 2, 0, -S2 / 2])


def test_rendering_a_world_with_a_camera():
    scene = compile_scene(default_world(), dtype=np.float64)
    c = Camera(11, 11, PI / 2)
    c.set_transform(X.view_transform([0, 0, -5], [0, 0, 0], [0, 1, 0]))
    image = render(scene, c, RenderConfig(dtype="float64"))
    assert_almost_eq(np.asarray(image)[5, 5], [0.38066, 0.47583, 0.2855])


def test_rendering_f32_matches_f64_within_quantization():
    """New-framework check: the f32 production path agrees with the f64
    conformance path to well under 8-bit quantization error."""
    c = Camera(24, 12, PI / 3)
    c.set_transform(X.view_transform([0, 1.5, -5], [0, 1, 0], [0, 1, 0]))
    scene64 = compile_scene(default_world(), dtype=np.float64)
    img64 = np.asarray(render(scene64, c, RenderConfig(dtype="float64")))
    scene32 = compile_scene(default_world(), dtype=np.float32)
    img32 = np.asarray(render(scene32, c, RenderConfig(dtype="float32")))
    assert np.max(np.abs(img64 - img32)) < 2e-3
