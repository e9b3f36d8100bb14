"""Material/Phong conformance tests (reference: src/material.rs:78-215, 10 tests)."""

import math

import numpy as np
import jax.numpy as jnp

from rtc_tpu.ops import lighting as L
from rtc_tpu.scene.materials import Material, stripe_pattern

from conftest import assert_almost_eq

S2 = math.sqrt(2.0)
WHITE = (1.0, 1.0, 1.0)
BLACK = (0.0, 0.0, 0.0)


def lighting(m: Material, light_pos, light_int, position, eyev, normalv,
             in_shadow=False, surface_color=None):
    """Scalar adapter over the batched Phong kernel."""
    color = surface_color if surface_color is not None else m.color
    out = L.lighting(
        jnp.asarray([color], dtype=jnp.float64),
        jnp.asarray([m.ambient], dtype=jnp.float64),
        jnp.asarray([m.diffuse], dtype=jnp.float64),
        jnp.asarray([m.specular], dtype=jnp.float64),
        jnp.asarray([m.shininess], dtype=jnp.float64),
        jnp.asarray(light_pos, dtype=jnp.float64),
        jnp.asarray(light_int, dtype=jnp.float64),
        jnp.asarray([position], dtype=jnp.float64),
        jnp.asarray([eyev], dtype=jnp.float64),
        jnp.asarray([normalv], dtype=jnp.float64),
        jnp.asarray([in_shadow]),
    )
    return np.asarray(out)[0]


def test_the_default_material():
    m = Material()
    assert m.color == WHITE
    assert m.ambient == 0.1
    assert m.diffuse == 0.9
    assert m.specular == 0.9
    assert m.shininess == 200.0


def test_reflectivity_for_the_default_material():
    assert Material().reflective == 0.0


def test_transparency_and_refractive_index_for_the_default_material():
    m = Material()
    assert m.transparency == 0.0
    assert m.refractive_index == 1.0


def test_lighting_with_the_eye_between_the_light_and_the_surface():
    r = lighting(Material(), [0, 0, -10], WHITE, [0, 0, 0], [0, 0, -1], [0, 0, -1])
    assert_almost_eq(r, [1.9, 1.9, 1.9])


def test_lighting_with_the_eye_between_light_and_surface_eye_offset_45_degrees():
    r = lighting(Material(), [0, 0, -10], WHITE, [0, 0, 0], [0, S2 / 2, -S2 / 2], [0, 0, -1])
    assert_almost_eq(r, [1.0, 1.0, 1.0])


def test_lighting_with_eye_opposite_surface_light_offset_45_degrees():
    r = lighting(Material(), [0, 10, -10], WHITE, [0, 0, 0], [0, 0, -1], [0, 0, -1])
    assert_almost_eq(r, [0.7364, 0.7364, 0.7364])


def test_lighting_with_eye_in_the_path_of_the_reflection_vector():
    r = lighting(Material(), [0, 10, -10], WHITE, [0, 0, 0], [0, -S2 / 2, -S2 / 2], [0, 0, -1])
    assert_almost_eq(r, [1.6364, 1.6364, 1.6364])


def test_lighting_with_the_light_behind_the_surface():
    r = lighting(Material(), [0, 0, 10], WHITE, [0, 0, 0], [0, 0, -1], [0, 0, -1])
    assert_almost_eq(r, [0.1, 0.1, 0.1])


def test_lighting_with_the_surface_in_shadow():
    r = lighting(
        Material(), [0, 0, -10], WHITE, [0, 0, 0], [0, 0, -1], [0, 0, -1], in_shadow=True
    )
    assert_almost_eq(r, [0.1, 0.1, 0.1])


def test_lighting_with_a_pattern_applied():
    # pattern resolution happens before lighting in the wavefront pipeline;
    # here we emulate the reference by passing the stripe-resolved color
    # (the full pattern->lighting chain is covered in test_world/test_patterns)
    m = Material(ambient=1.0, diffuse=0.0, specular=0.0, pattern=stripe_pattern(WHITE, BLACK))
    c1 = lighting(m, [0, 0, -10], WHITE, [0.9, 0, 0], [0, 0, -1], [0, 0, -1],
                  surface_color=WHITE)
    c2 = lighting(m, [0, 0, -10], WHITE, [1.1, 0, 0], [0, 0, -1], [0, 0, -1],
                  surface_color=BLACK)
    assert_almost_eq(c1, [1.0, 1.0, 1.0])
    assert_almost_eq(c2, [0.0, 0.0, 0.0])
