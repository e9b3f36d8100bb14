"""Validation and numeric-checking utilities."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtc_tpu.scene import shapes as S
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.scene.materials import Material
from rtc_tpu.scene.world import World, default_world
from rtc_tpu.utils.config import RenderConfig
from rtc_tpu.utils.debug import checked_color_at, validate_world


def test_validate_clean_world():
    assert validate_world(default_world()) == []


def test_validate_flags_singular_transform():
    s = S.sphere()
    s.set_transform(np.diag([1.0, 0.0, 1.0, 1.0]))  # squashed flat
    problems = validate_world(World(objects=[s]))
    assert any("singular" in p for p in problems)


def test_validate_flags_bad_material():
    s = S.sphere(material=Material(diffuse=-0.5))
    problems = validate_world(World(objects=[s]))
    assert any("diffuse" in p for p in problems)


def test_validate_flags_inverted_cylinder_range():
    problems = validate_world(World(objects=[S.cylinder(2.0, 1.0, True)]))
    assert any("minimum > maximum" in p for p in problems)


def test_checked_render_is_clean_on_default_world():
    scene = compile_scene(default_world(), dtype=np.float64)
    o = jnp.asarray([[0.0, 0.0, -5.0]], dtype=jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float64)
    err, colors = checked_color_at(scene, o, d, RenderConfig(dtype="float64"))
    err.throw()  # no error expected
    assert np.all(np.isfinite(np.asarray(colors)))
