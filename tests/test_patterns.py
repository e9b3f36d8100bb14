"""Pattern conformance tests (reference: src/pattern.rs:106-283, 17 tests)."""

import numpy as np
import jax.numpy as jnp

from rtc_tpu.ops import patterns as P
from rtc_tpu.ops import transforms as X
from rtc_tpu.scene import shapes as S
from rtc_tpu.scene.compile import compile_scene
from rtc_tpu.scene.materials import (
    Material,
    checkers_pattern,
    gradient_pattern,
    ring_pattern,
    stripe_pattern,
    test_pattern,
)
from rtc_tpu.scene.world import World

from conftest import assert_almost_eq

WHITE = np.array([1.0, 1.0, 1.0])
BLACK = np.array([0.0, 0.0, 0.0])


def color_at(kind, point, a=WHITE, b=BLACK):
    """Pattern::color_at in pattern space (src/pattern.rs:68-95)."""
    p = jnp.asarray([point], dtype=jnp.float64)
    out = P.color_at(p, jnp.asarray([kind], jnp.int32),
                     jnp.asarray([a], jnp.float64), jnp.asarray([b], jnp.float64))
    return np.asarray(out)[0]


def color_at_shape(shape, pattern, world_point):
    """Pattern::color_at_shape through the compiled precomposed affine
    (src/pattern.rs:98-103)."""
    shape.material = Material(pattern=pattern)
    scene = compile_scene(World(objects=[shape]), dtype=np.float64)
    pinv = np.asarray(scene.pat_inv)[0]
    p = pinv[:, :3] @ np.asarray(world_point, dtype=np.float64) + pinv[:, 3]
    return color_at(int(np.asarray(scene.pat_kind)[0]), p,
                    np.asarray(scene.pat_a)[0], np.asarray(scene.pat_b)[0])


def test_creating_a_stripe_pattern():
    p = stripe_pattern(WHITE, BLACK)
    assert p.kind == P.STRIPE
    assert p.a == (1.0, 1.0, 1.0) and p.b == (0.0, 0.0, 0.0)


def test_a_stripe_pattern_is_constant_in_y():
    for y in (0.0, 1.0, 2.0):
        assert_almost_eq(color_at(P.STRIPE, [0, y, 0]), WHITE)


def test_a_stripe_pattern_is_constant_in_z():
    for z in (0.0, 1.0, 2.0):
        assert_almost_eq(color_at(P.STRIPE, [0, 0, z]), WHITE)


def test_a_stripe_pattern_alternates_in_x():
    cases = [(0.0, WHITE), (0.9, WHITE), (1.0, BLACK), (-0.1, BLACK), (-1.0, BLACK), (-1.1, WHITE)]
    for x, expected in cases:
        assert_almost_eq(color_at(P.STRIPE, [x, 0, 0]), expected)


def test_stripes_with_an_object_transformation():
    c = color_at_shape(S.sphere(transform=X.scaling(2, 2, 2)),
                       stripe_pattern(WHITE, BLACK), [1.5, 0, 0])
    assert_almost_eq(c, WHITE)


def test_stripes_with_a_pattern_transformation():
    pat = stripe_pattern(WHITE, BLACK).set_transform(X.scaling(2, 2, 2))
    c = color_at_shape(S.sphere(), pat, [1.5, 0, 0])
    assert_almost_eq(c, WHITE)


def test_stripes_with_both_an_object_and_a_pattern_transformation():
    pat = stripe_pattern(WHITE, BLACK).set_transform(X.translation(0.5, 0, 0))
    c = color_at_shape(S.sphere(transform=X.scaling(2, 2, 2)), pat, [2.5, 0, 0])
    assert_almost_eq(c, WHITE)


def test_the_default_pattern_transformation():
    assert_almost_eq(stripe_pattern(WHITE, BLACK).transform, np.eye(4))


def test_assigning_a_transformation():
    pat = test_pattern().set_transform(X.translation(1, 2, 3))
    assert_almost_eq(pat.transform, X.translation(1, 2, 3))


def test_a_pattern_with_an_object_transformation():
    c = color_at_shape(S.sphere(transform=X.scaling(2, 2, 2)), test_pattern(), [2, 3, 4])
    assert_almost_eq(c, [1.0, 1.5, 2.0])


def test_a_pattern_with_a_pattern_transformation():
    pat = test_pattern().set_transform(X.scaling(2, 2, 2))
    c = color_at_shape(S.sphere(), pat, [2, 3, 4])
    assert_almost_eq(c, [1.0, 1.5, 2.0])


def test_a_pattern_with_both_an_object_and_a_pattern_transformation():
    pat = test_pattern().set_transform(X.translation(0.5, 1, 1.5))
    c = color_at_shape(S.sphere(transform=X.scaling(2, 2, 2)), pat, [2.5, 3, 3.5])
    assert_almost_eq(c, [0.75, 0.5, 0.25])


def test_a_gradient_linearly_interpolates_between_colors():
    assert_almost_eq(color_at(P.GRADIENT, [0, 0, 0]), WHITE)
    assert_almost_eq(color_at(P.GRADIENT, [0.25, 0, 0]), [0.75, 0.75, 0.75])
    assert_almost_eq(color_at(P.GRADIENT, [0.5, 0, 0]), [0.5, 0.5, 0.5])
    assert_almost_eq(color_at(P.GRADIENT, [0.75, 0, 0]), [0.25, 0.25, 0.25])


def test_a_ring_should_extend_in_both_x_and_z():
    assert_almost_eq(color_at(P.RING, [0, 0, 0]), WHITE)
    assert_almost_eq(color_at(P.RING, [1, 0, 0]), BLACK)
    assert_almost_eq(color_at(P.RING, [0, 0, 1]), BLACK)
    assert_almost_eq(color_at(P.RING, [0.708, 0, 0.708]), BLACK)


def test_checkers_should_repeat_in_x():
    assert_almost_eq(color_at(P.CHECKERS, [0, 0, 0]), WHITE)
    assert_almost_eq(color_at(P.CHECKERS, [0.99, 0, 0]), WHITE)
    assert_almost_eq(color_at(P.CHECKERS, [1.01, 0, 0]), BLACK)


def test_checkers_should_repeat_in_y():
    assert_almost_eq(color_at(P.CHECKERS, [0, 0.99, 0]), WHITE)
    assert_almost_eq(color_at(P.CHECKERS, [0, 1.01, 0]), BLACK)


def test_checkers_should_repeat_in_z():
    assert_almost_eq(color_at(P.CHECKERS, [0, 0, 0.99]), WHITE)
    assert_almost_eq(color_at(P.CHECKERS, [0, 0, 1.01]), BLACK)


def test_none_pattern_yields_first_color():
    assert_almost_eq(color_at(P.NONE, [5.0, -3.0, 2.0], a=np.array([0.3, 0.4, 0.5])),
                     [0.3, 0.4, 0.5])
