"""Colors are (..., 3) RGB arrays, unclamped until PPM write
(reference: src/color.rs). Arithmetic (+, -, scalar *, Hadamard *) is ordinary
array arithmetic, so no wrappers are needed — only the named constants."""

from __future__ import annotations

import jax.numpy as jnp


def color(r, g, b):
    return jnp.stack(
        [jnp.asarray(r, dtype=jnp.result_type(float)),
         jnp.asarray(g, dtype=jnp.result_type(float)),
         jnp.asarray(b, dtype=jnp.result_type(float))],
        axis=-1,
    )


def black():
    return color(0.0, 0.0, 0.0)


def white():
    return color(1.0, 1.0, 1.0)


def red():
    return color(1.0, 0.0, 0.0)


def green():
    return color(0.0, 1.0, 0.0)


def blue():
    return color(0.0, 0.0, 1.0)
