"""Phong shading (reference: src/material.rs:32-75).

Faithful gating:
  * diffuse + specular are zeroed in shadow (src/material.rs:57),
  * diffuse requires light_dot_normal >= 0 (src/material.rs:60 — note >=, the
    grazing case contributes a zero diffuse but still evaluates specular),
  * specular additionally requires reflect_dot_eye > 0 (src/material.rs:67),
  * specular scales the raw light intensity, NOT the effective color
    (src/material.rs:69).
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec import dot, normalize, reflect


def lighting(
    surface_color,     # (..., 3) pattern-resolved material color
    ambient,           # (...,)
    diffuse,           # (...,)
    specular,          # (...,)
    shininess,         # (...,)
    light_position,    # (3,) or (..., 3)
    light_intensity,   # (3,) or (..., 3)
    point,             # (..., 3)
    eyev,              # (..., 3)
    normalv,           # (..., 3)
    in_shadow,         # (...,) bool
):
    effective = surface_color * light_intensity
    lightv = normalize(light_position - point)

    amb = effective * ambient[..., None]

    ldn = dot(lightv, normalv)
    lit = (~in_shadow) & (ldn >= 0.0)

    diff = effective * (diffuse * ldn)[..., None]
    diff = jnp.where(lit[..., None], diff, 0.0)

    reflectv = reflect(-lightv, normalv)
    rde = dot(reflectv, eyev)
    spec_on = lit & (rde > 0.0)
    # Guard pow against negative bases (gradient safety); masked out anyway.
    factor = jnp.where(spec_on, jnp.maximum(rde, 1e-30), 1.0) ** shininess
    spec = light_intensity * (specular * factor)[..., None]
    spec = jnp.where(spec_on[..., None], spec, 0.0)

    return amb + diff + spec
