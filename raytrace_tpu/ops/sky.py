"""Background colour (ray_gen.glsl:442-455).

QUIRK preserved: the vertical-gradient sky ignores the ray direction — the
blend `a = 0.5*(dir.y+1)` is computed but unused; the shader returns
mix(top, bottom, factor) with the constant factor, so a gradient sky is a
solid colour.  We replicate for pixel parity (SURVEY.md §8 quirk #1).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.compile import SKY_SOLID, SKY_VERTICAL_GRADIENT


def background_colour(scene, ray_d):
    """scene: SceneArrays (engine.scene); ray_d: [R,3] (unused, see quirk).
    Returns [R,3]."""
    R = ray_d.shape[0]
    if int(scene.sky_type) == SKY_SOLID:
        col = scene.sky_solid
    elif int(scene.sky_type) == SKY_VERTICAL_GRADIENT:
        f = scene.sky_factor
        col = scene.sky_top * (1.0 - f) + scene.sky_bottom * f
    else:
        col = jnp.zeros(3, jnp.float32)
    return jnp.broadcast_to(col, (R, 3))
