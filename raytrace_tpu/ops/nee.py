"""Next-event estimation: alias-table light sampling, PDF evaluation and the
50/50 mixture choice (ray_gen.glsl:252-326).

QUIRK preserved (SURVEY.md §8 #2): the sampled light triangle is transformed
by the *hit instance's* objectToWorld matrix, not the light's own — correct
only when they coincide (identity in all shipped scenes), but replicated for
pixel parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import rng, vec3
from .materials import COSINE_PDF, LIGHT_PDF, NO_PDF, SPHERE_PDF
from .vec3 import V3

# np scalar (not a jnp array): inside Pallas kernels a jnp module constant
# becomes a captured traced const, which pallas_call rejects.
import numpy as _np

PI = _np.float32(_np.pi)


def choose_mixture_pdf(state, mat_pdf_type, has_lights: bool):
    """50/50 light/material choice (ray_gen.glsl:317-326).  `has_lights` is
    static per scene: without lights the material PDF is used directly and
    no RNG is consumed (matching the reference's early return)."""
    if not has_lights:
        return state, mat_pdf_type
    state, r = rng.random_float(state)
    return state, jnp.where(r < 0.5, LIGHT_PDF, mat_pdf_type).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Component-wise (V3) NEE for the padding-free hot path.


class LightSampleV3(NamedTuple):
    position: V3
    normal: V3


def sample_light_sources_v3(state, scene, o2w_cols):
    """V3 light sampling; o2w_cols = 12 [R] arrays of the HIT instance's
    objectToWorld (quirk #2, ray_gen.glsl:252-281)."""
    state, u1 = rng.random_float(state)
    state, u2 = rng.random_float(state)

    n = scene.light_count.astype(jnp.float32)
    n_idx = jnp.maximum(scene.light_count - 1, 0)
    i = jnp.minimum((u1 * n).astype(jnp.int32), n_idx)
    use_alias = u2 >= scene.light_prob[i]
    tri_index = jnp.where(use_alias, scene.light_alias[i], i)

    row = scene.light_tri_packed[tri_index]        # [R,16]: p0 p1 p2 pad
    p0 = V3(row[:, 0], row[:, 1], row[:, 2])
    p1 = V3(row[:, 3], row[:, 4], row[:, 5])
    p2 = V3(row[:, 6], row[:, 7], row[:, 8])
    w0 = vec3.mat34_apply_point(o2w_cols, p0)
    w1 = vec3.mat34_apply_point(o2w_cols, p1)
    w2 = vec3.mat34_apply_point(o2w_cols, p2)

    state, position = rng.sample_triangle_uniform_v3(state, w0, w1, w2)
    nrm = vec3.normalize(vec3.cross(w1 - w0, w2 - w0))
    return state, LightSampleV3(position=position, normal=nrm)


def pdf_value_v3(pdf_type, direction: V3, normal: V3, light: LightSampleV3,
                 total_area):
    """getPdfValue on V3 (ray_gen.glsl:283-301)."""
    dn = vec3.norm(direction)
    inv = (1.0 / jnp.where(dn == 0.0, 1.0, dn))
    unit = V3(direction.x * inv, direction.y * inv, direction.z * inv)

    sphere = 1.0 / (4.0 * PI)
    cosine = jnp.maximum(0.0, vec3.dot(unit, normal) / PI)

    dist_sq = vec3.dot(direction, direction)
    cos_l = jnp.abs(-vec3.dot(light.normal, unit))
    light_pdf = jnp.where(
        cos_l <= 0.0, 0.0,
        (dist_sq / jnp.where(cos_l <= 0.0, 1.0, cos_l)) * (1.0 / total_area),
    )

    out = jnp.zeros_like(cosine)
    out = jnp.where(pdf_type == SPHERE_PDF, sphere, out)
    out = jnp.where(pdf_type == COSINE_PDF, cosine, out)
    out = jnp.where(pdf_type == LIGHT_PDF, light_pdf, out)
    return out


def make_onb_v3(n: V3):
    """ONB about n (common.glsl:187-197)."""
    axis2 = vec3.normalize(n)
    pick_y = jnp.abs(axis2.x) > 0.9
    zero = jnp.zeros_like(axis2.x)
    one = jnp.ones_like(axis2.x)
    a = V3(jnp.where(pick_y, zero, one), jnp.where(pick_y, one, zero), zero)
    axis1 = vec3.normalize(vec3.cross(axis2, a))
    axis0 = vec3.cross(axis2, axis1)
    return axis0, axis1, axis2


def gen_scatter_direction_v3(state, pdf_type, hit_p: V3, normal: V3,
                             light: LightSampleV3):
    """genScatterDirection on V3 (ray_gen.glsl:303-315)."""
    state, sphere_dir = rng.random_unit_v3(state)
    state, cl = rng.random_cosine_v3(state)
    a0, a1, a2 = make_onb_v3(normal)
    cosine_dir = V3(
        cl.x * a0.x + cl.y * a1.x + cl.z * a2.x,
        cl.x * a0.y + cl.y * a1.y + cl.z * a2.y,
        cl.x * a0.z + cl.y * a1.z + cl.z * a2.z,
    )
    light_dir = light.position - hit_p

    zero = vec3.zeros_like(sphere_dir)
    out = vec3.where(pdf_type == SPHERE_PDF, sphere_dir, zero)
    out = vec3.where(pdf_type == COSINE_PDF, cosine_dir, out)
    out = vec3.where(pdf_type == LIGHT_PDF, light_dir, out)
    return state, out
