"""Branchless material scatter + emission (ray_gen.glsl:328-440).

All four material families (lambertian / metal / dielectric / diffuse_light)
are evaluated for every ray and combined with masked selects — the
wavefront's TPU-native replacement for the reference's switch dispatch
(ray_gen.glsl:414-429).  RNG draws are unconditional, so every ray consumes
the same number of stream values per bounce regardless of material (streams
are per-ray, so this is statistically identical to the reference's
variable-consumption branches).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.compile import (
    MAT_TYPE_DIELECTRIC,
    MAT_TYPE_DIFFUSE_LIGHT,
    MAT_TYPE_LAMBERTIAN,
    MAT_TYPE_METAL,
)
from . import rng, textures

# PDF type tags (common.glsl:117-121).
NO_PDF = 0
SPHERE_PDF = 1
COSINE_PDF = 2
LIGHT_PDF = 3


class ScatterRecord(NamedTuple):
    is_scattered: jnp.ndarray   # [R] bool
    attenuation: jnp.ndarray    # [R,3]
    mat_pdf_type: jnp.ndarray   # [R] int32
    skip_pdf: jnp.ndarray       # [R] bool
    skip_dir: jnp.ndarray       # [R,3] next ray dir when skip_pdf


def reflect(i, n):
    return i - 2.0 * jnp.sum(i * n, axis=-1, keepdims=True) * n


def refract(i, n, eta):
    """GLSL refract: i, n unit; eta = n1/n2.  Returns 0 on TIR."""
    cos_i = -jnp.sum(i * n, axis=-1, keepdims=True)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    out = eta * i + (eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k < 0.0, 0.0, out)


def schlick_reflectance(cosine, refraction_index):
    """ray_gen.glsl:246-250."""
    r0 = (1.0 - refraction_index) / (1.0 + refraction_index)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def calculate_scatter(state, scene, flags, mat_type, mat_index,
                      hit_p, normal, front_face, hit_u, hit_v, world_ray_dir):
    """Vectorized calculateScatter (ray_gen.glsl:414-429).

    `normal` is the front-face-flipped shading normal; `world_ray_dir` is the
    incoming ray direction exactly as traced (possibly non-unit, matching
    gl_WorldRayDirectionEXT semantics for fuzzy-metal chains).
    Returns (new_state, ScatterRecord).
    """
    R = mat_type.shape[0]

    # Unconditional RNG draws (see module docstring).
    state, fuzz_unit = rng.random_unit_vec3(state)
    state, diel_u = rng.random_float(state)

    zero3 = jnp.zeros((R, 3), jnp.float32)

    # ---- lambertian (ray_gen.glsl:328-342)
    is_lamb = (mat_type == MAT_TYPE_LAMBERTIAN) & (mat_index < scene.n_lamb)
    li = jnp.clip(mat_index, 0, scene.lamb_albedo.shape[0] - 1)
    lamb_albedo = textures.eval_property(
        scene, flags, scene.lamb_albedo[li, 0], scene.lamb_albedo[li, 1],
        hit_p, hit_u, hit_v,
    )

    # ---- metal (ray_gen.glsl:344-364)
    is_metal = (mat_type == MAT_TYPE_METAL) & (mat_index < scene.n_metal)
    mi = jnp.clip(mat_index, 0, scene.metal_albedo.shape[0] - 1)
    metal_albedo = textures.eval_property(
        scene, flags, scene.metal_albedo[mi, 0], scene.metal_albedo[mi, 1],
        hit_p, hit_u, hit_v,
    )
    metal_fuzz = textures.eval_property(
        scene, flags, scene.metal_fuzz[mi, 0], scene.metal_fuzz[mi, 1],
        hit_p, hit_u, hit_v,
    )
    reflected = reflect(world_ray_dir, normal)
    metal_scatters = jnp.sum(reflected * normal, axis=-1) > 0.0
    from . import vec
    refl_unit = vec.normalize(reflected)
    metal_dir = refl_unit + metal_fuzz * fuzz_unit

    # ---- dielectric (ray_gen.glsl:366-399)
    is_diel = (mat_type == MAT_TYPE_DIELECTRIC) & (mat_index < scene.n_diel)
    di = jnp.clip(mat_index, 0, scene.diel_ri.shape[0] - 1)
    ref_idx = scene.diel_ri[di]
    ri = jnp.where(front_face, 1.0 / ref_idx, ref_idx)
    unit_dir = vec.normalize(world_ray_dir)
    cos_theta = jnp.minimum(jnp.sum(-unit_dir * normal, axis=-1), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    cannot_refract = (ri * sin_theta > 1.0) | (
        schlick_reflectance(cos_theta, ri) > diel_u
    )
    diel_dir = jnp.where(
        cannot_refract[:, None],
        reflect(unit_dir, normal),
        refract(unit_dir, normal, ri[:, None]),
    )

    # ---- combine
    is_scattered = (is_lamb | is_diel | (is_metal & metal_scatters))
    attenuation = jnp.where(
        is_lamb[:, None], lamb_albedo,
        jnp.where(is_metal[:, None], metal_albedo,
                  jnp.where(is_diel[:, None], jnp.ones((R, 3), jnp.float32), zero3)),
    )
    skip_pdf = is_metal | is_diel
    skip_dir = jnp.where(is_metal[:, None], metal_dir,
                         jnp.where(is_diel[:, None], diel_dir, zero3))
    mat_pdf_type = jnp.where(is_lamb, COSINE_PDF, NO_PDF).astype(jnp.int32)

    return state, ScatterRecord(
        is_scattered=is_scattered,
        attenuation=attenuation,
        mat_pdf_type=mat_pdf_type,
        skip_pdf=skip_pdf,
        skip_dir=skip_dir,
    )


def calculate_emission(scene, flags, mat_type, mat_index,
                       hit_p, front_face, hit_u, hit_v):
    """Diffuse-light emission, front faces only (ray_gen.glsl:401-412)."""
    is_light = (
        (mat_type == MAT_TYPE_DIFFUSE_LIGHT)
        & (mat_index < scene.n_light_mat)
        & front_face
    )
    ei = jnp.clip(mat_index, 0, scene.light_emit.shape[0] - 1)
    emit = textures.eval_property(
        scene, flags, scene.light_emit[ei, 0], scene.light_emit[ei, 1],
        hit_p, hit_u, hit_v,
    )
    return jnp.where(is_light[:, None], emit, 0.0)
