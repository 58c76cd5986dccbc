"""Texture evaluation: constant / image / checker / noise
(ray_gen.glsl:182-243).

A texture reference is a (prop_type, index) pair.  Evaluation is branchless:
each enabled texture family is evaluated for all rays and the result is
mask-selected.  Families a scene doesn't use are compiled out entirely via
the static `TexFlags` (XLA specialization replaces the reference's
count-guarded dynamic branches).

Image textures replicate the reference's sampler exactly: NEAREST filtering
with REPEAT wrap (vulkano SamplerCreateInfo::default + Repeat,
render_engine.rs:241-247) of R8G8B8A8_SRGB texels — i.e. one texel gather
plus a 256-entry sRGB→linear LUT lookup.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..models.compile import (
    MAT_PROP_CHECKER,
    MAT_PROP_IMAGE,
    MAT_PROP_NOISE,
    MAT_PROP_RGB,
)
from . import perlin


class TexFlags(NamedTuple):
    """Static per-scene texture/material-family usage; drives XLA
    specialization (families a scene never uses are compiled out)."""

    has_image: bool
    has_checker: bool
    has_noise: bool
    has_emissive: bool = True

    @staticmethod
    def for_scene(cs) -> "TexFlags":
        # `cs` is a models.compile.CompiledScene (host side, pre-device).
        from ..models.compile import MAT_TYPE_DIFFUSE_LIGHT as _L

        return TexFlags(
            has_image=bool(np.prod(cs.atlas.shape[1:3]) > 1),
            has_checker=bool(len(cs.checker_scale) > 0 and cs.checker_scale.any()),
            has_noise=bool(len(cs.noise_scale) > 0 and cs.noise_scale.any()),
            has_emissive=bool(
                (cs.tri_mat_type == _L).any() or (cs.sph_mat_type == _L).any()
            ),
        )


def srgb_u8_to_linear_lut() -> np.ndarray:
    """256-entry sRGB-decode table (hardware R8G8B8A8_SRGB semantics)."""
    c = np.arange(256, dtype=np.float64) / 255.0
    lin = np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)
    return lin.astype(np.float32)


def sample_image_nearest(atlas, atlas_wh, srgb_lut, index, u, v):
    """Nearest/repeat sample of image `index` at (u, v).  atlas:
    [NI, AH, AW, 3] uint8; returns [R, 3] linear float32."""
    wh = atlas_wh[index]               # [R, 2]
    w = wh[..., 0].astype(jnp.float32)
    h = wh[..., 1].astype(jnp.float32)
    # Repeat wrap of normalized coords, then texel floor (nearest).
    x = jnp.floor((u % 1.0) * w).astype(jnp.int32)
    y = jnp.floor((v % 1.0) * h).astype(jnp.int32)
    x = jnp.clip(x, 0, wh[..., 0] - 1)
    y = jnp.clip(y, 0, wh[..., 1] - 1)
    texel = atlas[index, y, x]         # [R, 3] uint8
    return srgb_lut[texel.astype(jnp.int32)]


def eval_basic(scene, flags: TexFlags, ptype, pindex, hit_p, hit_u, hit_v):
    """Constant / image / noise evaluation (ray_gen.glsl:184-212).
    ptype, pindex: [R] int32; hit_p: [R,3]; returns [R,3]."""
    R = ptype.shape[0]
    out = jnp.zeros((R, 3), jnp.float32)

    n_rgb = scene.const_colours.shape[0]
    rgb_idx = jnp.clip(pindex, 0, n_rgb - 1)
    rgb = scene.const_colours[rgb_idx]
    out = jnp.where(((ptype == MAT_PROP_RGB) & (pindex < scene.n_const))[:, None], rgb, out)

    if flags.has_image:
        img_idx = jnp.clip(pindex, 0, scene.atlas.shape[0] - 1)
        img = sample_image_nearest(
            scene.atlas, scene.atlas_wh, scene.srgb_lut, img_idx, hit_u, hit_v
        )
        out = jnp.where(
            ((ptype == MAT_PROP_IMAGE) & (pindex < scene.n_image))[:, None], img, out
        )

    if flags.has_noise:
        nz_idx = jnp.clip(pindex, 0, scene.noise_scale.shape[0] - 1)
        scale = scene.noise_scale[nz_idx]
        marble = 0.5 * (
            1.0 + jnp.sin(scale * hit_p[..., 2] + 10.0 * perlin.turbulence(hit_p, 7))
        )
        out = jnp.where(
            ((ptype == MAT_PROP_NOISE) & (pindex < scene.n_noise))[:, None],
            marble[:, None] * jnp.ones((1, 3), jnp.float32),
            out,
        )

    return out


def eval_property(scene, flags: TexFlags, ptype, pindex, hit_p, hit_u, hit_v):
    """Full material-property evaluation incl. one checker indirection
    (ray_gen.glsl:214-243)."""
    out = eval_basic(scene, flags, ptype, pindex, hit_p, hit_u, hit_v)

    if flags.has_checker:
        ck_idx = jnp.clip(pindex, 0, scene.checker_scale.shape[0] - 1)
        inv_scale = 1.0 / scene.checker_scale[ck_idx]
        xi = jnp.floor(inv_scale * hit_p[..., 0]).astype(jnp.int32)
        yi = jnp.floor(inv_scale * hit_p[..., 1]).astype(jnp.int32)
        zi = jnp.floor(inv_scale * hit_p[..., 2]).astype(jnp.int32)
        is_even = (xi + yi + zi) % 2 == 0

        even = scene.checker_even[ck_idx]  # [R,2]
        odd = scene.checker_odd[ck_idx]
        even_val = eval_basic(
            scene, flags, even[:, 0], even[:, 1], hit_p, hit_u, hit_v
        )
        odd_val = eval_basic(scene, flags, odd[:, 0], odd[:, 1], hit_p, hit_u, hit_v)
        ck_val = jnp.where(is_even[:, None], even_val, odd_val)
        out = jnp.where(
            ((ptype == MAT_PROP_CHECKER) & (pindex < scene.n_checker))[:, None],
            ck_val,
            out,
        )

    return out
