"""Counter-free per-ray RNG — exact port of the reference's device hash
(common.glsl:246-261) vectorized over uint32 state arrays.

The core generator is pcg32i with increment 1:
    state' = state * 747796405 + 1
    word   = ((state' >> ((state' >> 28) + 4)) ^ state') * 277803737
    out    = (word >> 22) ^ word                (as float / 2^32-1)

Each ray carries one uint32 state.  Rejection-sampling loops in the
reference (randomUnitVec3, common.glsl:305-313) are replaced by exact
closed-form samplers drawing the same *distribution* (documented deviation:
identical distribution, different RNG consumption, so images agree in
expectation rather than bitwise — bitwise parity is impossible anyway since
the reference interleaves a variable number of draws per pixel sample).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MUL = np.uint32(747796405)
_INC = np.uint32(1)
_OUT_MUL = np.uint32(277803737)
_U32_MAX_F = np.float32(4294967295.0)

TWO_PI = np.float32(2.0 * np.pi)
PI_OVER_2 = np.float32(np.pi / 2.0)
PI_OVER_4 = np.float32(np.pi / 4.0)


def init_rng(sample_batch, sample_index, py, px, resolution_x, resolution_y, spp):
    """Per-(pixel, sample) seed.

    The reference seeds one sequential stream per pixel with the linear pixel
    index (common.glsl:246-248); a vectorized wavefront needs one stream per
    sample, so the linear index is extended with the sample id:
        seed = ((batch * spp + sample) * res_y + py) * res_x + px
    """
    b = jnp.uint32(sample_batch)
    s = jnp.asarray(sample_index, jnp.uint32)
    return (
        (b * jnp.uint32(spp) + s) * jnp.uint32(resolution_y) + jnp.asarray(py, jnp.uint32)
    ) * jnp.uint32(resolution_x) + jnp.asarray(px, jnp.uint32)


def step_rng(state):
    return state * _MUL + _INC


def _u32_to_f32(word):
    """Exact uint32 → float32 convert, written without the direct cast.

    Mosaic (Pallas TPU) does not support the uint32→f32 convert; splitting
    into two exact 16-bit halves gives the identical single-rounding result
    (hi*65536 is exact, lo is exact, one rounded add = round-to-nearest of
    the full value) so XLA and in-kernel paths agree bitwise."""
    hi = (word >> np.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    lo = (word & np.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def random_float(state):
    """Returns (new_state, float in [0, 1])."""
    state = step_rng(state)
    word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) * _OUT_MUL
    word = (word >> np.uint32(22)) ^ word
    return state, _u32_to_f32(word) / _U32_MAX_F


def random_vec2(state):
    state, a = random_float(state)
    state, b = random_float(state)
    return state, jnp.stack([a, b], axis=-1)


def random_vec3(state):
    state, a = random_float(state)
    state, b = random_float(state)
    state, c = random_float(state)
    return state, jnp.stack([a, b, c], axis=-1)


def random_unit_vec3(state):
    """Uniform direction on the unit sphere (closed form; replaces the
    rejection loop of common.glsl:305-313 with the same distribution)."""
    state, u1 = random_float(state)
    state, u2 = random_float(state)
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return state, jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def random_cosine_direction(state):
    """Cosine-weighted hemisphere about +z (common.glsl:336-346, exact)."""
    state, r1 = random_float(state)
    state, r2 = random_float(state)
    phi = TWO_PI * r1
    sq = jnp.sqrt(r2)
    x = jnp.cos(phi) * sq
    y = jnp.sin(phi) * sq
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - r2))
    return state, jnp.stack([x, y, z], axis=-1)


def sample_uniform_disk_concentric(state):
    """Concentric disk mapping (common.glsl:353-373, exact port)."""
    state, u = random_vec2(state)
    uo = 2.0 * u - 1.0
    ux, uy = uo[..., 0], uo[..., 1]
    degenerate = (ux == 0.0) & (uy == 0.0)
    abs_x, abs_y = jnp.abs(ux), jnp.abs(uy)
    x_major = abs_x > abs_y
    r = jnp.where(x_major, ux, uy)
    safe = lambda num, den: num / jnp.where(den == 0.0, 1.0, den)
    theta = jnp.where(
        x_major,
        PI_OVER_4 * safe(uy, ux),
        PI_OVER_2 - PI_OVER_4 * safe(ux, uy),
    )
    out = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return state, jnp.where(degenerate[..., None], 0.0, out)


def sample_square_stratified(state, si, sj, recip_sqrt_spp):
    """Jittered offset inside sub-pixel cell (si, sj) (common.glsl:377-381)."""
    state, rx = random_float(state)
    state, ry = random_float(state)
    px = (si + rx) * recip_sqrt_spp - 0.5
    py = (sj + ry) * recip_sqrt_spp - 0.5
    return state, jnp.stack([px, py], axis=-1)


def sample_triangle_uniform(state, p0, p1, p2):
    """Uniform point on a triangle (common.glsl:383-394, exact port)."""
    state, r = random_vec2(state)
    rx, ry = r[..., 0], r[..., 1]
    flip = rx + ry > 1.0
    rx = jnp.where(flip, 1.0 - rx, rx)
    ry = jnp.where(flip, 1.0 - ry, ry)
    return state, p0 + rx[..., None] * (p1 - p0) + ry[..., None] * (p2 - p0)


# ---------------------------------------------------------------------------
# V3 (component-wise) sampler variants for the padding-free hot path.

def random_unit_v3(state):
    """Uniform direction on the unit sphere as V3 of [R] components."""
    from .vec3 import V3

    state, u1 = random_float(state)
    state, u2 = random_float(state)
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return state, V3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def random_cosine_v3(state):
    """Cosine-weighted hemisphere about +z (common.glsl:336-346)."""
    from .vec3 import V3

    state, r1 = random_float(state)
    state, r2 = random_float(state)
    phi = TWO_PI * r1
    sq = jnp.sqrt(r2)
    return state, V3(
        jnp.cos(phi) * sq, jnp.sin(phi) * sq,
        jnp.sqrt(jnp.maximum(0.0, 1.0 - r2)),
    )


def sample_triangle_uniform_v3(state, p0, p1, p2):
    """Uniform point on a triangle, V3 in / V3 out (common.glsl:383-394)."""
    from .vec3 import V3

    state, rx = random_float(state)
    state, ry = random_float(state)
    flip = rx + ry > 1.0
    rx = jnp.where(flip, 1.0 - rx, rx)
    ry = jnp.where(flip, 1.0 - ry, ry)
    return state, V3(
        p0.x + rx * (p1.x - p0.x) + ry * (p2.x - p0.x),
        p0.y + rx * (p1.y - p0.y) + ry * (p2.y - p0.y),
        p0.z + rx * (p1.z - p0.z) + ry * (p2.z - p0.z),
    )


def sample_disk_concentric_xy(state):
    """Concentric disk sample as two [R] components (no [R,2] temp)."""
    state, u1 = random_float(state)
    state, u2 = random_float(state)
    ux = 2.0 * u1 - 1.0
    uy = 2.0 * u2 - 1.0
    degenerate = (ux == 0.0) & (uy == 0.0)
    x_major = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(x_major, ux, uy)
    safe = lambda num, den: num / jnp.where(den == 0.0, 1.0, den)
    theta = jnp.where(
        x_major,
        PI_OVER_4 * safe(uy, ux),
        PI_OVER_2 - PI_OVER_4 * safe(ux, uy),
    )
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    zero = jnp.float32(0.0)
    return state, jnp.where(degenerate, zero, x), jnp.where(degenerate, zero, y)


def random_gaussian(state):
    """Box-Muller Gaussian pair (common.glsl:264-271, exact port).

    Present for completeness with the reference's device library; the
    reference itself only documents it for Gaussian-filter antialiasing and
    never calls it at runtime.
    """
    state, u1 = random_float(state)
    state, u2 = random_float(state)
    u1 = jnp.maximum(1e-38, u1)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = TWO_PI * u2
    return state, r * jnp.cos(theta), r * jnp.sin(theta)
