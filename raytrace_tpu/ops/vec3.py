"""Component-wise vec3 for the hot path.

TPU tiles the two minor dimensions of every array to (8, 128); a [R, 3]
f32 array therefore pads its last dimension 3 -> 128, a 42x memory and
bandwidth blowup on every elementwise op (confirmed by XLA's allocation
dump: f32[9437184,1]{T(8,128)} with "128.0x expansion").  1-D [R] arrays
tile as T(1024) with no padding at all — so the wavefront keeps every
vector as three [R] components.

V3 is a pytree (NamedTuple), so it carries through jit/while_loop/scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic --------------------------------------------------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def splat(c, like=None):
    """Constant [3]-like → V3 of scalars (broadcast against [R])."""
    return V3(jnp.float32(c[0]), jnp.float32(c[1]), jnp.float32(c[2]))


def from_rows(a):
    """[R, 3] → V3 of [R] (layout change; use only at boundaries)."""
    return V3(a[..., 0], a[..., 1], a[..., 2])


def to_rows(v: V3):
    """V3 → [R, 3] (layout change; use only at boundaries)."""
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def to_3r(v: V3):
    """V3 → [3, R] (for the Pallas kernels; major-axis stack, no relayout)."""
    return jnp.stack([v.x, v.y, v.z], axis=0)


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def norm(v: V3):
    return jnp.sqrt(dot(v, v))


def normalize(v: V3, eps=1e-20) -> V3:
    inv = 1.0 / jnp.maximum(norm(v), eps)
    return V3(v.x * inv, v.y * inv, v.z * inv)


def where(mask, a: V3, b: V3) -> V3:
    return V3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def zeros_like(v: V3) -> V3:
    return V3(jnp.zeros_like(v.x), jnp.zeros_like(v.y), jnp.zeros_like(v.z))


def reflect(i: V3, n: V3) -> V3:
    """GLSL reflect."""
    d = 2.0 * dot(i, n)
    return V3(i.x - d * n.x, i.y - d * n.y, i.z - d * n.z)


def refract(i: V3, n: V3, eta) -> V3:
    """GLSL refract (i, n unit); returns 0 on TIR."""
    cos_i = -dot(i, n)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    coef = eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0))
    out = V3(eta * i.x + coef * n.x, eta * i.y + coef * n.y, eta * i.z + coef * n.z)
    tir = k < 0.0
    zero = jnp.float32(0.0)
    return V3(
        jnp.where(tir, zero, out.x),
        jnp.where(tir, zero, out.y),
        jnp.where(tir, zero, out.z),
    )


def mat34_apply_point(m_cols, p: V3) -> V3:
    """m_cols: 12 [R] arrays (row-major 3x4): M p + t."""
    (m00, m01, m02, m03, m10, m11, m12, m13, m20, m21, m22, m23) = m_cols
    return V3(
        m00 * p.x + m01 * p.y + m02 * p.z + m03,
        m10 * p.x + m11 * p.y + m12 * p.z + m13,
        m20 * p.x + m21 * p.y + m22 * p.z + m23,
    )


def mat34_apply_vec(m_cols, v: V3) -> V3:
    (m00, m01, m02, _m03, m10, m11, m12, _m13, m20, m21, m22, _m23) = m_cols
    return V3(
        m00 * v.x + m01 * v.y + m02 * v.z,
        m10 * v.x + m11 * v.y + m12 * v.z,
        m20 * v.x + m21 * v.y + m22 * v.z,
    )


def mat34_apply_transposed_vec(m_cols, v: V3) -> V3:
    """n · M (inverse-transpose normal transform when M = world_to_object)."""
    (m00, m01, m02, _m03, m10, m11, m12, _m13, m20, m21, m22, _m23) = m_cols
    return V3(
        m00 * v.x + m10 * v.y + m20 * v.z,
        m01 * v.x + m11 * v.y + m21 * v.z,
        m02 * v.x + m12 * v.y + m22 * v.z,
    )
