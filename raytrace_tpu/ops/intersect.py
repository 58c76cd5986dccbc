"""Ray-triangle intersection (Möller–Trumbore) over flat wavefronts.

Replaces `traceRayEXT` + the driver BVH (ray_gen.glsl:467-478) for the
brute-force path: every ray is tested against every (world-space) triangle
in VMEM-sized chunks with a running closest-hit reduction.  The BVH path
(ops/bvh.py) uses the same per-triangle test on leaf bundles.

Barycentric convention matches VK_KHR: hit attribs (u, v) with
position = v0*(1-u-v) + v1*u + v2*v.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

T_MIN = 0.001   # ray_gen.glsl:579
T_MAX = 10000.0 # ray_gen.glsl:580


class Hit(NamedTuple):
    t: jnp.ndarray       # [R] hit distance (T_MAX where missed)
    tri: jnp.ndarray     # [R] triangle id (-1 where missed)
    u: jnp.ndarray       # [R]
    v: jnp.ndarray       # [R]

    @property
    def missed(self):
        return self.tri < 0


def moller_trumbore(o, d, v0, e1, e2, t_min=T_MIN, t_max=T_MAX):
    """Batched intersection test.

    o, d: [..., 3]; v0, e1, e2: [..., 3] broadcast-compatible with rays.
    Returns (t, u, v, valid).
    """
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (det != 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return t, u, v, valid


def intersect_brute_force(o, d, tri_p, active=None, chunk=2048,
                          t_min=T_MIN, t_max=T_MAX) -> Hit:
    """Closest hit of rays [R,3] against all triangles tri_p [T,3,3].

    T must be a multiple of `chunk` (the compiler pads the soup; callers pick
    a chunk that divides the padded count).  Padding triangles are
    all-zero → det == 0 → never hit.
    """
    R = o.shape[0]
    T = tri_p.shape[0]
    if T % chunk != 0:
        chunk = T  # fall back to a single chunk for odd sizes
    n_chunks = T // chunk

    v0 = tri_p[:, 0, :]
    e1 = tri_p[:, 1, :] - tri_p[:, 0, :]
    e2 = tri_p[:, 2, :] - tri_p[:, 0, :]

    init = Hit(
        t=jnp.full((R,), t_max, jnp.float32),
        tri=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
    )

    def body(c, best):
        s = c * chunk
        cv0 = jax.lax.dynamic_slice_in_dim(v0, s, chunk)
        ce1 = jax.lax.dynamic_slice_in_dim(e1, s, chunk)
        ce2 = jax.lax.dynamic_slice_in_dim(e2, s, chunk)
        # [R, C] tests.
        t, u, v, valid = moller_trumbore(
            o[:, None, :], d[:, None, :],
            cv0[None, :, :], ce1[None, :, :], ce2[None, :, :],
            t_min, t_max,
        )
        t = jnp.where(valid, t, t_max)
        arg = jnp.argmin(t, axis=1)                      # [R]
        rows = jnp.arange(R)
        tc, uc, vc = t[rows, arg], u[rows, arg], v[rows, arg]
        better = tc < best.t
        return Hit(
            t=jnp.where(better, tc, best.t),
            tri=jnp.where(better, (s + arg).astype(jnp.int32), best.tri),
            u=jnp.where(better, uc, best.u),
            v=jnp.where(better, vc, best.v),
        )

    best = jax.lax.fori_loop(0, n_chunks, body, init)
    if active is not None:
        best = Hit(
            t=jnp.where(active, best.t, t_max),
            tri=jnp.where(active, best.tri, -1),
            u=best.u,
            v=best.v,
        )
    return best
