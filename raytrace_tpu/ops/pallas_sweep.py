"""Fused Pallas sphere-sweep kernel.

The XLA version of the dense sphere test (ops/spheres.intersect_spheres_world)
materializes ~10 [C, R] intermediates through HBM per bounce; with C=512
(final-one-weekend) that is several GB per iteration and dominates the
frame.  This kernel fuses the whole sweep — quadratic setup, both roots,
range tests and the running arg-min — inside VMEM: HBM traffic drops to
rays in (24 B/ray) + (t, id) out (8 B/ray), and the sweep becomes VPU
compute-bound.

Layout choices (see pallas_guide.md):
- rays ride the LANE axis: o/d arrive as [3, R] so a block is [3, B];
- spheres ride the SUBLANE axis in chunks of 8: the sphere table is
  [S, 8] f32 (c.xyz, r, k, pad3) and a chunk view is [8, 8] → broadcast
  against [1, B] ray rows gives [8, B] tiles, a perfect (8, 128) fit;
- the chunk loop is a fori over S/8 with VMEM-resident carry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import T_MAX, T_MIN

BLOCK = 2048  # rays per grid cell (lanes); multiple of 128


def _sweep_kernel(table_ref, o_ref, d_ref, t_ref, id_ref, *, n_chunks: int,
                  t_min: float, t_max: float):
    ox = o_ref[0:1, :]
    oy = o_ref[1:2, :]
    oz = o_ref[2:3, :]
    dx = d_ref[0:1, :]
    dy = d_ref[1:2, :]
    dz = d_ref[2:3, :]

    d_dot_o = dx * ox + dy * oy + dz * oz          # [1,B]
    a = dx * dx + dy * dy + dz * dz
    o_sq = ox * ox + oy * oy + oz * oz
    inv_a = 1.0 / jnp.where(a == 0.0, 1.0, a)

    B = ox.shape[1]

    def chunk(ci, carry):
        best_t, best_id = carry
        tb = table_ref[pl.ds(ci * 8, 8), :]        # [8,8]: cx cy cz r k . . .
        cx = tb[:, 0:1]                             # [8,1]
        cy = tb[:, 1:2]
        cz = tb[:, 2:3]
        r = tb[:, 3:4]
        k = tb[:, 4:5]

        dc = cx * dx + cy * dy + cz * dz            # [8,B]
        oc = cx * ox + cy * oy + cz * oz
        h = d_dot_o - dc
        c2 = o_sq - 2.0 * oc + k
        disc = h * h - a * c2
        ok = (disc >= 0.0) & (r > 0.0)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-h - sq) * inv_a
        t2 = (-h + sq) * inv_a
        t1_ok = ok & (t1 > t_min) & (t1 < t_max)
        t2_ok = ok & (t2 > t_min) & (t2 < t_max)
        t = jnp.where(t1_ok, t1, jnp.where(t2_ok, t2, t_max))  # [8,B]

        ids = ci * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
        better = t < best_t
        best_t = jnp.where(better, t, best_t)
        best_id = jnp.where(better, ids, best_id)
        return best_t, best_id

    init = (
        jnp.full((8, B), t_max, jnp.float32),
        jnp.full((8, B), -1, jnp.int32),
    )
    best_t, best_id = jax.lax.fori_loop(0, n_chunks, chunk, init)

    # Fold the 8 sublane candidates to one winner per lane.
    tmin_row = jnp.min(best_t, axis=0, keepdims=True)       # [1,B]
    is_win = best_t <= tmin_row
    id_masked = jnp.where(is_win, best_id, jnp.int32(2147483647))
    win_id = jnp.min(id_masked, axis=0, keepdims=True)
    win_id = jnp.where(tmin_row >= t_max, -1, win_id)

    t_ref[:] = tmin_row
    id_ref[:] = win_id


@functools.partial(jax.jit, static_argnames=("interpret",))
def sphere_sweep_pallas(table8, o3, d3, interpret=False):
    """table8: [S, 8] (S multiple of 8); o3/d3: [3, R] (R multiple of BLOCK).
    Returns (t [R], id [R])."""
    S = table8.shape[0]
    R = o3.shape[1]
    n_blocks = R // BLOCK

    kernel = functools.partial(
        _sweep_kernel, n_chunks=S // 8, t_min=float(T_MIN), t_max=float(T_MAX)
    )
    t, ids = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((S, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        interpret=interpret,
    )(table8, o3, d3)
    return t[0], ids[0]


def pad_table8(table5):
    """[S,5] world sphere table → [S_pad8, 8] for the kernel."""
    import numpy as np

    S = table5.shape[0]
    S8 = max(8, -(-S // 8) * 8)
    out = jnp.zeros((S8, 8), jnp.float32)
    out = out.at[:S, :5].set(table5)
    if S8 > S:
        out = out.at[S:, 4].set(3.0e37)  # padding k: never hits
    return out


def intersect_spheres_pallas(o, d, table8, active=None, interpret=False):
    """Drop-in closest-hit matching intersect_spheres_world's contract."""
    from .spheres import SphereHit

    R = o.shape[0]
    R_pad = max(BLOCK, -(-R // BLOCK) * BLOCK)
    o3 = jnp.zeros((3, R_pad), jnp.float32).at[:, :R].set(o.T)
    d3 = jnp.ones((3, R_pad), jnp.float32).at[:, :R].set(d.T)
    t, ids = sphere_sweep_pallas(table8, o3, d3, interpret=interpret)
    t = t[:R]
    ids = ids[:R]
    if active is not None:
        t = jnp.where(active, t, T_MAX)
        ids = jnp.where(active, ids, -1)
    return SphereHit(t=t, sph=ids)


def intersect_spheres_pallas_v3(o, d, table8, active=None, interpret=False):
    """V3 (component) entry: builds the [3, R] kernel inputs by stacking
    1-D components — no [R,3] transpose relayout."""
    import jax.numpy as _jnp

    from .spheres import SphereHit
    from .vec3 import to_3r

    R = o.x.shape[0]
    R_pad = max(BLOCK, -(-R // BLOCK) * BLOCK)
    o3 = to_3r(o)
    d3 = to_3r(d)
    if R_pad != R:
        o3 = _jnp.pad(o3, ((0, 0), (0, R_pad - R)))
        d3 = _jnp.pad(d3, ((0, 0), (0, R_pad - R)), constant_values=1.0)
    t, ids = sphere_sweep_pallas(table8, o3, d3, interpret=interpret)
    t = t[:R]
    ids = ids[:R]
    if active is not None:
        t = _jnp.where(active, t, T_MAX)
        ids = _jnp.where(active, ids, -1)
    return SphereHit(t=t, sph=ids)
