"""Probe 5: sweep-layout shootout at S=512, measuring per-pair cost.

 A) chunked: spheres on sublanes, rays on lanes  [8,B] ops   (current kernel)
 B) scalar loop, table in SMEM, unroll 8, rays (16,128)
 C) MXU-disc: disc/h via 2 matmuls, VPU tail, rays on lanes
All run DEPTH=1 (pure sweep), n_cells scaled so rays ~= 512K.
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 512
T_MIN, T_MAX = 1e-3, 1e4


def timeit(f, args, n=10):
    out = f(*args)
    jax.block_until_ready(out)

    @jax.jit
    def bench(*a):
        def step(c, _):
            o = f(a[0] + c * 0.0, *a[1:])
            first = o[0] if isinstance(o, (tuple, list)) else o
            return jnp.sum(first) * 0.0 + 1e-30, None
        tot, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
        return tot
    tot = bench(*args)
    jax.block_until_ready(tot)
    t0 = time.time()
    tot = bench(*args)
    float(tot)
    return (time.time() - t0) / n


def main():
    print("backend:", jax.default_backend())
    np.random.seed(0)
    tab = np.zeros((S, 8), np.float32)
    tab[:, :3] = np.random.randn(S, 3) * 4
    tab[:, 3] = 0.4
    tab[:, 4] = (tab[:, :3] ** 2).sum(1) - 0.16
    tabj = jnp.asarray(tab)

    R = 512 * 1024

    # ---------- A: chunked [8, B]
    BL = 2048
    def ka(tb_ref, o_ref, d_ref, t_ref):
        ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
        dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
        ddo = dx * ox + dy * oy + dz * oz
        a = dx * dx + dy * dy + dz * dz
        osq = ox * ox + oy * oy + oz * oz
        inv_a = 1.0 / a
        B = ox.shape[1]
        def chunk(ci, best):
            tb = tb_ref[pl.ds(ci * 8, 8), :]
            cx, cy, cz, k = tb[:, 0:1], tb[:, 1:2], tb[:, 2:3], tb[:, 4:5]
            dc = cx * dx + cy * dy + cz * dz
            oc = cx * ox + cy * oy + cz * oz
            h = ddo - dc
            c2 = osq - 2.0 * oc + k
            disc = h * h - a * c2
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (-h - sq) * inv_a
            t2 = (-h + sq) * inv_a
            ok = disc >= 0.0
            t = jnp.where(ok & (t1 > T_MIN) & (t1 < T_MAX), t1,
                          jnp.where(ok & (t2 > T_MIN) & (t2 < T_MAX), t2, T_MAX))
            return jnp.minimum(best, t)
        best = jax.lax.fori_loop(0, S // 8, chunk,
                                 (ox * 0.0 + T_MAX) * jnp.ones((8, 1), jnp.float32))
        t_ref[:] = jnp.min(best, axis=0, keepdims=True)
    o3 = jnp.asarray(np.random.randn(3, R) * 0.1, jnp.float32)
    d3 = jnp.asarray(np.random.randn(3, R), jnp.float32)
    fa = pl.pallas_call(
        ka, grid=(R // BL,),
        in_specs=[pl.BlockSpec((S, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, BL), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32))
    dt = timeit(fa, (tabj, o3, d3))
    print(f"A chunked:      {dt*1e3:7.2f} ms  {R*S/dt/1e9:6.1f} G pairs/s")

    # ---------- B: SMEM scalar loop, unroll 8, rays (16,128)
    SL = 16
    def kb(tb_ref, o_ref, d_ref, t_ref):
        ox, oy, oz = o_ref[0:SL, :], o_ref[SL:2*SL, :], o_ref[2*SL:3*SL, :]
        dx, dy, dz = d_ref[0:SL, :], d_ref[SL:2*SL, :], d_ref[2*SL:3*SL, :]
        ddo = dx * ox + dy * oy + dz * oz
        a = dx * dx + dy * dy + dz * dz
        osq = ox * ox + oy * oy + oz * oz
        inv_a = 1.0 / a
        def chunk(ci, best):
            for u in range(8):
                si = ci * 8 + u
                cx = tb_ref[si, 0]
                cy = tb_ref[si, 1]
                cz = tb_ref[si, 2]
                k = tb_ref[si, 4]
                dc = cx * dx + cy * dy + cz * dz
                oc = cx * ox + cy * oy + cz * oz
                h = ddo - dc
                c2 = osq - 2.0 * oc + k
                disc = h * h - a * c2
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t1 = (-h - sq) * inv_a
                t2 = (-h + sq) * inv_a
                ok = disc >= 0.0
                t = jnp.where(ok & (t1 > T_MIN) & (t1 < T_MAX), t1,
                              jnp.where(ok & (t2 > T_MIN) & (t2 < T_MAX), t2, T_MAX))
                best = jnp.minimum(best, t)
            return best
        best = jax.lax.fori_loop(0, S // 8, chunk, ox * 0.0 + T_MAX)
        t_ref[:] = best
    o2 = jnp.asarray(np.random.randn(3 * SL, R // SL) * 0.1, jnp.float32)
    d2 = jnp.asarray(np.random.randn(3 * SL, R // SL), jnp.float32)
    fb = pl.pallas_call(
        kb, grid=(R // (SL * 128),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((3 * SL, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((3 * SL, 128), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SL, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SL, R // SL), jnp.float32))
    dt = timeit(fb, (tabj, o2, d2))
    print(f"B smem-unroll8: {dt*1e3:7.2f} ms  {R*S/dt/1e9:6.1f} G pairs/s")

    # ---------- C: MXU disc + h, VPU tail, rays on lanes
    # F features per ray (K=16 padded): see notes. disc = G @ Fr ; h = G2 @ Fr2
    def kc(g_ref, o_ref, d_ref, f_ref, t_ref):
        # f_ref: [16, B] ray features precomputed in-kernel would be ~20 ops;
        # here passed in to measure the matmul+tail cost shape only.
        feats = f_ref[:]
        disc_h = jax.lax.dot_general(
            g_ref[:], feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [2S, B] (disc rows then h rows)
        disc = disc_h[0:S, :]
        h = disc_h[S:2*S, :]
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = -h - sq
        t2 = -h + sq
        ok = disc >= 0.0
        t = jnp.where(ok & (t1 > T_MIN) & (t1 < T_MAX), t1,
                      jnp.where(ok & (t2 > T_MIN) & (t2 < T_MAX), t2, T_MAX))
        t_ref[:] = jnp.min(t, axis=0, keepdims=True)
    BL2 = 512
    G = jnp.asarray(np.random.randn(2 * S, 16) * 0.1, jnp.float32)
    feats = jnp.asarray(np.random.randn(16, R) * 0.1, jnp.float32)
    fc = pl.pallas_call(
        kc, grid=(R // BL2,),
        in_specs=[pl.BlockSpec((2 * S, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, BL2), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, BL2), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, BL2), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BL2), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32))
    dt = timeit(fc, (G, o3, d3, feats))
    print(f"C mxu-disc:     {dt*1e3:7.2f} ms  {R*S/dt/1e9:6.1f} G pairs/s  (f32 default prec)")


if __name__ == "__main__":
    main()
