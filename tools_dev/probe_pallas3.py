"""Probe round 3: a miniature of the planned megakernel structure.

fori(depth) { cond(any_alive) { scalar-sphere sweep + one-hot fetch +
RNG + state update } } with raygen from program_id, plus int div/mod by
non-power-of-2 constants, plus exact u32->f32 split.
"""
import os
import time

import jax

USE_COND = os.environ.get("P3_COND", "1") == "1"
USE_FETCH = os.environ.get("P3_FETCH", "1") == "1"
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = int(__import__('os').environ.get('P3_S', 64))
P = 80          # fetch table prims
DEPTH = int(__import__('os').environ.get('P3_DEPTH', 6))
SPP = 9         # non-power-of-2 on purpose


def u32_to_f32_exact(w):
    hi = (w >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    lo = (w & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def rand_f(state):
    state = state * jnp.uint32(747796405) + jnp.uint32(1)
    w = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    w = (w >> jnp.uint32(22)) ^ w
    return state, u32_to_f32_exact(w) / jnp.float32(4294967295.0)


def kernel(sph_ref, rowsT_ref, rx_ref, tr_ref):
    cell = pl.program_id(0)
    lin = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128 + \
          jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    gid = cell * 1024 + lin
    # int div/mod by non-pow2 constant
    s = gid % SPP
    pix = gid // SPP
    px = pix % 31
    py = pix // 31

    state = (jnp.uint32(3) * jnp.uint32(SPP) + s.astype(jnp.uint32)) * jnp.uint32(97) \
        + py.astype(jnp.uint32) * jnp.uint32(31) + px.astype(jnp.uint32)

    ox = px.astype(jnp.float32) * 0.1
    oy = py.astype(jnp.float32) * 0.1
    nzero = ox * 0.0
    oz = nzero
    state, u = rand_f(state)
    dx = u - 0.5
    dy = nzero + 0.3
    dz = nzero + 1.0

    acc = nzero
    thr = nzero + 1.0
    alive = (nzero + 1.0).astype(jnp.int32)
    traced = nzero

    def bounce(_, carry):
        state, ox, oy, oz, dx, dy, dz, acc, thr, alive, traced = carry

        def do_body(args):
            state, ox, oy, oz, dx, dy, dz, acc, thr, alive, traced = args
            traced = traced + alive.astype(jnp.float32)
            a = dx * dx + dy * dy + dz * dz
            inv_a = 1.0 / a
            ddo = dx * ox + dy * oy + dz * oz
            osq = ox * ox + oy * oy + oz * oz

            def sph_body(si, c):
                bt, bid = c
                cx = sph_ref[si, 0]
                cy = sph_ref[si, 1]
                cz = sph_ref[si, 2]
                k = sph_ref[si, 4]
                dc = cx * dx + cy * dy + cz * dz
                oc = cx * ox + cy * oy + cz * oz
                h = ddo - dc
                c2 = osq - 2.0 * oc + k
                disc = h * h - a * c2
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t1 = (-h - sq) * inv_a
                t2 = (-h + sq) * inv_a
                t = jnp.where((disc >= 0.0) & (t1 > 1e-3), t1,
                              jnp.where((disc >= 0.0) & (t2 > 1e-3), t2, 1e4))
                better = t < bt
                return jnp.where(better, t, bt), jnp.where(better, si, bid)

            bt, bid = jax.lax.fori_loop(
                0, S, sph_body,
                (ox * 0.0 + 1e4, (ox * 0.0 - 1.0).astype(jnp.int32)))

            missed = bt >= 1e4
            acc2 = jnp.where((alive > 0) & missed, acc + thr * 0.5, acc)
            alive2 = alive * (1 - missed.astype(jnp.int32))

            # one-hot fetch of 8 slots for the winning prim (8 sub-matmuls)
            pid = jnp.maximum(bid, 0)
            if USE_FETCH:
                outs = []
                for kk in range(8):
                    pk = pid[kk:kk + 1, :]
                    io = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
                    oh = (io == pk).astype(jnp.float32)
                    outs.append(jax.lax.dot_general(
                        rowsT_ref[:], oh, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32))
                albedo = jnp.concatenate([o[2:3, :] for o in outs], axis=0)
            else:
                albedo = ox * 0.0 + 0.8

            state, u2 = rand_f(state)
            phi = jnp.float32(2 * np.pi) * u2
            ndx = jnp.cos(phi)
            ndy = jnp.sin(phi)
            px_ = ox + bt * dx
            py_ = oy + bt * dy
            pz_ = oz + bt * dz
            keep = alive2 > 0
            ox = jnp.where(keep, px_, ox)
            oy = jnp.where(keep, py_, oy)
            oz = jnp.where(keep, pz_, oz)
            dx = jnp.where(keep, ndx, dx)
            dy = jnp.where(keep, ndy, dy)
            thr = jnp.where(keep, thr * albedo, thr)
            return (state, ox, oy, oz, dx, dy, dz, acc2, thr, alive2, traced)

        args = (state, ox, oy, oz, dx, dy, dz, acc, thr, alive, traced)
        if not USE_COND:
            return do_body(args)
        n_alive = jnp.sum(alive)
        return jax.lax.cond(n_alive > 0, do_body, lambda a: a, args)

    out = jax.lax.fori_loop(0, DEPTH, bounce,
                            (state, ox, oy, oz, dx, dy, dz, acc, thr, alive, traced))
    rx_ref[:] = out[7]   # acc
    tr_ref[:] = out[10]  # traced


def _skip():
    raise SystemExit(0)

def main():
    print("backend:", jax.default_backend())
    np.random.seed(0)
    sph = np.zeros((S, 8), np.float32)
    sph[:, :3] = np.random.randn(S, 3) * 3
    sph[:, 3] = 0.5
    sph[:, 4] = (sph[:, :3] ** 2).sum(1) - 0.25
    rowsT = np.random.rand(8, P).astype(np.float32) * 0.9

    n_cells = int(__import__('os').environ.get('P3_CELLS', 16))
    t0 = time.time()
    f = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((S, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8 * n_cells, 128), jnp.float32),
            jax.ShapeDtypeStruct((8 * n_cells, 128), jnp.float32),
        ],
    )
    acc, tr = f(jnp.asarray(sph), jnp.asarray(rowsT))
    jax.block_until_ready(acc)
    print(f"compiled+ran in {time.time()-t0:.1f}s")
    print("acc mean", float(acc.mean()), "traced mean", float(tr.mean()))

    if __import__('os').environ.get('P3_NOINTERP'): _skip()
    # interpret-mode reference
    fi = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((S, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8 * n_cells, 128), jnp.float32),
            jax.ShapeDtypeStruct((8 * n_cells, 128), jnp.float32),
        ],
        interpret=True,
    )
    acc_i, tr_i = fi(jnp.asarray(sph), jnp.asarray(rowsT))
    da = float(jnp.max(jnp.abs(acc - acc_i)))
    dt_ = float(jnp.max(jnp.abs(tr - tr_i)))
    print(f"vs interpret: acc maxdiff {da:.3e}  traced maxdiff {dt_:.3e}")

    # timing: 100 iterations
    import functools
    t0 = time.time()
    for _ in range(20):
        acc, tr = f(jnp.asarray(sph), jnp.asarray(rowsT))
    jax.block_until_ready(acc)
    dt = (time.time() - t0) / 20
    rays = n_cells * 1024
    print(f"{dt*1e3:.2f} ms per call, {float(tr.sum())/dt/1e6:.1f} M ray-bounces/s")


if __name__ == "__main__":
    main()
