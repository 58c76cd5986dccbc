"""Probe 6: where do ~50ms/dispatch come from? Trivial kernels through the
same scan-chained timing harness, adding one suspect at a time."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CELLS = 512
N = 8


def timed(name, make_call, *args):
    f = make_call
    out = f(*args)
    jax.block_until_ready(out)

    @jax.jit
    def bench(*a):
        def step(c, _):
            o = f(a[0] + c * 0.0, *a[1:])
            first = o[0] if isinstance(o, (tuple, list)) else o
            return jnp.sum(first[:1, :1]) * 0.0, None
        tot, _ = jax.lax.scan(step, jnp.float32(0), None, length=N)
        return tot
    tot = bench(*args)
    jax.block_until_ready(tot)
    t0 = time.time()
    float(bench(*args))
    dt = (time.time() - t0) / N
    print(f"{name}: {dt*1e3:.2f} ms/dispatch")


def main():
    print("backend:", jax.default_backend())
    X = jnp.ones((8, 128), jnp.float32)
    sph = jnp.ones((512, 8), jnp.float32)
    prm = jnp.zeros((1, 16), jnp.float32)

    # 1. trivial copy kernel, VMEM only, grid 512
    def k1(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0
    f1 = pl.pallas_call(
        k1, grid=(N_CELLS,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_CELLS * 8, 128), jnp.float32))
    timed("1 trivial vmem", f1, X)

    # 2. + one SMEM input
    def k2(p_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] * p_ref[0, 0]
    f2 = pl.pallas_call(
        k2, grid=(N_CELLS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_CELLS * 8, 128), jnp.float32))
    timed("2 + smem param", f2, prm, X)

    # 3. + big SMEM table with scalar-loop reads (64 reads)
    def k3(tb_ref, x_ref, o_ref):
        def body(i, acc):
            return acc + tb_ref[i, 0] * x_ref[:]
        o_ref[:] = jax.lax.fori_loop(0, 64, body, x_ref[:] * 0.0)
    f3 = pl.pallas_call(
        k3, grid=(N_CELLS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_CELLS * 8, 128), jnp.float32))
    timed("3 + smem table loop", f3, sph, X)

    # 4. k3 but table read via full unrolled 512x4 scalar reads in 64 chunks
    def k4(tb_ref, x_ref, o_ref):
        def chunk(ci, acc):
            for u in range(8):
                si = ci * 8 + u
                acc = acc + (tb_ref[si, 0] + tb_ref[si, 1] + tb_ref[si, 2]
                             + tb_ref[si, 4]) * x_ref[:]
            return acc
        o_ref[:] = jax.lax.fori_loop(0, 64, chunk, x_ref[:] * 0.0)
    f4 = pl.pallas_call(
        k4, grid=(N_CELLS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_CELLS * 8, 128), jnp.float32))
    timed("4 + 2048 smem scalar reads/cell", f4, sph, X)

    # 5. four outputs like the megakernel
    def k5(x_ref, a_ref, b_ref, c_ref, d_ref):
        v = x_ref[:]
        a_ref[:] = v
        b_ref[:] = v * 2.0
        c_ref[:] = v * 3.0
        d_ref[:] = v * 4.0
    f5 = pl.pallas_call(
        k5, grid=(N_CELLS,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((N_CELLS * 8, 128), jnp.float32)] * 4)
    timed("5 four outputs", f5, X)

    # 6. fori(50) { cond(scalar) { work } } skeleton
    def k6(x_ref, o_ref):
        def bounce(_, carry):
            acc, alive = carry
            def body(args):
                acc, alive = args
                acc = acc + x_ref[:]
                return acc, alive - 1
            return jax.lax.cond(jnp.sum(alive) > 0, body, lambda a: a,
                                (acc, alive))
        acc, _ = jax.lax.fori_loop(
            0, 50, bounce,
            (x_ref[:] * 0.0, (x_ref[:] * 0.0 + 2.0).astype(jnp.int32)))
        o_ref[:] = acc
    f6 = pl.pallas_call(
        k6, grid=(N_CELLS,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_CELLS * 8, 128), jnp.float32))
    timed("6 fori50+cond skeleton", f6, X)


if __name__ == "__main__":
    main()
