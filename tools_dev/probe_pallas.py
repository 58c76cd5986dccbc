"""Probe which ops Mosaic/Pallas-TPU supports for the fused bounce kernel.

Run on the real chip: python tools_dev/probe_pallas.py
Each probe compiles a tiny kernel and checks numerics vs XLA.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, inputs, out_shape, expect_fn=None, **kw):
    t0 = time.time()
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape, **kw)(*inputs)
        jax.block_until_ready(out)
        dt = time.time() - t0
        if expect_fn is not None:
            want = expect_fn(*inputs)
            err = float(jnp.max(jnp.abs(out - want)))
        else:
            err = float("nan")
        print(f"PASS {name}: {dt:.1f}s maxerr={err:.3e}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {msg}")
        return False


def main():
    X = jnp.linspace(0.1, 6.0, 8 * 128, dtype=jnp.float32).reshape(8, 128)
    U = (jnp.arange(8 * 128, dtype=jnp.uint32) * jnp.uint32(2654435761)).reshape(8, 128)
    f32out = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    # 1. sin/cos
    run("sin+cos", lambda x_ref, o_ref: o_ref.__setitem__(
        slice(None), jnp.sin(x_ref[:]) + jnp.cos(x_ref[:])),
        [X], f32out, lambda x: jnp.sin(x) + jnp.cos(x))

    # 2. uint32 RNG math (shifts by vector amounts, xor, mul)
    def rngk(u_ref, o_ref):
        s = u_ref[:] * jnp.uint32(747796405) + jnp.uint32(1)
        w = ((s >> ((s >> jnp.uint32(28)) + jnp.uint32(4))) ^ s) * jnp.uint32(277803737)
        w = (w >> jnp.uint32(22)) ^ w
        o_ref[:] = w.astype(jnp.float32) / jnp.float32(4294967295.0)
    def rngx(u):
        s = u * jnp.uint32(747796405) + jnp.uint32(1)
        w = ((s >> ((s >> jnp.uint32(28)) + jnp.uint32(4))) ^ s) * jnp.uint32(277803737)
        w = (w >> jnp.uint32(22)) ^ w
        return w.astype(jnp.float32) / jnp.float32(4294967295.0)
    run("pcg-rng", rngk, [U], f32out, rngx)

    # 3. one-hot matmul fetch: rows_T [32, P] @ onehot [P, 128] -> [32, 128]
    P = 544
    rows_t = jnp.asarray(np.random.rand(32, P), jnp.float32)
    prim = jnp.asarray(np.random.randint(0, P, (1, 128)), jnp.int32)
    def fetchk(rt_ref, p_ref, o_ref):
        pid = p_ref[:]                                     # [1,128]
        io = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
        oh = (io == pid).astype(jnp.float32)               # [P,128]
        o_ref[:] = jnp.dot(rt_ref[:], oh, preferred_element_type=jnp.float32)
    run("onehot-fetch", fetchk,
        [rows_t, prim], jax.ShapeDtypeStruct((32, 128), jnp.float32),
        lambda rt, p: rt[:, p[0]],)

    # 4. scalar read from SMEM + dynamic pl.when skip
    tab = jnp.asarray(np.random.rand(64, 8), jnp.float32)
    def smemk(tab_ref, x_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        def body(i, acc):
            c = tab_ref[i, 0]
            return acc + c * x_ref[:]
        acc = jax.lax.fori_loop(0, 64, body, acc)
        o_ref[:] = acc
    ok_smem = run("smem-scalar-loop", smemk, [tab, X], f32out,
                  lambda t, x: jnp.sum(t[:, 0]) * x,
                  in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                            pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM)],
                  out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

    # 5. data-dependent while_loop with scalar cond inside kernel
    def whilek(x_ref, o_ref):
        def cond(c):
            i, acc = c
            return i < 10
        def body(c):
            i, acc = c
            return i + 1, acc + x_ref[:]
        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.float32)))
        o_ref[:] = acc
    run("while-loop", whilek, [X], f32out, lambda x: 10.0 * x)

    # 6. lax.cond on a data-dependent scalar (cluster skip)
    def condk(x_ref, o_ref):
        s = jnp.sum(x_ref[:])
        o_ref[:] = jax.lax.cond(s > 0, lambda: x_ref[:] * 2.0, lambda: x_ref[:])
    run("lax-cond-datadep", condk, [X], f32out, lambda x: x * 2.0)

    # 7. any-reduce to scalar then skip via pl.when on accumulation
    def whenk(x_ref, o_ref):
        o_ref[:] = x_ref[:]
        @pl.when(jnp.sum(x_ref[:]) > 1e9)   # false at runtime
        def _():
            o_ref[:] = x_ref[:] * 3.0
    run("pl-when-datadep", whenk, [X], f32out, lambda x: x)

    # 8. scalar load from VMEM table (vs SMEM)
    def vmem_scalar(tab_ref, x_ref, o_ref):
        c = tab_ref[3, 0]
        o_ref[:] = c * x_ref[:]
    run("vmem-scalar-read", vmem_scalar, [tab, X], f32out,
        lambda t, x: t[3, 0] * x)

    # 9. dynamic-index row read from VMEM: tab[i] broadcast
    def dynrow(tab_ref, x_ref, o_ref):
        i = jnp.int32(5)
        row = tab_ref[pl.ds(i, 1), :]    # [1,8]
        o_ref[:] = row[0, 0] * x_ref[:]
    run("vmem-dynrow-read", dynrow, [tab, X], f32out,
        lambda t, x: t[5, 0] * x)

    # 10. f32 pow via integer exponent (schlick) + exp/log
    def powk(x_ref, o_ref):
        x = x_ref[:] * 0.1
        o_ref[:] = (1.0 - x) ** 5 + jnp.exp(-x) + jnp.log(x + 1.0)
    run("pow-exp-log", powk, [X], f32out,
        lambda x: (1.0 - x * 0.1) ** 5 + jnp.exp(-x * 0.1) + jnp.log(x * 0.1 + 1.0))


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    main()
