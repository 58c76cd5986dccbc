"""Probe round 2: RNG cast workaround exactness, HIGHEST-precision fetch,
dynamic VMEM scalar reads, SMEM capacity, sublane slicing + concat."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, inputs, out_shape, expect=None, rtol=0.0, **kw):
    t0 = time.time()
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape, **kw)(*inputs)
        jax.block_until_ready(out)
        dt = time.time() - t0
        err = float("nan")
        nbad = -1
        if expect is not None:
            want = expect(*inputs)
            err = float(jnp.max(jnp.abs(out - want)))
            nbad = int(jnp.sum(out != want))
        print(f"PASS {name}: {dt:.1f}s maxerr={err:.3e} n_mismatch={nbad}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:180]
        print(f"FAIL {name}: {msg}")
        return False


def u32_to_f32_exact(word):
    """uint32 -> f32 without the unsupported direct cast: bitcast to int32
    (= v - 2^31 mod 2^32), convert, add back 2^31."""
    i = word.astype(jnp.int32) if word.dtype != jnp.int32 else word
    # reinterpret: i32 value is v - 2^32 when v >= 2^31
    f = i.astype(jnp.float32)
    return jnp.where(i < 0, f + jnp.float32(4294967296.0), f)


def main():
    X = jnp.linspace(0.1, 6.0, 8 * 128, dtype=jnp.float32).reshape(8, 128)
    f32out = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    # host check of the cast trick on adversarial values
    v = np.random.RandomState(0).randint(0, 2**32, 10_000_000, dtype=np.uint64).astype(np.uint32)
    exact = v.astype(np.float32)
    i = v.astype(np.int32)
    trick = np.where(i < 0, i.astype(np.float32) + np.float32(2**32), i.astype(np.float32))
    print("host cast-trick mismatches:", int((exact != trick).sum()), "/", len(v))

    # 1. in-kernel RNG with the cast trick, compare vs XLA exact
    U = (jnp.arange(8 * 128, dtype=jnp.uint32) * jnp.uint32(2654435761)).reshape(8, 128)
    def rngk(u_ref, o_ref):
        s = u_ref[:] * jnp.uint32(747796405) + jnp.uint32(1)
        w = ((s >> ((s >> jnp.uint32(28)) + jnp.uint32(4))) ^ s) * jnp.uint32(277803737)
        w = (w >> jnp.uint32(22)) ^ w
        o_ref[:] = u32_to_f32_exact(w) / jnp.float32(4294967295.0)
    def rngx(u):
        s = u * jnp.uint32(747796405) + jnp.uint32(1)
        w = ((s >> ((s >> jnp.uint32(28)) + jnp.uint32(4))) ^ s) * jnp.uint32(277803737)
        w = (w >> jnp.uint32(22)) ^ w
        return w.astype(jnp.float32) / jnp.float32(4294967295.0)
    run("rng-cast-trick", rngk, [U], f32out, rngx)

    # 2. one-hot fetch with HIGHEST precision
    P = 544
    rows_t = jnp.asarray(np.random.rand(40, P), jnp.float32)
    prim = jnp.asarray(np.random.randint(0, P, (8, 128)), jnp.int32)
    def fetchk(rt_ref, p_ref, o_ref):
        outs = []
        for k in range(8):
            pid = p_ref[k:k+1, :]                                 # [1,128]
            io = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
            oh = (io == pid).astype(jnp.float32)
            outs.append(jax.lax.dot_general(
                rt_ref[:], oh, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32))              # [40,128]
        # slot 7 as (8,128)
        o_ref[:] = jnp.concatenate([o[7:8, :] for o in outs], axis=0)
    run("fetch-highest", fetchk,
        [rows_t, prim], f32out,
        lambda rt, p: rt[7, p])

    # 3. dynamic-index scalar read from VMEM (traced index via fori)
    tab = jnp.asarray(np.random.rand(512, 16), jnp.float32)
    def vmemdyn(tab_ref, x_ref, o_ref):
        def body(i, acc):
            return acc + tab_ref[i, 0] * 1e-3 * x_ref[:]
        o_ref[:] = jax.lax.fori_loop(0, 512, body, jnp.zeros((8, 128), jnp.float32))
    run("vmem-dyn-scalar", vmemdyn, [tab, X], f32out,
        lambda t, x: jnp.sum(t[:, 0]) * 1e-3 * x, rtol=1e-4)

    # 4. SMEM capacity: 512x16 f32 = 32 KB table
    def smemcap(tab_ref, x_ref, o_ref):
        def body(i, acc):
            return acc + tab_ref[i, 5] * 1e-3 * x_ref[:]
        o_ref[:] = jax.lax.fori_loop(0, 512, body, jnp.zeros((8, 128), jnp.float32))
    run("smem-32KB", smemcap, [tab, X], f32out,
        lambda t, x: jnp.sum(t[:, 5]) * 1e-3 * x,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

    # 5. early-exit while loop with VMEM vector carries (bounce loop shape)
    def bounce(x_ref, o_ref):
        def cond(c):
            i, alive, acc = c
            return (i < 50) & (jnp.sum(alive.astype(jnp.float32)) > 0)
        def body(c):
            i, alive, acc = c
            acc = acc + jnp.where(alive, x_ref[:], 0.0)
            alive = alive & (acc < 10.0)
            return i + 1, alive, acc
        _, _, acc = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.ones((8, 128), bool), jnp.zeros((8, 128), jnp.float32)))
        o_ref[:] = acc
    def bounce_x(x):
        acc = jnp.zeros_like(x)
        alive = jnp.ones(x.shape, bool)
        for _ in range(50):
            acc = acc + jnp.where(alive, x, 0.0)
            alive = alive & (acc < 10.0)
        return acc
    run("while-vector-carry", bounce, [X], f32out, bounce_x)

    # 6. int32 mod / floor (checker) + bool select chains
    def chk(x_ref, o_ref):
        xi = jnp.floor(x_ref[:] * 3.0).astype(jnp.int32)
        par = (xi % 2 == 0)
        o_ref[:] = jnp.where(par, x_ref[:], -x_ref[:])
    run("floor-mod-select", chk, [X], f32out,
        lambda x: jnp.where(jnp.floor(x * 3.0).astype(jnp.int32) % 2 == 0, x, -x))


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    main()
