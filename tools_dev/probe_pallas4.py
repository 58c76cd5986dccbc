"""Probe round 4: bisect the Mosaic relayout failure in the megakernel
miniature by growing the kernel piece by piece."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 64


def run(name, kernel, inputs, n_out=1, **kw):
    out_shape = [jax.ShapeDtypeStruct((8, 128), jnp.float32)] * n_out
    t0 = time.time()
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape, **kw)(*inputs)
        jax.block_until_ready(out)
        print(f"PASS {name}: {time.time()-t0:.1f}s")
        return True
    except Exception as e:
        lines = [l for l in str(e).split("\n") if "Mosaic" in l or "relayout" in l.lower() or "Error" in l]
        msg = (lines[0] if lines else str(e).split("\n")[0])[:150]
        print(f"FAIL {name}: {msg}")
        return False


def main():
    X = jnp.linspace(0.1, 6.0, 8 * 128, dtype=jnp.float32).reshape(8, 128)
    sph = np.zeros((S, 8), np.float32)
    sph[:, :3] = np.random.RandomState(0).randn(S, 3) * 3
    sph[:, 4] = (sph[:, :3] ** 2).sum(1) - 0.25
    sph = jnp.asarray(sph)
    specs2 = dict(
        in_specs=[pl.BlockSpec((S, 8), lambda: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM)])

    # A: inner sweep fori with (f32, i32) carry + select by scalar si
    def ka(sph_ref, x_ref, o_ref):
        dx = x_ref[:]
        def body(si, c):
            bt, bid = c
            cx = sph_ref[si, 0]
            t = cx * dx
            better = t < bt
            return jnp.where(better, t, bt), jnp.where(better, si, bid)
        bt, bid = jax.lax.fori_loop(0, S, body,
            (jnp.full((8, 128), 1e4, jnp.float32), jnp.full((8, 128), -1, jnp.int32)))
        o_ref[:] = bt + bid.astype(jnp.float32)
    run("A-sweep-carry-i32", ka, [sph, X], **specs2)

    # B: same but id carry as f32
    def kb(sph_ref, x_ref, o_ref):
        dx = x_ref[:]
        def body(si, c):
            bt, bid = c
            cx = sph_ref[si, 0]
            t = cx * dx
            better = t < bt
            return jnp.where(better, t, bt), jnp.where(better, jnp.float32(si), bid)
        bt, bid = jax.lax.fori_loop(0, S, body,
            (jnp.full((8, 128), 1e4, jnp.float32), jnp.full((8, 128), -1.0, jnp.float32)))
        o_ref[:] = bt + bid
    run("B-sweep-carry-f32id", kb, [sph, X], **specs2)

    # C: outer fori wrapping A's sweep, carry (o, acc)
    def kc(sph_ref, x_ref, o_ref):
        def bounce(_, carry):
            dx, acc = carry
            def body(si, c):
                bt, bid = c
                cx = sph_ref[si, 0]
                t = cx * dx
                better = t < bt
                return jnp.where(better, t, bt), jnp.where(better, si, bid)
            bt, bid = jax.lax.fori_loop(0, S, body,
                (jnp.full((8, 128), 1e4, jnp.float32), jnp.full((8, 128), -1, jnp.int32)))
            return dx * 1.01, acc + bt
        dx, acc = jax.lax.fori_loop(0, 4, bounce, (x_ref[:], jnp.zeros((8, 128), jnp.float32)))
        o_ref[:] = acc
    run("C-nested-fori", kc, [sph, X], **specs2)

    # D: program_id-based iota raygen + int div/mod by 9 and 31
    def kd(x_ref, o_ref):
        cell = pl.program_id(0) if False else jnp.int32(0)
        lin = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128 + \
              jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        gid = cell * 1024 + lin
        s = gid % 9
        pix = gid // 9
        px = pix % 31
        py = pix // 31
        o_ref[:] = (s + px + py).astype(jnp.float32) + x_ref[:]
    run("D-divmod", kd, [X],
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM)])

    # E: uint32 rng state threaded through outer fori carry
    def ke(x_ref, o_ref):
        def rand_f(state):
            state = state * jnp.uint32(747796405) + jnp.uint32(1)
            w = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
            w = (w >> jnp.uint32(22)) ^ w
            hi = (w >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
            lo = (w & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
            return state, (hi * 65536.0 + lo) / jnp.float32(4294967295.0)
        lin = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128 + \
              jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        def bounce(_, carry):
            state, acc = carry
            state, u = rand_f(state)
            return state, acc + u
        st, acc = jax.lax.fori_loop(0, 4, bounce,
                                    (lin.astype(jnp.uint32), jnp.zeros((8, 128), jnp.float32)))
        o_ref[:] = acc + x_ref[:]
    run("E-rng-carry", ke, [X],
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM)])

    # F: sin/cos inside outer fori
    def kf(x_ref, o_ref):
        def bounce(_, acc):
            return acc + jnp.sin(acc) * 0.1
        o_ref[:] = jax.lax.fori_loop(0, 4, bounce, x_ref[:])
    run("F-sin-in-fori", kf, [X],
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM)])

    # G: C + alive int mask multiply (closest to miniature)
    def kg(sph_ref, x_ref, o_ref):
        def bounce(_, carry):
            dx, acc, alive = carry
            def body(si, c):
                bt = c
                cx = sph_ref[si, 0]
                t = cx * dx
                return jnp.where(t < bt, t, bt)
            bt = jax.lax.fori_loop(0, S, body, jnp.full((8, 128), 1e4, jnp.float32))
            missed = bt >= 1e4
            alive2 = alive * (1 - missed.astype(jnp.int32))
            acc = jnp.where((alive > 0) & missed, acc + 0.5, acc)
            return dx * 1.01, acc, alive2
        dx, acc, alive = jax.lax.fori_loop(
            0, 4, bounce,
            (x_ref[:], jnp.zeros((8, 128), jnp.float32), jnp.ones((8, 128), jnp.int32)))
        o_ref[:] = acc
    run("G-alive-mask", kg, [sph, X], **specs2)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    main()


def extra():
    X = jnp.linspace(0.1, 6.0, 8 * 128, dtype=jnp.float32).reshape(8, 128)
    sph = np.zeros((S, 8), np.float32)
    sph[:, :3] = np.random.RandomState(0).randn(S, 3) * 3
    sph[:, 4] = (sph[:, :3] ** 2).sum(1) - 0.25
    sph = jnp.asarray(sph)
    specs2 = dict(
        in_specs=[pl.BlockSpec((S, 8), lambda: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM)])

    # H: full quadratic sweep (multi scalar reads + sqrt + nested where), one bounce
    def kh(sph_ref, x_ref, o_ref):
        dx = x_ref[:]
        dy = jnp.full((8, 128), 0.3, jnp.float32)
        dz = jnp.ones((8, 128), jnp.float32)
        ox = x_ref[:] * 0.01
        oy = x_ref[:] * 0.02
        oz = jnp.zeros((8, 128), jnp.float32)
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        ddo = dx * ox + dy * oy + dz * oz
        osq = ox * ox + oy * oy + oz * oz
        def body(si, c):
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
        bt, bid = jax.lax.fori_loop(0, S, body,
            (jnp.full((8, 128), 1e4, jnp.float32), jnp.full((8, 128), -1, jnp.int32)))
        o_ref[:] = bt + bid.astype(jnp.float32)
    run("H-full-quadratic", kh, [sph, X], **specs2)

    # I: 11-tuple mixed carry through outer fori, incl. untouched replicated vars
    def ki(sph_ref, x_ref, o_ref):
        lin = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128 + \
              jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        st0 = lin.astype(jnp.uint32)
        dy = jnp.full((8, 128), 0.3, jnp.float32)   # never modified
        dz = jnp.ones((8, 128), jnp.float32)         # never modified
        def bounce(_, carry):
            state, ox, oy, oz, dx, dy, dz, acc, thr, alive, traced = carry
            traced = traced + alive.astype(jnp.float32)
            def body(si, c):
                cx = sph_ref[si, 0]
                t = cx * dx + dy + dz
                return jnp.where(t < c, t, c)
            bt = jax.lax.fori_loop(0, S, body, jnp.full((8, 128), 1e4, jnp.float32))
            missed = bt >= 1e4
            acc = jnp.where((alive > 0) & missed, acc + thr * 0.5, acc)
            alive = alive * (1 - missed.astype(jnp.int32))
            keep = alive > 0
            ox = jnp.where(keep, ox + bt * dx, ox)
            thr = jnp.where(keep, thr * 0.9, thr)
            return (state, ox, oy, oz, dx, dy, dz, acc, thr, alive, traced)
        out = jax.lax.fori_loop(0, 4, bounce,
            (st0, x_ref[:], x_ref[:], jnp.zeros((8, 128), jnp.float32),
             x_ref[:] * 0.5, dy, dz,
             jnp.zeros((8, 128), jnp.float32), jnp.ones((8, 128), jnp.float32),
             jnp.ones((8, 128), jnp.int32), jnp.zeros((8, 128), jnp.float32)))
        o_ref[:] = out[7] + out[10]
    run("I-big-carry", ki, [sph, X], **specs2)


extra()
