"""Probe 7: which megakernel INPUT causes the fixed ~50ms/dispatch?
Trivial body, mega-shaped inputs added one at a time."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CELLS = 512
N = 8
P = 544


def timed(name, f, *args):
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


def call(body, in_specs, n_out=1):
    return pl.pallas_call(
        body, grid=(N_CELLS,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((N_CELLS * 8, 128), jnp.float32)] * n_out)


def main():
    print("backend:", jax.default_backend())
    cam = jnp.ones((8, 4), jnp.float32)
    prm = jnp.zeros((1, 16), jnp.float32)
    sph = jnp.ones((512, 8), jnp.float32)
    tri = jnp.ones((8, 16), jnp.float32)
    rowsT = jnp.ones((64, P), jnp.float32)
    o2w = jnp.ones((488, 12), jnp.float32)
    light = jnp.ones((8, 16), jnp.float32)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    # A: cam+prm SMEM only
    def ka(cam_ref, prm_ref, o_ref):
        o_ref[:] = jnp.zeros((8, 128), jnp.float32) + cam_ref[0, 0] + prm_ref[0, 0]
    timed("A cam+prm smem", call(ka, [smem(), smem()]), cam, prm)

    # B: + sphere table SMEM [512,8]
    def kb(cam_ref, prm_ref, sph_ref, o_ref):
        o_ref[:] = jnp.zeros((8, 128), jnp.float32) + sph_ref[0, 0] + prm_ref[0, 0] + cam_ref[0, 0]
    timed("B + sph smem 512x8", call(kb, [smem(), smem(), smem()]), cam, prm, sph)

    # C: + o2w SMEM [488,12]
    def kc(cam_ref, prm_ref, sph_ref, o2w_ref, o_ref):
        o_ref[:] = (jnp.zeros((8, 128), jnp.float32) + sph_ref[0, 0]
                    + o2w_ref[0, 0] + prm_ref[0, 0] + cam_ref[0, 0])
    timed("C + o2w smem 488x12", call(kc, [smem()] * 4), cam, prm, sph, o2w)

    # D: + rowsT VMEM [64,544] constant block
    def kd(cam_ref, prm_ref, rows_ref, o_ref):
        o_ref[:] = (jnp.zeros((8, 128), jnp.float32) + rows_ref[0, 0]
                    + prm_ref[0, 0] + cam_ref[0, 0])
    timed("D + rowsT vmem 64x544",
          call(kd, [smem(), smem(),
                    pl.BlockSpec((64, P), lambda i: (0, 0), memory_space=pltpu.VMEM)]),
          cam, prm, rowsT)

    # E: rowsT padded to 64x640 (lane multiple)
    rowsT_pad = jnp.ones((64, 640), jnp.float32)
    def ke(cam_ref, prm_ref, rows_ref, o_ref):
        o_ref[:] = (jnp.zeros((8, 128), jnp.float32) + rows_ref[0, 0]
                    + prm_ref[0, 0] + cam_ref[0, 0])
    timed("E + rowsT vmem 64x640",
          call(ke, [smem(), smem(),
                    pl.BlockSpec((64, 640), lambda i: (0, 0), memory_space=pltpu.VMEM)]),
          cam, prm, rowsT_pad)

    # F: all seven inputs like the megakernel, trivial body
    def kf(cam_ref, prm_ref, sph_ref, tri_ref, rows_ref, o2w_ref, light_ref,
           a_ref, b_ref, c_ref, d_ref):
        v = (jnp.zeros((8, 128), jnp.float32) + rows_ref[0, 0] + sph_ref[0, 0]
             + tri_ref[0, 0] + o2w_ref[0, 0] + light_ref[0, 0]
             + prm_ref[0, 0] + cam_ref[0, 0])
        a_ref[:] = v
        b_ref[:] = v
        c_ref[:] = v
        d_ref[:] = v
    timed("F all 7 inputs",
          call(kf, [smem(), smem(), smem(), smem(),
                    pl.BlockSpec((64, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    smem(), smem()], n_out=4),
          cam, prm, sph, tri, rowsT, o2w, light)


if __name__ == "__main__":
    main()
