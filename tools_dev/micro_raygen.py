"""Microbenchmark: raygen cost per (8,128) cell-iteration, isolated.

Runs a Pallas kernel whose loop body is ONLY the megakernel's raygen path
(init_rng + get_rays_v3), folding outputs into an accumulator so nothing
is DCE'd.  Variants isolate the DOF disk sample, the int div/mod for
px/py, and the u32->f32 scaling division.

  python tools_dev/micro_raygen.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace_tpu.ops import camera as cam_ops
from raytrace_tpu.ops import rng
from raytrace_tpu.ops.vec3 import V3

ITERS = 20000
WIDTH, HEIGHT, SPP, SQRT_SPP = 1200, 675, 4, 2


class _MatRef:
    def __init__(self, ref, row0):
        self._ref = ref
        self._row0 = row0

    def __getitem__(self, ij):
        i, j = ij
        return self._ref[self._row0 + i, j]


class _Cam:
    def __init__(self, cam_ref, focal, aperture):
        self.view_inverse = _MatRef(cam_ref, 0)
        self.proj_inverse = _MatRef(cam_ref, 4)
        self.focal_length = focal
        self.aperture_size = aperture


def kernel(cam_ref, pix_ref, out_ref, *, variant):
    pix = pix_ref[:8, :]
    cam = _Cam(cam_ref, cam_ref[0, 3] * 0 + 10.0, cam_ref[0, 3] * 0 + 0.2)
    nzero = pix.astype(jnp.float32) * 0.0

    def raygen(pix, sip, it):
        s_all = sip
        if variant == "packedpx":
            px = (pix & 2047).astype(jnp.int32)
            py = pix >> 11
        else:
            pixel = pix
            px = pixel % WIDTH
            py = pixel // WIDTH
        batch = s_all // SPP
        s = s_all % SPP
        st = rng.init_rng(batch.astype(jnp.uint32), s.astype(jnp.uint32),
                          py.astype(jnp.uint32), px.astype(jnp.uint32),
                          WIDTH, HEIGHT, SPP)
        st = st + it.astype(jnp.uint32)   # defeat loop-invariant hoisting
        si = s % SQRT_SPP
        sj = s // SQRT_SPP
        use_dof = variant not in ("nodof",)
        return cam_ops.get_rays_v3(
            st, cam, px, py, si, sj, WIDTH, HEIGHT, SQRT_SPP,
            use_dof=use_dof)

    def body(i, carry):
        acc, sip = carry
        st, o, d = raygen(pix, sip, i)
        acc = acc + o.x + o.y + o.z + d.x + d.y + d.z \
            + rng.random_float(st)[1]
        return acc, (sip + 1) % (SPP * 24)

    it0 = jnp.max((nzero + ITERS).astype(jnp.int32))
    acc, _ = jax.lax.fori_loop(
        0, it0, body, (nzero, jnp.zeros_like(pix)))
    out_ref[:] = acc


def run(variant):
    cam_tbl = np.zeros((8, 4), np.float32)
    cam_tbl[:4] = np.eye(4)[:, :4]
    cam_tbl[4:] = np.linalg.inv(
        np.diag([1.2, 2.1, -1.0, 1.0]))[:4]
    if variant == "packedpx":
        yy, xx = np.meshgrid(np.arange(8), np.arange(128), indexing="ij")
        pix = (yy * 2048 + xx).astype(np.int32)
    else:
        pix = np.arange(1024, dtype=np.int32).reshape(8, 128)

    f = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(8,),
        in_specs=[
            pl.BlockSpec((8, 4), lambda i: (0, 0),
                         memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
    )
    g = jax.jit(lambda c, p: f(c, p))
    out = g(jnp.asarray(cam_tbl), jnp.asarray(pix))
    float(out.sum())
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        out = g(jnp.asarray(cam_tbl), jnp.asarray(pix))
        float(out.sum())
        best = min(best, time.time() - t0)
    per_iter = best / (ITERS * 8) * 1e6
    print(f"[{variant:10s}] {per_iter:.3f} us/cell-iter", flush=True)


if __name__ == "__main__":
    for v in ("base", "nodof", "packedpx"):
        run(v)
