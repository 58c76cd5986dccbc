"""Paged hierarchical triangle sweep — the big-mesh closest-hit engine.

The reference traces ~2M-triangle meshes through the driver-built BVH
(/root/reference/raytracer/src/acceleration.rs:268-294 consumed by
shaders/src/ray_gen.glsl:467-478, one traceRayEXT per bounce).  A
pointer-chasing BVH is the wrong shape for a TPU: per-lane divergent
traversal serializes onto the VPU (the XLA wavefront's SAH traversal
measures ~0.01 Mrays/s at 2M triangles).  This module replaces it with a
*streaming paged* design that maps onto what the hardware is good at —
sequential HBM streams, [128, 1024]-shaped slab arithmetic, and the
in-VMEM lane-gather rounds proven by the megakernel's tri-gather sweep
(ops/megakernel._sweep_tri_gather):

  - Triangles are Morton-ordered and chunked into CLUSTERS of G=128
    contiguous triangles; 128 clusters form a PAGE (16,384 triangles).
  - The kernel grid is (pages, ray-blocks), pages OUTER: each page's
    tables stream from HBM into VMEM exactly once per bounce
    (double-buffered by the Pallas pipeline) and are reused by every
    1024-ray block — total table traffic is O(T), not O(T * rays).
  - Per (page, ray-block) step: a cheap page-AABB test over the block
    (~10 VPU ops/ray) gates the work; surviving blocks run the
    [128, 1024] cluster-slab pretest, pack per-lane candidate masks with
    the powers-of-two matmul, and pop clusters in ascending id order,
    lane-gathering the 128-triangle cluster fields and running the dense
    sweep's EXACT Moller-Trumbore op order — results are bit-identical
    to a dense sweep over the same (permuted) soup.
  - Best-hit (t, id, u, v) accumulates across pages in persistent VMEM
    scratch (one tile per ray block); the t so far also prunes later
    pages' pretests (te < t * 1.0001 + 1e-4, the tri-gather margin).

Capacity: pages are unbounded (the table never has to fit VMEM), so this
is the >16,384-triangle path the megakernel's single-page gather cannot
reach — 10^5..10^6+ triangles per scene.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, T_MAX, T_MIN
from .megakernel import _flat_row, _unflat_row, SUB

TRI_G = 128          # default triangles per cluster (production)
PAGE_C = 128         # default clusters per page (production)
RB = 1024            # rays per block (8 sublanes x 128 lanes)
_BIG = np.float32(3e38)


# ---------------------------------------------------------------- host side

def paged_tri_order(world_p: np.ndarray, num_real: int) -> np.ndarray:
    """Morton permutation over world-space centroids (f64).

    Sequential chunks of the Morton order become clusters/pages, giving
    spatially tight cluster AABBs — the same locality role the
    reference's BVH build plays (acceleration.rs:268-294), done once on
    the host.  Returns a permutation over the real triangles.
    """
    v = np.asarray(world_p[:num_real], np.float64)          # [n,3,3]
    c = v.mean(axis=1)                                      # [n,3]
    lo = c.min(axis=0)
    ext = np.maximum(c.max(axis=0) - lo, 1e-12)
    q = np.clip(((c - lo) / ext) * 1023.0, 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = (spread(q[:, 0]) << np.uint64(2)) | (spread(q[:, 1]) << np.uint64(1)) | spread(q[:, 2])
    return np.argsort(code, kind="stable").astype(np.int64)


def world_soup_mid(cs) -> np.ndarray:
    """Host f64 world-space triangles at t=0.5 (the ordering reference
    time, same convention as models/sphere_order.triangle_cluster_order)."""
    from ..models.bvh_build import _instance_matrix_at

    n = cs.num_triangles
    mats = _instance_matrix_at(cs.inst_t0, cs.inst_t1, 0.5)  # [I,3,4] f64
    tp = np.asarray(cs.tri_p[:n], np.float64)
    m = mats[np.asarray(cs.tri_inst[:n], np.int64)]
    return np.einsum("tij,tvj->tvi", m[:, :, :3], tp) + m[:, None, :, 3]


def num_pages(num_tris: int, g: int = TRI_G, c: int = PAGE_C) -> int:
    return max(1, -(-num_tris // (g * c)))


def build_page_valid(num_tris: int, g: int = TRI_G,
                     c: int = PAGE_C) -> np.ndarray:
    """[NP, 2*ceil(c/16), 128] powers-of-two pack weights, zeroed for
    clusters with no real triangle (the column masking is load-bearing:
    empty/padding clusters carry inverted AABBs, which PASS the slab
    test — see megakernel.cluster_aabbs)."""
    NP = num_pages(num_tris, g, c)
    n_clusters = -(-num_tris // g)                          # real clusters
    tw = np.zeros((NP, 8, 128), np.float32)
    for w in range(4):
        for b in range(16):
            tw[:, 2 * w, 32 * w + b] = float(1 << b)        # lo 16 bits
            tw[:, 2 * w + 1, 32 * w + 16 + b] = float(1 << b)
    # zero the pad clusters (>= c) and the pages' real-cluster tails
    valid = np.zeros((NP, 128), bool)
    cid = np.arange(NP * c).reshape(NP, c)
    valid[:, :c] = cid < n_clusters
    tw *= valid[:, None, :]
    return tw


def build_page_tables(world_p, num_real: int, g: int = TRI_G,
                      c: int = PAGE_C, xp=jnp):
    """Page tables from [T, 3, 3] world triangles.

    Returns (pageG [NP, 9*g, 128] gather-layout fields,
             psieve [NP, 128, 8] padded cluster AABBs).
    Row 9*s + f of page p holds field f (v0.xyz, e1.xyz, e2.xyz) of the
    cluster-local triangle s, clusters on the 128-lane axis — the exact
    layout megakernel._sweep_tri_gather's fetch() consumes.

    xp=jnp builds in-graph (per batch, animated meshes); xp=np is the
    host path for static scenes, where the layout transpose is a one-time
    Renderer-init cost instead of seconds of strided device transpose per
    dispatch.
    """
    T = world_p.shape[0]
    NP = num_pages(num_real, g, c)
    Tp = NP * g * c
    v = xp.asarray(world_p, xp.float32)
    if Tp > T:
        v = xp.pad(v, ((0, Tp - T), (0, 0), (0, 0)))
    else:
        v = v[:Tp]
    real = (xp.arange(Tp) < num_real)[:, None]
    # padding triangles are degenerate (e1 = e2 = 0 -> det == 0), the
    # same exclusion the dense sweep's valid flag provides
    v0 = xp.where(real, v[:, 0, :], 0.0)
    e1 = xp.where(real, v[:, 1, :] - v[:, 0, :], 0.0)
    e2 = xp.where(real, v[:, 2, :] - v[:, 0, :], 0.0)
    f9 = xp.concatenate([v0, e1, e2], axis=1).astype(xp.float32)  # [Tp, 9]
    pageG = (
        f9.reshape(NP, c, g * 9)                            # col = s*9+f
        .transpose(0, 2, 1)                                 # (p, s*9+f, c)
    )
    if c < 128:
        # gather rows ride the 128-lane axis; pad unused cluster lanes
        pageG = xp.pad(pageG, ((0, 0), (0, 0), (0, 128 - c)))
    elif xp is np:
        pageG = np.ascontiguousarray(pageG)

    # conservative cluster AABBs over the cluster's real vertices;
    # magnitude-scaled inflation so f32 slab rounding can't skip a true
    # hit (same recipe as megakernel.cluster_aabbs)
    vv = v.reshape(NP, c, g, 3, 3)
    realc = real.reshape(NP, c, g, 1, 1)
    mn = xp.min(xp.where(realc, vv, _BIG), axis=(2, 3))     # [NP, c, 3]
    mx = xp.max(xp.where(realc, vv, -_BIG), axis=(2, 3))
    pad = 1e-5 + 1e-5 * xp.maximum(xp.abs(mn), xp.abs(mx))
    anyv = realc[:, :, :, 0, 0].any(axis=2, keepdims=True)
    mn = xp.where(anyv, mn - pad, _BIG)
    mx = xp.where(anyv, mx + pad, -_BIG)
    psieve = xp.concatenate(
        [mn, mx, xp.zeros((NP, c, 2), xp.float32)], axis=2)
    if c < 128:
        # pad to the fixed 128-cluster pretest tile with inverted boxes;
        # their zeroed tw columns keep them bit-free (load-bearing)
        fill = xp.concatenate([
            xp.full((NP, 128 - c, 3), _BIG, xp.float32),
            xp.full((NP, 128 - c, 3), -_BIG, xp.float32),
            xp.zeros((NP, 128 - c, 2), xp.float32)], axis=2)
        psieve = xp.concatenate([psieve, fill], axis=1)
    return pageG.astype(xp.float32), psieve.astype(xp.float32)


# ------------------------------------------------------------------ kernel

def _paged_kernel(tw_ref, psv_ref, pgG_ref, o_ref, d_ref, act_ref,
                  bt_out, bid_out, bu_out, bv_out,
                  sb_t, sb_id, sb_u, sb_v, *, t_max: float,
                  g: int, c: int):
    p = pl.program_id(0)
    r = pl.program_id(1)
    izero = jnp.zeros((SUB, 128), jnp.int32)

    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    act_f = act_ref[0:1, :]

    # Running best-hit state persists across the page dimension in VMEM
    # scratch (one (8,128) tile per ray block) — grid iteration on TPU is
    # sequential, so scratch carries are exact and interpret-friendly
    # (unlike HBM input/output aliasing, whose interpret-mode blocks
    # re-read the original input).
    @pl.when(p == 0)
    def _seed():
        sb_t[r] = jnp.full((SUB, 128), t_max, jnp.float32)
        sb_id[r] = jnp.full((SUB, 128), -1, jnp.int32)
        sb_u[r] = jnp.zeros((SUB, 128), jnp.float32)
        sb_v[r] = jnp.zeros((SUB, 128), jnp.float32)

    bt_f = _flat_row(sb_t[r])

    eps = jnp.float32(1e-30)

    def ivc(dv):
        return 1.0 / jnp.where(jnp.abs(dv) < eps,
                               jnp.where(dv < 0, -eps, eps), dv)

    ivx, ivy, ivz = ivc(dx), ivc(dy), ivc(dz)

    # --- page-AABB gate: [1, RB] slab test against the page's bounding
    # box (reduced from the cluster AABBs; BIG sentinels of empty
    # clusters vanish under min/max).  One vector->scalar reduction
    # gates the whole pretest + rounds for this (page, block) pair.
    psv = psv_ref[0]                                        # [C, 8]
    te_p = None
    tx_p = None
    for ax, (oA, ivA) in enumerate(((ox, ivx), (oy, ivy), (oz, ivz))):
        mn = jnp.min(psv[:, ax])
        mx = jnp.max(psv[:, 3 + ax])
        a0 = (mn - oA) * ivA
        a1 = (mx - oA) * ivA
        tn = jnp.minimum(a0, a1)
        tf = jnp.maximum(a0, a1)
        te_p = tn if te_p is None else jnp.maximum(te_p, tn)
        tx_p = tf if tx_p is None else jnp.minimum(tx_p, tf)
    hit_p = ((te_p <= tx_p) & (tx_p > T_MIN)
             & (te_p < bt_f * 1.0001 + 1e-4)) & (act_f > 0.0)
    any_hit = jnp.max(hit_p.astype(jnp.float32))

    @pl.when(any_hit > 0.0)
    def _run():
        # --- cluster slab pretest [C, RB] (megakernel._sweep_tri_gather)
        te = None
        tx = None
        for ax, (oA, ivA) in enumerate(((ox, ivx), (oy, ivy), (oz, ivz))):
            a0 = (psv[:, ax:ax + 1] - oA) * ivA             # [C, RB]
            a1 = (psv[:, 3 + ax:4 + ax] - oA) * ivA
            tn = jnp.minimum(a0, a1)
            tf = jnp.maximum(a0, a1)
            te = tn if te is None else jnp.maximum(te, tn)
            tx = tf if tx is None else jnp.minimum(tx, tf)
        sel = (te <= tx) & (tx > T_MIN) & (te < bt_f * 1.0001 + 1e-4)
        mask_f = sel.astype(jnp.float32) * act_f            # [C, RB]

        # powers-of-two matmul -> packed int32 words; tw's zeroed
        # columns keep empty/padding clusters bit-free
        words16 = jax.lax.dot_general(
            tw_ref[0], mask_f, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)             # [8, RB]
        n_words = 4
        masks = []
        for w in range(n_words):
            lo = _unflat_row(words16[2 * w:2 * w + 1]).astype(jnp.int32)
            hi = _unflat_row(words16[2 * w + 1:2 * w + 2]).astype(jnp.int32)
            masks.append(lo | (hi << 16))

        # (8,128) lane tiles for the gather rounds
        o3 = (_unflat_row(ox), _unflat_row(oy), _unflat_row(oz))
        d3 = (_unflat_row(dx), _unflat_row(dy), _unflat_row(dz))
        bt = sb_t[r]
        bid = sb_id[r]
        bu = sb_u[r]
        bv = sb_v[r]

        def fetch(f, ci):
            row = jnp.broadcast_to(pgG_ref[0, f:f + 1, :], (SUB, 128))
            return jnp.take_along_axis(row, ci, axis=1)

        def rbody(i, carry):
            bt, bid, bu, bv, *ms = carry
            ci = izero
            taken = izero == 1
            new_ms = []
            for w in range(n_words):
                m = ms[w]
                has = (m != 0) & ~taken
                b = m & -m
                idx = jax.lax.population_count(b - 1) + (32 * w)
                ci = jnp.where(has, idx, ci)
                new_ms.append(jnp.where(has, m ^ b, m))
                taken = taken | has
            pending = taken

            base = p * (g * c) + ci * g
            for s in range(g):
                v0x = fetch(9 * s + 0, ci)
                v0y = fetch(9 * s + 1, ci)
                v0z = fetch(9 * s + 2, ci)
                e1x = fetch(9 * s + 3, ci)
                e1y = fetch(9 * s + 4, ci)
                e1z = fetch(9 * s + 5, ci)
                e2x = fetch(9 * s + 6, ci)
                e2y = fetch(9 * s + 7, ci)
                e2z = fetch(9 * s + 8, ci)
                # dense tri sweep's exact Moller-Trumbore op order
                px = d3[1] * e2z - d3[2] * e2y
                py = d3[2] * e2x - d3[0] * e2z
                pz = d3[0] * e2y - d3[1] * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(det != 0.0,
                                    1.0 / jnp.where(det == 0.0, 1.0, det),
                                    0.0)
                tvx = o3[0] - v0x
                tvy = o3[1] - v0y
                tvz = o3[2] - v0z
                uu = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                vv = (d3[0] * qx + d3[1] * qy + d3[2] * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((det != 0.0) & (uu >= 0.0) & (vv >= 0.0)
                      & (uu + vv <= 1.0) & (t > T_MIN) & (t < t_max))
                t = jnp.where(ok, t, t_max)
                better = pending & (t < bt)
                bt = jnp.where(better, t, bt)
                bid = jnp.where(better, base + s, bid)
                bu = jnp.where(better, uu, bu)
                bv = jnp.where(better, vv, bv)
            return tuple([bt, bid, bu, bv] + new_ms)

        cnt = izero
        for m in masks:
            cnt = cnt + jax.lax.population_count(m)
        out = jax.lax.fori_loop(
            0, jnp.max(cnt), rbody, tuple([bt, bid, bu, bv] + masks))
        sb_t[r] = out[0]
        sb_id[r] = out[1]
        sb_u[r] = out[2]
        sb_v[r] = out[3]

    # every (page, block) step leaves the out rows valid; the final
    # visit (p == NP-1) is the one whose flush survives
    bt_out[:] = _flat_row(sb_t[r])
    bid_out[:] = _flat_row(sb_id[r])
    bu_out[:] = _flat_row(sb_u[r])
    bv_out[:] = _flat_row(sb_v[r])


@functools.partial(jax.jit, static_argnames=("interpret", "g", "c"))
def paged_tri_sweep(tw, psieve, pageG, o3, d3, act, interpret=False,
                    g=TRI_G, c=PAGE_C):
    """tw [NP,8,128], psieve [NP,128,8], pageG [NP,9g,128]; o3/d3/act
    [3|1, R] (R a multiple of RB).  Returns (t, id, u, v) each [R]."""
    NP = pageG.shape[0]
    R = o3.shape[1]
    assert R % RB == 0, "rays must pad to RB"
    nrb = R // RB
    assert nrb <= 512, "best-hit scratch: <=512 ray blocks per dispatch"
    kernel = functools.partial(_paged_kernel, t_max=float(T_MAX), g=g, c=c)
    row = lambda: pl.BlockSpec((1, RB), lambda pg, r: (0, r),
                               memory_space=pltpu.VMEM)
    page = lambda shp: pl.BlockSpec(shp, lambda pg, r: (pg, 0, 0),
                                    memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(NP, nrb),
        in_specs=[
            page((1, 8, 128)),                   # tw
            page((1, 128, 8)),                   # psieve (128-cluster tile)
            page((1, g * 9, 128)),               # pageG
            pl.BlockSpec((3, RB), lambda pg, r: (0, r),
                         memory_space=pltpu.VMEM),   # o
            pl.BlockSpec((3, RB), lambda pg, r: (0, r),
                         memory_space=pltpu.VMEM),   # d
            row(),                               # act
        ],
        out_specs=[row()] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nrb, SUB, 128), jnp.float32),
            pltpu.VMEM((nrb, SUB, 128), jnp.int32),
            pltpu.VMEM((nrb, SUB, 128), jnp.float32),
            pltpu.VMEM((nrb, SUB, 128), jnp.float32),
        ],
        interpret=interpret,
    )(tw, psieve, pageG, o3, d3, act)
    return outs[0][0], outs[1][0], outs[2][0], outs[3][0]


def intersect_tris_paged(o, d, tw, psieve, pageG, active=None,
                         interpret=False, g=TRI_G, c=PAGE_C) -> Hit:
    """V3 component entry (wavefront trace signature, like
    pallas_tri_sweep.intersect_tris_pallas_v3)."""
    from .vec3 import to_3r

    R = o.x.shape[0]
    R_pad = max(RB, -(-R // RB) * RB)
    o3 = to_3r(o)
    d3 = to_3r(d)
    if R_pad != R:
        o3 = jnp.pad(o3, ((0, 0), (0, R_pad - R)))
        d3 = jnp.pad(d3, ((0, 0), (0, R_pad - R)), constant_values=1.0)
    if active is None:
        act = jnp.ones((1, R_pad), jnp.float32)
        if R_pad != R:
            act = act.at[:, R:].set(0.0)
    else:
        act = jnp.zeros((1, R_pad), jnp.float32).at[0, :R].set(
            active.astype(jnp.float32))
    t, ids, u, v = paged_tri_sweep(tw, psieve, pageG, o3, d3, act,
                                   interpret=interpret, g=g, c=c)
    t, ids, u, v = t[:R], ids[:R], u[:R], v[:R]
    if active is not None:
        t = jnp.where(active, t, T_MAX)
        ids = jnp.where(active, ids, -1)
    return Hit(t=t, tri=ids, u=u, v=v)
