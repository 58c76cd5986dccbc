"""The fused bounce megakernel: one Pallas kernel runs raygen + the ENTIRE
bounce loop (trace, hit reconstruction, shading, NEE, RNG, state update) with
all ray state resident on-chip — the TPU equivalent of the reference's
single-raygen-invocation path tracer (ray_gen.glsl:457-605).

Why: the unfused XLA bounce body materializes every intermediate through HBM
(~33 of 43 ms/iter at R=1M measured in round 1); here the only HBM traffic is
the per-ray radiance output (16 B/ray per tile).

Layout (measured in tools_dev/probe_pallas5.py):
- a grid cell owns 1024 rays as an (8, 128) tile: shading and state updates
  run at full VPU utilization;
- the sphere/triangle sweep is a scalar loop over primitives (unrolled x8)
  with tables in SMEM — 52 G ray-sphere tests/s, matching the chunked
  sublane-sweep kernel, while keeping rays on both tile axes;
- the per-hit "fat row" (shading constants + w2o + sphere + instance id,
  models/shading_table.py) is fetched with 8 one-hot MXU matmuls at
  Precision.HIGHEST — exact f32, no gathers;
- the bounce loop is fori(max_depth) with a lax.cond early-exit per cell
  once every ray in the cell has died (replaces global tail compaction).

Parity: the kernel calls the SAME jnp functions as the XLA wavefront
(ops/shading.scatter_and_emit_v3, ops/nee.*, ops/camera.get_rays_v3,
ops/rng.*), so the RNG draw order and arithmetic are identical; interpret
mode reproduces the XLA path bitwise (tests/test_megakernel.py).

Mosaic constraints honored (see memory + tools_dev/probe_pallas*.py): no
uint32->f32 convert (rng._u32_to_f32 split), every loop-carry init derived
from non-replicated data, scalar table reads from SMEM only.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import camera as cam_ops
from . import nee, rng, vec3
from .intersect import T_MAX, T_MIN
from .materials import LIGHT_PDF
from .vec3 import V3

CELL = 1024          # rays per grid cell, as an (8, 128) tile
SUB = 8              # sublanes per cell


class _MatRef:
    """cam.view_inverse[i, j]-style scalar access into an SMEM table."""

    def __init__(self, ref, row0: int):
        self._ref = ref
        self._row0 = row0

    def __getitem__(self, ij):
        i, j = ij
        return self._ref[self._row0 + i, j]


class _CamRef:
    """Duck-typed CameraArrays over the SMEM camera table ([8,4]: rows 0-3
    view_inverse, rows 4-7 proj_inverse) + params scalars."""

    def __init__(self, cam_ref, focal, aperture):
        self.view_inverse = _MatRef(cam_ref, 0)
        self.proj_inverse = _MatRef(cam_ref, 4)
        self.focal_length = focal
        self.aperture_size = aperture


class _RowsT:
    """rows[:, j] shim over per-slot (8,128) arrays fetched by the one-hot
    matmul — lets ops/shading.scatter_and_emit_v3 run unchanged in-kernel."""

    def __init__(self, slots):
        self._slots = slots

    def __getitem__(self, idx):
        _, j = idx
        return self._slots[j]


@dataclass(frozen=True)
class MegaConfig:
    """Static kernel specialization facts (hashable)."""

    s_pad: int          # sphere rows in the prim table (spheres occupy [0, s_pad))
    n_spheres: int      # actual sphere count swept
    n_tris: int         # actual triangle count swept
    P: int              # prim-table columns (s_pad + padded tris)
    n_inst: int         # instances (NEE o2w select loop bound)
    L8: int             # light table rows (padded)
    width: int
    height: int
    sqrt_spp: int
    spp: int            # full samples per pixel (RNG stream width)
    spp_local: int      # samples rendered by this shard
    max_depth: int
    use_dof: bool
    has_lights: bool
    flags: object       # TexFlags (has_image/has_noise must be False)
    n_pix: int = 0      # pixels in this tile (rows_per_tile * width)
    n_batches: int = 1  # sample batches fused into one lane sample stream
                        # (static scenes only: geometry identical per batch)
    q_pix: int = 1      # pixels per lane, processed sequentially.  With a
                        # cost-stratified "snake" assignment (renderer
                        # _snake_perm) a lane's q pixels come from q cost
                        # strata, so lane TOTALS equalize and the cell's
                        # slowest-lane tail shrinks: measured cross-chunk
                        # utilization 0.57 (q=1) -> 0.80 (q=8).
    # Deferred image textures (deferred_image_supported): every lane slot
    # is one (pixel, sample) ITEM — pix_ref entries index
    # n_pix * spp_local * n_batches items, each rendered as a single
    # sample into its OWN output slot, so the per-sample primary-hit
    # texel factor can be applied by an XLA post-pass after the kernel
    # (render_tile_mega).  cfg.n_pix then counts items, not pixels.
    item_mode: bool = False
    # Pair sample-stealing: lanes (g, l) and (g, l+64) share one combined
    # item list of 2 * q_pix * (spp_local * n_batches) samples via a
    # two-pointer split — the left lane claims items ascending (its own
    # q_pix pixels first, in-order), the right lane descending (ITS own
    # pixels first: the item->sample map reverses sip in the right half
    # so each owner still sees its pixels in natural sample order).  When
    # one lane drains its side it keeps claiming the partner's remaining
    # samples, so the pair's divergence tail is bounded by ONE sample
    # instead of the slow lane's whole backlog.  Claims are coordinated
    # with three 64-lane rolls per iteration (cur, target, attempt) and a
    # deterministic tie-break; stolen samples flush into the owner's
    # output slot through a rolled masked add.  Per-pixel RNG streams
    # make every sample's value lane-independent, so the image equals
    # the non-stealing kernel up to FP add order (statistical, not
    # bitwise, parity — same class as the Mosaic one-ulp deltas).
    use_steal: bool = False
    # Cluster-selective sphere sweep (sub-linear in scene size): spheres
    # [0, n_prefix) are "global" and swept densely; the rest are spatially
    # ordered clusters of clu_g spheres traversed per lane nearest-first
    # (models/sphere_order.py).  n_clusters_pad = one-hot matmul lane pad.
    use_sel: bool = False
    n_prefix: int = 0
    clu_g: int = 8
    n_clusters: int = 0
    n_clusters_pad: int = 128
    sky_is_gradient: bool = False
    # MXU sphere sweep: the ray-sphere dot products (c.d, c.o) for ALL
    # spheres come from one split-precision matmul and the quadratic
    # solve runs as elementwise passes over [S, 1024] — ~21 VPU passes
    # instead of ~35 scalar ops per sphere.  ~16-bit-mantissa c/k (hi+lo
    # bf16), so results can differ from the scalar sweep at FP-noise
    # level (statistical parity, not bitwise).  Used for big sphere
    # counts where the scalar loop dominates the iteration.
    use_mxu_sweep: bool = False
    # Cluster sieve: MXU pretest on cluster BOUNDING spheres + exact
    # per-candidate rounds (_sweep_sieve) — sub-linear in S and
    # bit-exact vs the dense scalar sweep.  Preferred over use_mxu_sweep
    # when the clustered layout exists (sph_prefix > 0).
    use_sieve: bool = False
    # Unrolled candidate rounds (straight-line code schedules ~2x the
    # issue rate of a dynamic-trip fori); a dynamic residual loop covers
    # the rare cell whose worst lane exceeds it.  0 = fully dynamic
    # (interpret mode keeps this: unrolling only slows CPU tracing).
    rounds_unroll: int = 0
    # Perf-triage ablation tag (trace-time; part of the jit cache key).
    ablate: str = ""
    # Gather rounds: like the sieve, but each candidate round fetches its
    # per-lane cluster's G spheres with LANE GATHERS (take_along_axis on
    # the lane axis, bit-exact f32 — no one-hot matmul, no _split3)
    # instead of the [3V,Cp]@[Cp,1024] fetch.  A round costs ~an eighth
    # of the one-hot round, which flips the round-2 verdict: sub-linear
    # candidate visiting beats the dense MXU sweep.  Requires
    # n_clusters <= 128 (gather table width).
    use_gather: bool = False
    # Re-pretest culling: every cull_every unrolled gather rounds, the
    # candidate masks are re-packed against the improved bt (the
    # quadratic pretest terms don't depend on bt, so a re-cull costs one
    # compare pass + one packing matmul).  Clusters whose conservative
    # entry distance is behind the current best hit drop out, which
    # shortens the dynamic residual loop — the kernel-side answer to
    # "a cell pays its worst lane's candidate count".  0 = off.
    cull_every: int = 0
    # Near-first band ordering: the pretest splits each lane's candidate
    # bits into two bands around a per-lane entry-distance pivot; rounds
    # drain the near band first, so bt drops early and the re-cull
    # removes most of the far band.  Adds an id tie-break to keep the
    # dense sweep's lowest-id tie order under out-of-order visiting.
    use_bands: bool = False
    # Lane balancing mode for the gather rounds ("" = off).  A cell pays
    # its worst lane's candidate count (measured mean ~3.4 clusters/ray
    # vs cell-max ~10-16, tools_dev/cull_study.py), so redistribution is
    # worth up to ~3x:
    #  - "idle": a lane with NO candidates adopts the odd-position
    #    candidate bits + ray of its +64 partner, halving that lane's
    #    rounds; one-time rolls/selects.
    #  - "pair": every (l, l+64) pair splits its COMBINED candidate list
    #    by global-rank parity so both lanes sweep ceil((cA+cB)/2)
    #    rounds — the optimal 2-way split for any distribution.  Rank
    #    parity comes from one triangular matmul at pretest time; dual
    #    (own-ray, partner-ray) accumulators merge with a (t, id)
    #    lexicographic min.
    # Both modes reproduce the ascending-id strict-< dense sweep
    # bit-exactly (tests/test_megakernel.py).
    use_balance: str = ""
    # AABB slab pretest for the sieve/gather candidate masks (replaces
    # the cluster bounding-sphere quadratic).  Clusters of G spheres
    # make long thin boxes whose bounding spheres are loose: measured on
    # final-one-weekend bounce populations (tools_dev/balance_sim.py),
    # the box test passes mean ~2.5-3.0 clusters/ray vs the sphere
    # test's ~6.5-10, cutting expected cell-max rounds ~25 -> ~12-17.
    # Costs ~2x the pretest passes but skips the sieve matmul; bit-exact
    # overall (the pretest is conservative either way; rounds run the
    # exact per-sphere test).  When set, the sieveT input slot carries
    # the [Cp, 8] cluster AABB table (mn xyz | mx xyz) instead of the
    # split-exact bounding-sphere rows.
    use_box: bool = False
    # Direct world-space sphere normals: in world-sphere mode every
    # instance transform is rigid + uniform scale, so the surface normal
    # is (hit - c_world) * inv_r_world (sign of r preserved for bubble
    # interiors) — the 12 w2o slots drop out of the one-hot fetch, which
    # shrinks the fetch matmul from ~60 to ~24 rows (measured 0.87
    # us/cell-iter, the body's largest stage).  Off when the scene needs
    # sphere UVs (image textures ride the object-space normal for
    # rotated parameterizations); prepare_batch stores world c/r in the
    # 44:48 slots under the same condition so the XLA wavefront computes
    # the identical normal (bitwise kernel parity preserved).
    direct_normals: bool = False
    # Tri-gather sweep: triangles grouped into contiguous spatial
    # clusters of tri_g (models/sphere_order.apply_triangle_order), AABB
    # slab pretest over [128, 1024] + per-lane candidate rounds that
    # fetch each cluster's triangles with lane gathers — the same
    # sub-linear machinery as the sphere gather sweep, and bit-exact vs
    # the dense scalar tri sweep over the SAME (permuted) table.  The
    # TPU answer to the reference's triangle BLAS traversal
    # (acceleration.rs:268-294, ray_gen.glsl:467-478).  Requires
    # n_tclusters <= 128 (gather table width).
    tri_gather: bool = False
    tri_g: int = 16
    n_tclusters: int = 0
    # Fused animated scenes (static.anim_fuse): sphere world centers are
    # lerped IN-KERNEL at each sample's batch shutter time —
    # c(t) = c0 + t*dc, k(t) = k0 + t*(k1 + t*k2) with k0 = |c0|^2-r^2
    # precomputed in f64 (the 1000-radius ground sphere's 1e6 - 1e6
    # cancellation survives; the t-terms are motion-scale) — so one
    # endpoint+delta table serves EVERY batch and k progressive batches
    # fuse into one kernel call exactly like static scenes (the
    # divergence tail amortizes over the whole chunk instead of
    # resetting per batch).  All cull tables (cluster AABBs, bounds)
    # become shutter-conservative unions over the [0,1] motion segment
    # (linear motion: union of endpoint boxes).  Requires linear center
    # paths + constant radii (ops/spheres.world_sphere_anim_tables
    # verifies and returns None otherwise); forces use_box pretest,
    # gather-or-dense sweep, no steal/sel/sieve/mxu/item/tri/light.
    anim_lerp: bool = False
    # Light-table lane gather: alias-table row selection + the chosen
    # triangle's 9 coords fetched with take_along_axis from a VMEM
    # [11 * l_blocks, 128] table (field-major blocks of 128 lights)
    # instead of the SMEM compare-select loop, whose cost is 11 * L8
    # selects per bounce — 19.4 of simple-light's 21.9 us/cell-iter at
    # its 962 tessellated light triangles (diag_ablate, 2026-08-19).
    # Fetched values are the same f32 bits, so parity is unchanged.
    # l_blocks = ceil(L / 128); 0 keeps the select loop (small L, the
    # measured-good cornell path).
    light_gather: bool = False
    l_blocks: int = 0


def _fetch_rows(rowsT_ref, prim, P: int, layout):
    """One-hot MXU fetch as a SINGLE default-precision matmul.

    rowsT_ref rows: [shading | geo hi | geo lo | exact hi | exact mid |
    exact lo] (build_mega_tables).  The one-hot is 0/1 (exact in bf16)
    and accumulation is f32, so every fetched value is exactly
    bf16(row) — shading rows use that directly, geometry rows
    reconstruct ~16-bit-mantissa values as hi+lo, and "exact" rows
    (texture aux values whose error a sin()/floor() would amplify, e.g.
    noise scales) reconstruct full f32 via a _split3 triple.
    Eight per-sublane matmuls were MXU-latency-bound (~23 ns/ray measured);
    lane-concatenating the one-hots makes it one [M,P]@[P,1024] call."""
    shade, geo, exact = layout
    io = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
    oh = jnp.concatenate(
        [(io == prim[k:k + 1, :]).astype(jnp.float32) for k in range(SUB)],
        axis=1,
    )                                                           # [P, 1024]
    out = jax.lax.dot_general(
        rowsT_ref[:], oh, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)                     # [M, 1024]

    def row(r):
        return jnp.concatenate(
            [out[r:r + 1, k * 128:(k + 1) * 128] for k in range(SUB)], axis=0)

    slots = {j: row(r) for r, j in enumerate(shade)}
    nsh = len(shade)
    ngeo = len(geo)
    for r, j in enumerate(geo):
        slots[j] = (row(nsh + r) + row(nsh + ngeo + r)
                    + row(nsh + 2 * ngeo + r))
    nex = len(exact)
    base = nsh + 3 * ngeo
    for r, j in enumerate(exact):
        slots[j] = (row(base + r) + row(base + nex + r)
                    + row(base + 2 * nex + r))
    return slots


BIGF = 3.0e37  # "never": beyond any t / k (python float: kernel-immediate)


def _atan_pos(x):
    """atan for x >= 0 (Cephes atanf range reduction + degree-7 minimax,
    ~1e-7 abs err).  Mosaic has no atan2/acos lowering, so the deferred-
    image UV quantization builds them from mul/div/sqrt/select; at 5400
    texels per revolution a 1e-7 rad error moves a texel boundary by
    ~1e-4 texel — immaterial for the statistical-parity image family."""
    big = x > 2.414213562373095       # tan(3pi/8)
    mid = (x > 0.4142135623730951) & ~big   # tan(pi/8)
    xr = jnp.where(big, -1.0 / jnp.where(x == 0.0, 1.0, x),
                   jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    z = xr * xr
    p = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
          + 1.99777106478e-1) * z - 3.33329491539e-1)
    y = p * z * xr + xr
    return y + jnp.where(big, np.float32(np.pi / 2),
                         jnp.where(mid, np.float32(np.pi / 4), 0.0))


def _atan2_k(y, x):
    """IEEE-ish atan2 from _atan_pos (quadrant fixes; (0,0) -> 0)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    r = _atan_pos(ay / jnp.where(ax == 0.0, 1e-38, ax))
    r = jnp.where(ax == 0.0, np.float32(np.pi / 2), r)
    r = jnp.where(x < 0.0, np.float32(np.pi) - r, r)
    r = jnp.where(y < 0.0, -r, r)
    return jnp.where((ax == 0.0) & (ay == 0.0), 0.0, r)


def _acos_k(t):
    """acos via atan2(sqrt(1-t^2), t) (t pre-clipped to [-1, 1])."""
    s = jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0))
    return _atan2_k(s, t)


def _split3(x):
    """Lossless f32 -> 3 bf16-exact f32 terms (truncation split).

    hi/mid keep the top 16 bits of the f32 pattern (exactly bf16-
    representable); the <=8-bit remainders are bf16-exact too, so a single
    DEFAULT-precision one-hot matmul over [hi; mid; lo] reconstructs the
    original f32 bit-for-bit (products vs exact 0/1, f32 accumulation)."""
    mask = jnp.uint32(0xFFFF0000)
    bc = lambda v, t: jax.lax.bitcast_convert_type(v, t)
    hi = bc(bc(x, jnp.uint32) & mask, jnp.float32)
    r1 = x - hi
    mid = bc(bc(r1, jnp.uint32) & mask, jnp.float32)
    lo = r1 - mid
    return hi, mid, lo


def _sweep_selective(cfg: MegaConfig, bnd_ref, clu_ref, o: V3,
                     d: V3, active, nzero, a, inv_a, ddo, osq, bt, bid):
    """Per-lane cluster traversal of the clustered sphere section —
    the TPU shape of BVH traversal (no gathers):

    1. pretest: every lane slab-tests all C cluster AABBs (vector math
       from SMEM scalars, ~27 ops each) against its current best t (the
       dense prefix has usually already set bt from the ground sphere),
       building a per-lane candidate BITMASK (C <= 64 -> two int32s);
    2. rounds: each pending lane pops its lowest set bit (b = m & -m,
       index via popcount(b-1) — ~10 ops), the cluster's clu_g spheres
       are fetched with ONE one-hot MXU matmul ([3*G*4, Cp] @ [Cp, 1024],
       exact f32 via _split3) and tested;
    3. the cell stops when every lane's mask is empty.

    Ascending cluster order = ascending sphere id, so hit ties resolve
    exactly as the dense sweep's.  Sub-linear: a bounce ray's corridor
    crosses only a few tight boxes, so rounds ~ 2-6 instead of S/8 dense
    chunks."""
    C = cfg.n_clusters
    Cp = cfg.n_clusters_pad
    G = cfg.clu_g
    V = G * 4
    n_words = -(-C // 32)

    eps = 1e-12
    sd = lambda v: jnp.where(v < 0.0, -1.0, 1.0)
    ivx = 1.0 / jnp.where(jnp.abs(d.x) < eps, sd(d.x) * eps, d.x)
    ivy = 1.0 / jnp.where(jnp.abs(d.y) < eps, sd(d.y) * eps, d.y)
    ivz = 1.0 / jnp.where(jnp.abs(d.z) < eps, sd(d.z) * eps, d.z)

    izero = nzero.astype(jnp.int32)
    masks = [izero] * n_words
    for c in range(C):
        a0 = (bnd_ref[c, 0] - o.x) * ivx
        a1 = (bnd_ref[c, 3] - o.x) * ivx
        b0 = (bnd_ref[c, 1] - o.y) * ivy
        b1 = (bnd_ref[c, 4] - o.y) * ivy
        c0 = (bnd_ref[c, 2] - o.z) * ivz
        c1 = (bnd_ref[c, 5] - o.z) * ivz
        te = jnp.maximum(jnp.maximum(jnp.minimum(a0, a1),
                                     jnp.minimum(b0, b1)),
                         jnp.minimum(c0, c1))
        tx = jnp.minimum(jnp.minimum(jnp.maximum(a0, a1),
                                     jnp.maximum(b0, b1)),
                         jnp.maximum(c0, c1))
        plaus = active & (te <= tx) & (tx > T_MIN) & (te < bt)
        w, bit = divmod(c, 32)
        masks[w] = masks[w] | jnp.where(plaus, jnp.int32(1 << bit)
                                        if bit < 31 else jnp.int32(-2**31),
                                        0)

    return _cluster_rounds(cfg, clu_ref, o, d, a, inv_a, ddo, osq,
                           bt, bid, masks, izero)


def _cluster_rounds(cfg: MegaConfig, clu_ref, o: V3, d: V3, a, inv_a,
                    ddo, osq, bt, bid, masks, izero, fixed_trip=False):
    """Pop-lowest-bit cluster visiting shared by the selective sweep and
    the sieve: each pending lane pops its lowest set cluster bit
    (ascending id = dense-sweep tie order), ONE one-hot MXU matmul
    fetches the cluster's G spheres split-exactly, and the quadratic
    test runs in the dense sweep's exact op order — results are
    bit-identical to the dense scalar sweep.

    fixed_trip counts the worst lane's candidates ONCE (popcount + one
    cross-lane max) and runs a fori_loop — the while_loop variant pays a
    cross-lane any() reduction EVERY round, which dominated the sieve's
    cost on TPU."""
    Cp = cfg.n_clusters_pad
    G = cfg.clu_g
    V = G * 4
    n_words = len(masks)

    def any_pending(ms):
        acc = ms[0]
        for w in range(1, n_words):
            acc = acc | ms[w]
        return jnp.sum((acc != 0).astype(jnp.int32)) > 0

    def rcond(carry):
        bt, bid, *ms = carry
        return any_pending(ms)

    def rbody(carry):
        bt, bid, *ms = carry
        # lowest set bit across words -> cluster index + updated masks
        ci = izero
        taken = izero == 1  # all-false
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

        # one-hot fetch of the per-lane cluster's G spheres (4 fields)
        io = jax.lax.broadcasted_iota(jnp.int32, (Cp, 128), 0)
        oh = jnp.concatenate(
            [(io == ci[k:k + 1, :]).astype(jnp.float32) for k in range(SUB)],
            axis=1,
        )                                                       # [Cp, 1024]
        out = jax.lax.dot_general(
            clu_ref[:], oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)                 # [3V, 1024]
        summed = out[0:V] + out[V:2 * V] + out[2 * V:3 * V]     # exact f32

        def val(v):
            return jnp.concatenate(
                [summed[v:v + 1, k * 128:(k + 1) * 128] for k in range(SUB)],
                axis=0)

        base = cfg.n_prefix + ci * G
        for s in range(G):
            cx = val(s * 4 + 0)
            cy = val(s * 4 + 1)
            cz = val(s * 4 + 2)
            k = val(s * 4 + 3)
            dc = cx * d.x + cy * d.y + cz * d.z
            oc = cx * o.x + cy * o.y + cz * o.z
            h = ddo - dc
            c2 = osq - 2.0 * oc + k
            disc = h * h - a * c2
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (-h - sq) * inv_a
            t2 = (-h + sq) * inv_a
            ok = disc >= 0.0
            t = jnp.where(ok & (t1 > T_MIN) & (t1 < T_MAX), t1,
                          jnp.where(ok & (t2 > T_MIN) & (t2 < T_MAX),
                                    t2, T_MAX))
            better = pending & (t < bt)
            bt = jnp.where(better, t, bt)
            bid = jnp.where(better, base + s, bid)

        return tuple([bt, bid] + new_ms)

    if fixed_trip:
        cnt = izero
        for m in masks:
            cnt = cnt + jax.lax.population_count(m)
        n_rounds = jnp.max(cnt)
        out = jax.lax.fori_loop(
            0, n_rounds, lambda i, c: rbody(c), tuple([bt, bid] + masks))
    else:
        out = jax.lax.while_loop(rcond, rbody, tuple([bt, bid] + masks))
    return out[0], out[1]


def _blocked_while(tags, carry, rbody, merge, mask_off, cull_fn):
    """blockwhile:k — k straight-line rounds per while-loop iteration
    with ONE cross-lane any-pending check per block (the ~0.5us
    while-cond cost measured in round 2, amortized over k), plus an
    optional re-pretest cull at every block end: blockfori's
    unroll-grade scheduling WITHOUT forfeiting culling, and unlike
    blockfori's static ceil(max/k) trip the loop exits as soon as
    culling empties the surviving masks.  carry[mask_off:] must be the
    packed mask words.  Returns merge's result, or None when the tag is
    absent."""
    bw = [t for t in tags if t.startswith("blockwhile")]
    if not bw:
        return None
    k = int(bw[0].split(":")[1]) if ":" in bw[0] else 4

    def wcond(c):
        acc = c[mask_off]
        for m in c[mask_off + 1:]:
            acc = acc | m
        return jnp.any(acc != 0)

    def wbody(c):
        for j in range(k):
            c = rbody(j, c)
        if cull_fn is not None:
            c = cull_fn(c)
        return c

    return merge(jax.lax.while_loop(wcond, wbody, carry))


def _cluster_rounds_gather(cfg: MegaConfig, cluG_ref, o: V3, d: V3, a,
                           inv_a, ddo, osq, bt, bid, masks, izero,
                           remask=None, n_cwords=None, tcur=None):
    """Pop-lowest-bit cluster visiting with LANE-GATHER sphere fetch.

    cluG_ref is [G*4 rows (8-padded), 128]: row 4*s+f holds field f
    (cx, cy, cz, k) of sphere s for clusters 0..127 along the lane axis.
    Each pending lane pops its lowest set cluster bit (ascending id =
    dense-sweep tie order) and gathers its cluster's G spheres directly
    — exact f32 values, so the per-sphere quadratic is bit-identical to
    the dense scalar sweep (sph_8 op order).

    Counted fori trip (one upfront popcount + cross-lane max) per the
    round-2 measurement that a while-cond cross-lane reduction costs
    ~0.5us/iteration.

    With cfg.use_bands, `masks` holds near-band words then far-band
    words over the same clusters (word w covers clusters of word
    w % n_cwords); an explicit id tie-break keeps the dense sweep's
    lowest-id tie order under the out-of-order visiting.  `remask(bt)`
    (re-pretest against the improved bt) is applied every
    cfg.cull_every unrolled rounds and once more before the residual
    loop, whose trip count is recomputed from the SURVIVING masks."""
    G = cfg.clu_g
    n_words = len(masks)
    if n_cwords is None:
        n_cwords = n_words
    banded = n_words != n_cwords

    tags0 = set(cfg.ablate.split(","))
    uniform_ci = "uniformci" in tags0     # perf triage: uniform gathers
    no_fetch = "nofetch" in tags0         # perf triage: constant values

    def fetch(f, ci):
        # Load + broadcast INSIDE the loop body: keeping 4G broadcast
        # rows live across the round loop spills the register file
        # (measured 5x kernel slowdown); a VMEM row load is ~free.
        row = jnp.broadcast_to(cluG_ref[f:f + 1, :], (SUB, 128))
        if no_fetch:
            return row + (ci & 1).astype(jnp.float32)
        if uniform_ci:
            return jnp.take_along_axis(row, ci * 0 + (ci[0:1, 0:1] & 127),
                                       axis=1)
        return jnp.take_along_axis(row, ci, axis=1)

    # Idle-lane adoption (cfg.use_balance): lanes with no candidates take
    # the odd-position bits + ray of their +64 partner (roll by 64 over
    # 128 lanes is an involution, so pairs are symmetric).  rbody closes
    # over o/d/... late-bound, so rebinding them here redirects the whole
    # round loop; the merge below restores per-ray results exactly
    # ((t, id) lexicographic min == ascending-id strict-< sweep).
    balanced = cfg.use_balance == "idle" and "nobalance" not in tags0
    if balanced:
        rl = lambda x: pltpu.roll(x, 64, 1)
        cnt0 = izero
        for m in masks:
            cnt0 = cnt0 + jax.lax.population_count(m)
        take = (cnt0 == 0) & (rl(cnt0) >= 4)
        give = rl(take)
        _EV = jnp.int32(0x55555555)
        _OD = jnp.int32(-0x55555556)        # 0xAAAAAAAA
        masks = [jnp.where(take, rl(m) & _OD,
                           jnp.where(give, m & _EV, m)) for m in masks]
        bt_own, bid_own = bt, bid
        sel = lambda x: jnp.where(take, rl(x), x)
        o = V3(sel(o.x), sel(o.y), sel(o.z))
        d = V3(sel(d.x), sel(d.y), sel(d.z))
        a, inv_a, ddo, osq = sel(a), sel(inv_a), sel(ddo), sel(osq)
        bt = sel(bt)
        bid = jnp.where(take, rl(bid), bid)
        if tcur is not None:
            # adopted lanes trace their partner's sample, whose batch
            # (and thus shutter time) may differ
            tcur = sel(tcur)

    def merge(bt_r, bid_r):
        if not balanced:
            return bt_r, bid_r
        pb = pltpu.roll(bt_r, 64, 1)
        pi = pltpu.roll(bid_r, 64, 1)
        use = give & ((pb < bt_r) | ((pb == bt_r) & (pi < bid_r)))
        bt_f = jnp.where(use, pb, bt_r)
        bid_f = jnp.where(use, pi, bid_r)
        return (jnp.where(take, bt_own, bt_f),
                jnp.where(take, bid_own, bid_f))

    def rbody(i, carry):
        bt, bid, *ms = carry
        ci = izero
        taken = izero == 1  # all-false
        new_ms = []
        for w in range(n_words):
            m = ms[w]
            has = (m != 0) & ~taken
            b = m & -m
            idx = jax.lax.population_count(b - 1) + (32 * (w % n_cwords))
            ci = jnp.where(has, idx, ci)
            new_ms.append(jnp.where(has, m ^ b, m))
            taken = taken | has
        pending = taken

        base = cfg.n_prefix + ci * G
        for s in range(G):
            if cfg.anim_lerp:
                # 9-field rows (c0 xyz, k0, dc xyz, k1, k2): lerp the
                # center and k at the lane's current sample time (see
                # MegaConfig.anim_lerp; k0's f64-precomputed
                # cancellation survives the in-kernel t-terms).
                cx = fetch(9 * s + 0, ci) + tcur * fetch(9 * s + 4, ci)
                cy = fetch(9 * s + 1, ci) + tcur * fetch(9 * s + 5, ci)
                cz = fetch(9 * s + 2, ci) + tcur * fetch(9 * s + 6, ci)
                k = fetch(9 * s + 3, ci) + tcur * (
                    fetch(9 * s + 7, ci) + tcur * fetch(9 * s + 8, ci))
            else:
                cx = fetch(4 * s + 0, ci)
                cy = fetch(4 * s + 1, ci)
                cz = fetch(4 * s + 2, ci)
                k = fetch(4 * s + 3, ci)
            dc = cx * d.x + cy * d.y + cz * d.z
            oc = cx * o.x + cy * o.y + cz * o.z
            h = ddo - dc
            c2 = osq - 2.0 * oc + k
            # NaN-select: disc<0 makes sq NaN, every comparison below
            # fails and t falls through to T_MAX — equivalent to the
            # dense sweep's explicit ok/limit chain (t1<=t2 always, so
            # t1>=T_MAX implies no hit either way), 5 fewer VPU ops.
            sq = jnp.sqrt(h * h - a * c2)
            t1 = (-h - sq) * inv_a
            t2 = (-h + sq) * inv_a
            t = jnp.where(t1 > T_MIN, t1,
                          jnp.where(t2 > T_MIN, t2, T_MAX))
            t = jnp.where(t < T_MAX, t, T_MAX)
            sid = base + s
            if banded:
                better = pending & ((t < bt) | ((t == bt) & (sid < bid)))
            else:
                better = pending & (t < bt)
            bt = jnp.where(better, t, bt)
            bid = jnp.where(better, sid, bid)
        return tuple([bt, bid] + new_ms)

    def cull(carry):
        bt_c, bid_c, *ms = carry
        fresh = remask(bt_c)
        if balanced:
            # the re-pretest is computed against each lane's OWN ray;
            # adopted lanes carry their partner's ray, so they keep
            # their masks unculled.
            ms = [jnp.where(take, m, m & fresh[w % n_cwords])
                  for w, m in enumerate(ms)]
        else:
            ms = [m & fresh[w % n_cwords] for w, m in enumerate(ms)]
        return tuple([bt_c, bid_c] + ms)

    cnt = izero
    for m in masks:
        cnt = cnt + jax.lax.population_count(m)
    tags = set(cfg.ablate.split(","))
    if "norounds" in tags:     # perf triage: pretest cost only
        return bt, bid + jnp.minimum(cnt, 1) * 0
    fix = [t for t in tags if t.startswith("fixrounds")]
    unroll = [t for t in tags if t.startswith("unroll")]
    if fix:                    # perf triage: static trip count
        n_rounds = int(fix[0].split(":")[1]) if ":" in fix[0] else 8
        out = jax.lax.fori_loop(0, n_rounds, rbody,
                                tuple([bt, bid] + masks))
        return merge(out[0], out[1])
    blk = [t for t in tags if t.startswith("blockfori")]
    if blk:
        # Blocked counted trip (see _cluster_rounds_pair): k straight-
        # line rounds per fori iteration, trip ceil(max/k).
        k = int(blk[0].split(":")[1]) if ":" in blk[0] else 4

        def blkbody(i, c):
            for j in range(k):
                c = rbody(i * k + j, c)
            return c

        trip = (jnp.max(cnt) + (k - 1)) // k
        out = jax.lax.fori_loop(0, trip, blkbody,
                                tuple([bt, bid] + masks))
        return merge(out[0], out[1])
    out_bw = _blocked_while(tags, tuple([bt, bid] + masks), rbody,
                            lambda o: merge(o[0], o[1]), 2,
                            cull if remask is not None else None)
    if out_bw is not None:
        return out_bw
    n_un = cfg.rounds_unroll
    if unroll:                 # perf triage: override the unroll depth
        n_un = int(unroll[0].split(":")[1]) if ":" in unroll[0] else 12
    if n_un:
        carry = tuple([bt, bid] + masks)
        ce = cfg.cull_every if remask is not None else 0
        for r in range(n_un):
            carry = rbody(r, carry)
            if ce and (r + 1) % ce == 0 and r + 1 < n_un:
                carry = cull(carry)
        if remask is not None:
            # final cull, and the residual trip count comes from the
            # SURVIVING masks (exact), not initial cnt - n_un.
            carry = cull(carry)
            rcnt = izero
            for m in carry[2:]:
                rcnt = rcnt + jax.lax.population_count(m)
            residual = jnp.max(rcnt)
        else:
            residual = jnp.maximum(jnp.max(cnt) - n_un, 0)
        out = jax.lax.fori_loop(0, residual, rbody, carry)
        return merge(out[0], out[1])
    n_rounds = jnp.max(cnt)
    out = jax.lax.fori_loop(0, n_rounds, rbody, tuple([bt, bid] + masks))
    return merge(out[0], out[1])


def _cluster_rounds_pair(cfg: MegaConfig, cluG_ref, o: V3, d: V3, a,
                         inv_a, ddo, osq, bt, bid, masks_even, masks_odd,
                         izero, remask=None):
    """Gather rounds with PAIRWISE candidate splitting (use_balance="pair").

    Each lane pair (l, l+64) splits the pair's combined candidate list
    (lane l's candidates in ascending cluster id, then lane l+64's) by
    global-rank parity: even global ranks execute on the pair's first
    lane, odd on the second, so BOTH lanes sweep ceil((cA+cB)/2) rounds
    — the optimal 2-way split for any count distribution, vs the cell
    otherwise paying max(cA, cB).  masks_even / masks_odd carry each
    lane's own candidates at even / odd OWN-rank (packed at pretest time
    from one triangular matmul); the keep/adopt reshuffle below turns
    own-rank parity into global-rank parity using the first lane's count
    parity (global rank of a second-list candidate = cnt_first + rank).

    A lane drains its kept own candidates first (ascending id), then its
    adopted partner candidates (ascending id), selecting the matching
    ray per round; separate (own-ray, partner-ray) accumulators each see
    an ascending-id stream under strict <, and the final (t, id)
    lexicographic merge across the pair reproduces the dense ascending-
    id strict-< sweep bit-exactly."""
    G = cfg.clu_g
    n_words = len(masks_even)
    tags = set(cfg.ablate.split(","))
    uniform_ci = "uniformci" in tags
    no_fetch = "nofetch" in tags
    rl = lambda x: pltpu.roll(x, 64, 1)

    def fetch(f, ci):
        # Load + broadcast INSIDE the loop body (see _cluster_rounds_gather).
        row = jnp.broadcast_to(cluG_ref[f:f + 1, :], (SUB, 128))
        if no_fetch:
            return row + (ci & 1).astype(jnp.float32)
        if uniform_ci:
            return jnp.take_along_axis(row, ci * 0 + (ci[0:1, 0:1] & 127),
                                       axis=1)
        return jnp.take_along_axis(row, ci, axis=1)

    cnt_all = izero
    for m in masks_even:
        cnt_all = cnt_all + jax.lax.population_count(m)
    for m in masks_odd:
        cnt_all = cnt_all + jax.lax.population_count(m)
    lane = jax.lax.broadcasted_iota(jnp.int32, bt.shape, 1)
    is_first = lane < 64
    cnt_first = jnp.where(is_first, cnt_all, rl(cnt_all))
    f_even = (cnt_first & 1) == 0
    # keep: own candidates assigned to me.  First lane keeps even global
    # ranks = even own ranks; second lane keeps odd global ranks, whose
    # own-rank parity flips with cnt_first.
    keep = [jnp.where(is_first, me, jnp.where(f_even, mo, me))
            for me, mo in zip(masks_even, masks_odd)]
    # adopt: partner candidates assigned to me (tested against the
    # partner's ray).  First lane adopts even global ranks of the
    # partner's (second) list — own-rank parity flips with cnt_first;
    # second lane adopts odd global ranks of the first list = odd ranks.
    adopt = [jnp.where(is_first, jnp.where(f_even, rl(me), rl(mo)), rl(mo))
             for me, mo in zip(masks_even, masks_odd)]

    cnt = izero
    for m in keep:
        cnt = cnt + jax.lax.population_count(m)
    for m in adopt:
        cnt = cnt + jax.lax.population_count(m)
    if "norounds" in tags:     # perf triage: pretest + split cost only
        return bt, bid + jnp.minimum(cnt, 1) * 0

    # Partner-ray values (rolled once; loop-invariant).
    o2 = V3(rl(o.x), rl(o.y), rl(o.z))
    d2 = V3(rl(d.x), rl(d.y), rl(d.z))
    a2, inv_a2, ddo2, osq2 = rl(a), rl(inv_a), rl(ddo), rl(osq)

    bt_a0 = bt * 0.0 + T_MAX
    bid_a0 = izero + jnp.int32(0x3FFFFFFF)

    def rbody(i, carry):
        bt_s, bid_s, bt_a, bid_a = carry[:4]
        kws, aws = carry[4:4 + n_words], carry[4 + n_words:]
        ci = izero
        taken = izero == 1  # all-false
        new_k, new_a = [], []
        for w in range(n_words):
            m = kws[w]
            has = (m != 0) & ~taken
            b = m & -m
            idx = jax.lax.population_count(b - 1) + 32 * w
            ci = jnp.where(has, idx, ci)
            new_k.append(jnp.where(has, m ^ b, m))
            taken = taken | has
        own = taken
        for w in range(n_words):
            m = aws[w]
            has = (m != 0) & ~taken
            b = m & -m
            idx = jax.lax.population_count(b - 1) + 32 * w
            ci = jnp.where(has, idx, ci)
            new_a.append(jnp.where(has, m ^ b, m))
            taken = taken | has
        pending = taken

        sel = lambda x, y: jnp.where(own, x, y)
        ox, oy, oz = sel(o.x, o2.x), sel(o.y, o2.y), sel(o.z, o2.z)
        dx, dy, dz = sel(d.x, d2.x), sel(d.y, d2.y), sel(d.z, d2.z)
        a_c, inv_a_c = sel(a, a2), sel(inv_a, inv_a2)
        ddo_c, osq_c = sel(ddo, ddo2), sel(osq, osq2)
        bt_c, bid_c = sel(bt_s, bt_a), sel(bid_s, bid_a)

        base = cfg.n_prefix + ci * G
        for s in range(G):
            cx = fetch(4 * s + 0, ci)
            cy = fetch(4 * s + 1, ci)
            cz = fetch(4 * s + 2, ci)
            k = fetch(4 * s + 3, ci)
            dc = cx * dx + cy * dy + cz * dz
            oc = cx * ox + cy * oy + cz * oz
            h = ddo_c - dc
            c2 = osq_c - 2.0 * oc + k
            sq = jnp.sqrt(h * h - a_c * c2)
            t1 = (-h - sq) * inv_a_c
            t2 = (-h + sq) * inv_a_c
            t = jnp.where(t1 > T_MIN, t1,
                          jnp.where(t2 > T_MIN, t2, T_MAX))
            t = jnp.where(t < T_MAX, t, T_MAX)
            better = pending & (t < bt_c)
            bt_c = jnp.where(better, t, bt_c)
            bid_c = jnp.where(better, base + s, bid_c)
        bt_s = jnp.where(own, bt_c, bt_s)
        bid_s = jnp.where(own, bid_c, bid_s)
        bt_a = jnp.where(own, bt_a, bt_c)
        bid_a = jnp.where(own, bid_a, bid_c)
        return tuple([bt_s, bid_s, bt_a, bid_a] + new_k + new_a)

    def merge(out):
        bt_s, bid_s, bt_a, bid_a = out[:4]
        pb, pi = rl(bt_a), rl(bid_a)
        use = (pb < bt_s) | ((pb == bt_s) & (pi < bid_s))
        return jnp.where(use, pb, bt_s), jnp.where(use, pi, bid_s)

    carry = tuple([bt, bid, bt_a0, bid_a0] + keep + adopt)
    fix = [t for t in tags if t.startswith("fixrounds")]
    if fix:                    # perf triage: static trip count
        n_rounds = int(fix[0].split(":")[1]) if ":" in fix[0] else 8
        return merge(jax.lax.fori_loop(0, n_rounds, rbody, carry))
    blk = [t for t in tags if t.startswith("blockfori")]
    if blk:
        # Blocked counted trip: k straight-line rounds per fori iteration
        # (unroll-grade scheduling) with trip ceil(max/k) (no fixed-
        # unroll rounds wasted on cells whose max is below the unroll).
        k = int(blk[0].split(":")[1]) if ":" in blk[0] else 4

        def blkbody(i, c):
            for j in range(k):
                c = rbody(i * k + j, c)
            return c

        trip = (jnp.max(cnt) + (k - 1)) // k
        return merge(jax.lax.fori_loop(0, trip, blkbody, carry))
    def cull_pair(c):
        # Upper bound of MY ray's final t: my own-stream accumulator
        # joined with the partner's adopted-stream accumulator FOR MY
        # ray (its bt_a, rolled to me).  remask's *1.0001 + 1e-4
        # margin only culls entries strictly beyond the bound, so
        # (t, id) lexicographic ties are untouched — the same
        # argument as the gather cull.  Kept masks are MY candidates
        # against MY ray -> AND with my fresh words; adopted masks
        # are PARTNER candidates against the partner's ray -> AND
        # with the partner's fresh words, rolled into my lane.
        bt_s, bid_s, bt_a, bid_a = c[:4]
        fresh = remask(jnp.minimum(bt_s, rl(bt_a)))
        kws = [m & fresh[w] for w, m in enumerate(c[4:4 + n_words])]
        aws = [m & rl(fresh[w])
               for w, m in enumerate(c[4 + n_words:])]
        return tuple([bt_s, bid_s, bt_a, bid_a] + kws + aws)

    out_bw = _blocked_while(tags, carry, rbody, merge, 4,
                            cull_pair if remask is not None else None)
    if out_bw is not None:
        return out_bw
    n_un = cfg.rounds_unroll
    unroll = [t for t in tags if t.startswith("unroll")]
    if unroll:                 # perf triage: override the unroll depth
        n_un = int(unroll[0].split(":")[1]) if ":" in unroll[0] else 12
    if n_un:
        ce = cfg.cull_every if remask is not None else 0
        for r in range(n_un):
            carry = rbody(r, carry)
            if ce and (r + 1) % ce == 0 and r + 1 < n_un:
                carry = cull_pair(carry)
        if remask is not None:
            # final cull; exact residual from the SURVIVING masks (see
            # _cluster_rounds_gather).
            carry = cull_pair(carry)
            rcnt = izero
            for m in carry[4:]:
                rcnt = rcnt + jax.lax.population_count(m)
            residual = jnp.max(rcnt)
        else:
            residual = jnp.maximum(jnp.max(cnt) - n_un, 0)
        return merge(jax.lax.fori_loop(0, residual, rbody, carry))
    return merge(jax.lax.fori_loop(0, jnp.max(cnt), rbody, carry))


def _flat_row(x):
    """(8,128) lane tile -> (1,1024) row (sublane-major lane order).

    Each sublane is rotated to offset 0 before slicing: Mosaic refuses a
    lane-axis concat whose inputs sit at different sublane offsets."""
    parts = []
    for k in range(SUB):
        xr = pltpu.roll(x, SUB - k, 0) if k else x
        parts.append(xr[0:1, :])
    return jnp.concatenate(parts, axis=1)


def _unflat_row(r):
    """(1,1024) row -> (8,128) lane tile (inverse of _flat_row)."""
    return jnp.concatenate(
        [r[:, k * 128:(k + 1) * 128] for k in range(SUB)], axis=0)


def _ray_rhs(o: V3, d: V3):
    """[72, 2048] split ray rows for the sphere matmuls (d block then o
    block; 9 cross-paired 8-row blocks, see _sweep_mxu.split_rows)."""

    def split_rows(v: V3, last: float):
        comps = [_flat_row(v.x), _flat_row(v.y), _flat_row(v.z),
                 jnp.full((1, CELL), last, jnp.float32)]
        splits = [_split3(c) for c in comps]
        z = jnp.zeros((1, CELL), jnp.float32)
        blocks = []
        for _sph_level in range(3):
            for ray_level in range(3):
                rows = [splits[c][ray_level] for c in range(4)]
                blocks.append(jnp.concatenate(rows + [z, z, z, z], axis=0))
        return jnp.concatenate(blocks, axis=0)

    return jnp.concatenate(
        [split_rows(d, 0.0), split_rows(o, -0.5)], axis=1)


def _sweep_sieve(cfg: MegaConfig, sieveT_ref, w_ref, clu_ref, o: V3, d: V3,
                 active, a, inv_a, ddo, osq, bt, bid, nzero, tcur=None):
    """Cluster-sieve sphere sweep — sub-linear AND bit-exact.

    One matmul computes (c.d, c.o - k/2) for every CLUSTER's
    bounding sphere; an elementwise quadratic pass over [Cp, 1024] builds
    a conservative per-lane candidate bitmask (disc >= -eps margin, exit
    in front, entry before the current best t from the dense prefix),
    reduced to packed words with one powers-of-two matmul.  The rounds
    then fetch only candidate clusters and run the dense sweep's exact
    per-sphere test (_cluster_rounds), so results are bit-identical to
    the dense scalar sweep — the pretest margins only cost a few extra
    rounds.  Measured candidate stats on final-one-weekend
    (tools_dev/cull_study.py): mean ~3.4 clusters/ray, cell-max ~10-16.
    """
    Cp = cfg.n_clusters_pad
    C = cfg.n_clusters

    tags = set(cfg.ablate.split(","))
    if "nosieve" in tags:      # perf triage: body + prefix only
        return bt, bid

    active_f = _flat_row(active.astype(jnp.float32))
    n_words = -(-C // 32)
    izero = (nzero).astype(jnp.int32)

    if cfg.use_box:
        # AABB slab pretest (cfg.use_box): sieveT_ref is the [Cp, 8]
        # cluster AABB table (mn xyz | mx xyz, rows >= C inverted).
        # Conservative in f32: boxes are pre-inflated (cluster_aabbs
        # pad) beyond slab rounding; the eps clamp keeps 0 * inf NaNs
        # out of degenerate-direction lanes (ivd <= 1e30, and a
        # lo == o face gives 0, not NaN).  Entry/exit bounds are
        # conservative vs any contained sphere's t, so the t-prune
        # terms mirror the bounding-sphere test's margins.
        eps = jnp.float32(1e-30)

        def ivc(dx):
            return 1.0 / jnp.where(jnp.abs(dx) < eps,
                                   jnp.where(dx < 0, -eps, eps), dx)

        te = None
        tx = None
        for ax, (oA, dA) in enumerate(((o.x, d.x), (o.y, d.y), (o.z, d.z))):
            oA_f = _flat_row(oA)
            ivA = ivc(_flat_row(dA))
            a0 = (sieveT_ref[:, ax:ax + 1] - oA_f) * ivA   # [Cp, 1024]
            a1 = (sieveT_ref[:, 3 + ax:4 + ax] - oA_f) * ivA
            tn = jnp.minimum(a0, a1)
            tf = jnp.maximum(a0, a1)
            te = tn if te is None else jnp.maximum(te, tn)
            tx = tf if tx is None else jnp.minimum(tx, tf)
        t1 = te                                            # bands pivot basis

        def sel_of(bt_cur):
            bt_f = _flat_row(bt_cur)
            return ((te <= tx) & (tx > T_MIN)
                    & (te < bt_f * 1.0001 + 1e-4))
    else:
        rhs = _ray_rhs(o, d)
        out = jax.lax.dot_general(
            sieveT_ref[:], rhs, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)            # [Cp, 2048]
        if "sieve-mm" in tags:     # perf triage: rhs build + matmul only
            return jnp.minimum(bt, _unflat_row(out[0:1, :CELL]) + BIGF), bid
        cd = out[:, :CELL]
        co2 = out[:, CELL:]
        h = _flat_row(ddo) - cd                            # [Cp, 1024]
        c2 = _flat_row(osq) - 2.0 * co2
        a_f = _flat_row(a)
        inv_a_f = _flat_row(inv_a)
        hh = h * h
        ac2 = a_f * c2
        disc = hh - ac2
        margin = 1e-4 * (hh + jnp.abs(ac2)) + 1e-8
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-h - sq) * inv_a_f
        t2 = (-h + sq) * inv_a_f

        def sel_of(bt_cur):
            # bt only enters through this compare: a re-cull against an
            # improved bt reuses the quadratic terms above.
            bt_f = _flat_row(bt_cur)
            return ((disc >= -margin) & (t2 > T_MIN)
                    & (t1 < bt_f * 1.0001 + 1e-4))

    def pack(sel):
        # powers-of-two matmul -> 16-bit half-words (exact in f32),
        # packed into int32 mask words for the round loop.
        mask_f = sel.astype(jnp.float32) * active_f        # [Cp, 1024]
        words16 = jax.lax.dot_general(
            w_ref[:], mask_f, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)            # [8, 1024]
        out = []
        for w in range(n_words):
            lo = _unflat_row(words16[2 * w:2 * w + 1]).astype(jnp.int32)
            hi = _unflat_row(words16[2 * w + 1:2 * w + 2]).astype(jnp.int32)
            out.append(lo | (hi << 16))
        return out

    sel0 = sel_of(bt)
    if "sieve-mask" in tags:   # perf triage: + quadratic passes, no pack
        mask_f = sel0.astype(jnp.float32) * active_f
        return jnp.minimum(bt, _unflat_row(mask_f[0:1]) + BIGF), bid

    remask = (lambda b: pack(sel_of(b))) if cfg.cull_every else None

    if cfg.use_balance == "pair" and cfg.use_gather:
        # Pairwise split (use_balance="pair"): per-candidate OWN rank
        # from one strict-lower-triangular matmul (0/1 entries, exact in
        # any matmul precision; counts <= Cp are exact f32 sums), split
        # by rank parity into two packed mask sets.  The global-rank
        # reshuffle happens lane-locally in _cluster_rounds_pair.
        ii = jax.lax.broadcasted_iota(jnp.int32, (Cp, Cp), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (Cp, Cp), 1)
        tril = (jj < ii).astype(jnp.float32)
        mask_f0 = sel0.astype(jnp.float32) * active_f
        pre = jax.lax.dot_general(
            tril, mask_f0, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)            # [Cp, 1024]
        even_r = (pre - 2.0 * jnp.floor(pre * 0.5)) == 0.0
        masks_even = pack(sel0 & even_r)
        masks_odd = pack(sel0 & ~even_r)
        return _cluster_rounds_pair(cfg, clu_ref, o, d, a, inv_a, ddo,
                                    osq, bt, bid, masks_even, masks_odd,
                                    izero, remask=remask)

    if cfg.use_bands and cfg.use_gather:
        # Per-lane entry-distance pivot: near candidates (t1 <= pivot)
        # drain first.  Lanes without candidates get a garbage pivot on
        # empty masks — harmless.
        frac = 0.5
        piv = [t for t in tags if t.startswith("pivot")]
        if piv and ":" in piv[0]:
            frac = float(piv[0].split(":")[1])
        tc_min = jnp.min(jnp.where(sel0, t1, BIGF), axis=0, keepdims=True)
        tc_max = jnp.max(jnp.where(sel0, t1, -BIGF), axis=0, keepdims=True)
        pivot = tc_min + frac * (tc_max - tc_min)
        masks = pack(sel0 & (t1 <= pivot)) + pack(sel0 & (t1 > pivot))
    else:
        masks = pack(sel0)

    if cfg.use_gather:
        return _cluster_rounds_gather(cfg, clu_ref, o, d, a, inv_a, ddo,
                                      osq, bt, bid, masks, izero,
                                      remask=remask, n_cwords=n_words,
                                      tcur=tcur)
    return _cluster_rounds(cfg, clu_ref, o, d, a, inv_a, ddo, osq,
                           bt, bid, masks, izero, fixed_trip=True)


def _sweep_mxu(cfg: MegaConfig, sphT_ref, o: V3, d: V3,
               a, inv_a, ddo, osq, bt, bid):
    """All-sphere closest hit with the dot products on the MXU.

    sphT_ref is [12, S_pad]: (cx, cy, cz, k) as _split3 hi/mid/lo rows —
    one DEFAULT-precision matmul against the split per-lane ray rows
    yields c.d and (c.o - k/2) for every sphere at once, exact except
    for f32 accumulation order (<= a few ulp vs the scalar sweep).  The
    quadratic solve then runs as elementwise passes over [S, 1024];
    negative discriminants propagate NaN through sqrt, which fails every
    comparison and selects T_MAX (no explicit validity mask).

    Replaces ~35 scalar ops/sphere with ~21 [S,1024] passes + the
    min/argmin reduction.  Tie-break matches the scalar sweep (argmin
    picks the lowest sphere id).  Row layout: nine 8-row cross-product
    blocks, rows 4-7 of each zero-padded so every concat offset is
    8-aligned for Mosaic (see _ray_rhs / build_mega_tables)."""
    # One DEFAULT-precision pass over the 72-row split tables beats the
    # built-in exact alternative by ~2x: Precision.HIGHEST on plain f32
    # rows measured 10.75us/iter vs 6.2 for this arrangement.
    rhs = _ray_rhs(o, d)                               # [72, 2048]
    out = jax.lax.dot_general(
        sphT_ref[:], rhs, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)            # [S, 2048]
    cd = out[:, :CELL]
    co2 = out[:, CELL:]

    ddo_f = _flat_row(ddo)
    osq_f = _flat_row(osq)
    inv_a_f = _flat_row(inv_a)
    a_f = _flat_row(a)

    # Blockwise solve: 8 sphere rows at a time with a running (t, block)
    # minimum — the whole quadratic stays register-resident instead of
    # materializing ~8 [S,1024] temporaries through VMEM (measured: the
    # full-matrix formulation cost ~5.2us/iter of the 6.2 total).
    # Ascending block order + strict < keeps the dense sweep's lowest-id
    # tie-break: ties across blocks keep the earlier block, ties within
    # a block resolve to the lowest sublane in the final reduction.
    S = cd.shape[0]
    nblk = S // SUB
    bt8 = jnp.full((SUB, CELL), T_MAX, jnp.float32)
    blk8 = jnp.zeros((SUB, CELL), jnp.int32)
    for b in range(nblk):
        sl = slice(b * SUB, (b + 1) * SUB)
        h = ddo_f - cd[sl]                             # [8, 1024]
        c2 = osq_f - 2.0 * co2[sl]
        sq = jnp.sqrt(h * h - a_f * c2)                # NaN when disc < 0
        t1 = (-h - sq) * inv_a_f
        t2 = (-h + sq) * inv_a_f
        t = jnp.where((t1 > T_MIN) & (t1 < T_MAX), t1,
                      jnp.where((t2 > T_MIN) & (t2 < T_MAX), t2, T_MAX))
        better = t < bt8
        bt8 = jnp.where(better, t, bt8)
        blk8 = jnp.where(better, b, blk8)

    # Cross-sublane reduction: rows at sublane offset r hold sphere ids
    # blk8*8 + r; lowest sublane wins ties.
    best = bt8[0:1, :]
    sid = blk8[0:1, :] * SUB
    for r in range(1, SUB):
        tr_ = pltpu.roll(bt8, SUB - r, 0)[0:1, :]
        ir_ = pltpu.roll(blk8, SUB - r, 0)[0:1, :] * SUB + r
        win = (tr_ < best) | ((tr_ == best) & (ir_ < sid))
        best = jnp.where(win, tr_, best)
        sid = jnp.where(win, ir_, sid)
    bt_m = _unflat_row(best)
    bid_m = _unflat_row(sid)
    better = bt_m < bt
    return (jnp.where(better, bt_m, bt),
            jnp.where(better, bid_m, bid))


def _sweep_tri_gather(cfg: MegaConfig, tsieveT_ref, tw_ref, triG_ref,
                      o: V3, d: V3, active, bt, bid, bu, bv, tpx, tpy, tpz,
                      nzero):
    """Cluster-selective triangle sweep — sub-linear AND bit-exact.

    tsieveT_ref [128, 8]: per-cluster AABBs (mn xyz | mx xyz) of the
    contiguous tri_g-triangle clusters laid out by
    models/sphere_order.apply_triangle_order.  One conservative slab
    pretest over [128, 1024] builds the per-lane candidate bitmask
    (reduced to packed words with the powers-of-two matmul); the rounds
    then pop clusters in ascending id order and run the dense tri
    sweep's EXACT Moller-Trumbore op order on lane-gathered f32 fields,
    so results are bit-identical to the dense scalar sweep over the
    same (permuted) table.  bt arrives seeded by the sphere sweep, so
    the pretest's t-prune already skips clusters behind a sphere hit.

    This is the megakernel's answer to the reference's triangle BLAS
    (acceleration.rs:268-294 + ray_gen.glsl:467-478): table proximity +
    slab pretest replace the RT-core BVH, sized for 10k-class OBJ
    meshes the dense sweep can't reach."""
    C = cfg.n_tclusters
    G = cfg.tri_g
    n_words = -(-C // 32)
    izero = nzero.astype(jnp.int32)
    active_f = _flat_row(active.astype(jnp.float32))
    tags = set(cfg.ablate.split(","))

    # AABB slab pretest (same conservative form as the sphere box
    # pretest; see _sweep_sieve's use_box branch for the eps/NaN notes).
    eps = jnp.float32(1e-30)

    def ivc(dx):
        return 1.0 / jnp.where(jnp.abs(dx) < eps,
                               jnp.where(dx < 0, -eps, eps), dx)

    te = None
    tx = None
    for ax, (oA, dA) in enumerate(((o.x, d.x), (o.y, d.y), (o.z, d.z))):
        oA_f = _flat_row(oA)
        ivA = ivc(_flat_row(dA))
        a0 = (tsieveT_ref[:, ax:ax + 1] - oA_f) * ivA      # [128, 1024]
        a1 = (tsieveT_ref[:, 3 + ax:4 + ax] - oA_f) * ivA
        tn = jnp.minimum(a0, a1)
        tf = jnp.maximum(a0, a1)
        te = tn if te is None else jnp.maximum(te, tn)
        tx = tf if tx is None else jnp.minimum(tx, tf)
    bt_f = _flat_row(bt)
    sel = (te <= tx) & (tx > T_MIN) & (te < bt_f * 1.0001 + 1e-4)

    # powers-of-two matmul -> packed int32 mask words (columns >= C are
    # zero in tw_ref, so empty/padding clusters never get a bit — that
    # masking is load-bearing, as in the sphere pack).
    mask_f = sel.astype(jnp.float32) * active_f            # [128, 1024]
    words16 = jax.lax.dot_general(
        tw_ref[:], mask_f, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)                # [8, 1024]
    masks = []
    for w in range(n_words):
        lo = _unflat_row(words16[2 * w:2 * w + 1]).astype(jnp.int32)
        hi = _unflat_row(words16[2 * w + 1:2 * w + 2]).astype(jnp.int32)
        masks.append(lo | (hi << 16))

    def fetch(f, ci):
        row = jnp.broadcast_to(triG_ref[f:f + 1, :], (SUB, 128))
        return jnp.take_along_axis(row, ci, axis=1)

    def rbody(i, carry):
        bt, bid, bu, bv, tpx, tpy, tpz, *ms = carry
        ci = izero
        taken = izero == 1  # all-false
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

        base = ci * G
        for s in range(G):
            v0x = fetch(9 * s + 0, ci)
            v0y = fetch(9 * s + 1, ci)
            v0z = fetch(9 * s + 2, ci)
            e1x = fetch(9 * s + 3, ci)
            e1y = fetch(9 * s + 4, ci)
            e1z = fetch(9 * s + 5, ci)
            e2x = fetch(9 * s + 6, ci)
            e2y = fetch(9 * s + 7, ci)
            e2z = fetch(9 * s + 8, ci)
            # dense tri sweep's exact op order (padding triangles are
            # degenerate — e1 = e2 = 0 gives det == 0, the same
            # exclusion the dense sweep's `valid` flag provides)
            px = d.y * e2z - d.z * e2y
            py = d.z * e2x - d.x * e2z
            pz = d.x * e2y - d.y * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(det != 0.0,
                                1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
            ox = o.x - v0x
            oy = o.y - v0y
            oz = o.z - v0z
            uu = (ox * px + oy * py + oz * pz) * inv_det
            qx = oy * e1z - oz * e1y
            qy = oz * e1x - ox * e1z
            qz = ox * e1y - oy * e1x
            vv = (d.x * qx + d.y * qy + d.z * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ((det != 0.0) & (uu >= 0.0) & (vv >= 0.0)
                  & (uu + vv <= 1.0) & (t > T_MIN) & (t < T_MAX))
            t = jnp.where(ok, t, T_MAX)
            better = pending & (t < bt)
            bt = jnp.where(better, t, bt)
            bid = jnp.where(better, cfg.s_pad + base + s, bid)
            bu = jnp.where(better, uu, bu)
            bv = jnp.where(better, vv, bv)
            tpx = jnp.where(better, v0x + uu * e1x + vv * e2x, tpx)
            tpy = jnp.where(better, v0y + uu * e1y + vv * e2y, tpy)
            tpz = jnp.where(better, v0z + uu * e1z + vv * e2z, tpz)
        return tuple([bt, bid, bu, bv, tpx, tpy, tpz] + new_ms)

    carry0 = tuple([bt, bid, bu, bv, tpx, tpy, tpz] + masks)
    merge = lambda c: c[:7]
    cnt = izero
    for m in masks:
        cnt = cnt + jax.lax.population_count(m)
    if "trinorounds" in tags:  # perf triage: pretest cost only
        return (bt, bid + jnp.minimum(cnt, 1) * 0, bu, bv, tpx, tpy, tpz)
    blk = [t_ for t_ in tags if t_.startswith("blockfori")]
    if blk:
        k = int(blk[0].split(":")[1]) if ":" in blk[0] else 4

        def blkbody(i, c):
            for j in range(k):
                c = rbody(i * k + j, c)
            return c

        trip = (jnp.max(cnt) + (k - 1)) // k
        return merge(jax.lax.fori_loop(0, trip, blkbody, carry0))
    out_bw = _blocked_while(tags, carry0, rbody, merge, 7, None)
    if out_bw is not None:
        return out_bw
    n_un = cfg.rounds_unroll
    if n_un:
        carry = carry0
        for r in range(n_un):
            carry = rbody(r, carry)
        residual = jnp.maximum(jnp.max(cnt) - n_un, 0)
        return merge(jax.lax.fori_loop(0, residual, rbody, carry))
    n_rounds = jnp.max(cnt)
    return merge(jax.lax.fori_loop(0, n_rounds, rbody, carry0))


def _sweep(cfg: MegaConfig, sph_ref, sphT_ref, sieveT_ref, w_ref, bnd_ref,
           clu_ref, tri_ref, tsieveT_ref, tw_ref, triG_ref,
           o: V3, d: V3, active, nzero, tcur=None):
    """Closest hit: scalar-loop sweep over SMEM tables, unrolled x8.

    With use_mxu_sweep the sphere block goes through _sweep_mxu (dot
    products on the MXU, elementwise solve over [S,1024]).  With
    use_sel, only the n_prefix "global" spheres are swept densely and
    the remaining clustered spheres go through _sweep_selective
    (per-lane nearest-first cluster traversal — sub-linear in S).

    Returns (t, prim, is_sphere, bu, bv, tri_p) matching
    engine.wavefront.RawHit conventions (prim = sphere id | s_pad + tri)."""
    a = vec3.dot(d, d)
    inv_a = 1.0 / a
    ddo = vec3.dot(d, o)
    osq = vec3.dot(o, o)

    bt = nzero + T_MAX
    bid = (nzero - 1.0).astype(jnp.int32)
    bu = nzero
    bv = nzero
    # triangle hit position, captured with the packed-path formula
    # v0 + u*e1 + v*e2 (wavefront.reconstruct_hit) for exact parity
    tpx = nzero
    tpy = nzero
    tpz = nzero

    if cfg.n_spheres:
        S8 = -(-cfg.n_spheres // 8) * 8

        def sph_8(ci, bt, bid):
            # anim_lerp: the table's second half holds per-sphere motion
            # rows (dc xyz, k1, k2); centers/k lerp at the lane's current
            # sample time (MegaConfig.anim_lerp).
            RD = sph_ref.shape[0] // 2 if cfg.anim_lerp else 0
            for u in range(8):
                si = ci * 8 + u
                cx = sph_ref[si, 0]
                cy = sph_ref[si, 1]
                cz = sph_ref[si, 2]
                k = sph_ref[si, 4]
                if cfg.anim_lerp:
                    cx = cx + tcur * sph_ref[si + RD, 0]
                    cy = cy + tcur * sph_ref[si + RD, 1]
                    cz = cz + tcur * sph_ref[si + RD, 2]
                    k = k + tcur * (sph_ref[si + RD, 4]
                                    + tcur * sph_ref[si + RD, 5])
                dc = cx * d.x + cy * d.y + cz * d.z
                oc = cx * o.x + cy * o.y + cz * o.z
                h = ddo - dc
                c2 = osq - 2.0 * oc + k
                disc = h * h - a * c2
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t1 = (-h - sq) * inv_a
                t2 = (-h + sq) * inv_a
                ok = disc >= 0.0
                t = jnp.where(ok & (t1 > T_MIN) & (t1 < T_MAX), t1,
                              jnp.where(ok & (t2 > T_MIN) & (t2 < T_MAX),
                                        t2, T_MAX))
                better = t < bt
                bt = jnp.where(better, t, bt)
                bid = jnp.where(better, si, bid)
            return bt, bid

        if cfg.use_sieve or cfg.use_gather:
            # Dense prefix first (scalar, bit-exact) seeds bt for the
            # sieve's entry-distance prune.
            n_pref8 = min(-(-cfg.n_prefix // 8), S8 // 8)
            def pref_chunk(ci, carry):
                return sph_8(ci, *carry)
            if "nopref" not in set(cfg.ablate.split(",")):  # perf triage
                bt, bid = jax.lax.fori_loop(
                    0, n_pref8, pref_chunk, (bt, bid))
            bt, bid = _sweep_sieve(
                cfg, sieveT_ref, w_ref, clu_ref, o, d, active,
                a, inv_a, ddo, osq, bt, bid, nzero, tcur=tcur)
        elif cfg.use_mxu_sweep:
            bt, bid = _sweep_mxu(
                cfg, sphT_ref, o, d, a, inv_a, ddo, osq, bt, bid)
        elif cfg.use_sel:
            # Dense "global" prefix (ground/hero-scale spheres); chunks may
            # overlap into the clustered section — harmless (min is
            # idempotent), it just re-tests a few spheres.
            n_pref8 = min(-(-cfg.n_prefix // 8), S8 // 8)
            def sph_chunk(ci, carry):
                return sph_8(ci, *carry)
            bt, bid = jax.lax.fori_loop(0, n_pref8, sph_chunk, (bt, bid))
            bt, bid = _sweep_selective(
                cfg, bnd_ref, clu_ref, o, d, active, nzero,
                a, inv_a, ddo, osq, bt, bid)
        else:
            def sph_chunk(ci, carry):
                return sph_8(ci, *carry)

            bt, bid = jax.lax.fori_loop(0, S8 // 8, sph_chunk, (bt, bid))

    if cfg.n_tris and cfg.tri_gather:
        bt, bid, bu, bv, tpx, tpy, tpz = _sweep_tri_gather(
            cfg, tsieveT_ref, tw_ref, triG_ref, o, d, active,
            bt, bid, bu, bv, tpx, tpy, tpz, nzero)
    elif cfg.n_tris:
        T8 = -(-cfg.n_tris // 8) * 8

        def tri_chunk(ci, carry):
            bt, bid, bu, bv, tpx, tpy, tpz = carry
            for w in range(8):
                tj = ci * 8 + w
                v0x = tri_ref[tj, 0]
                v0y = tri_ref[tj, 1]
                v0z = tri_ref[tj, 2]
                e1x = tri_ref[tj, 3]
                e1y = tri_ref[tj, 4]
                e1z = tri_ref[tj, 5]
                e2x = tri_ref[tj, 6]
                e2y = tri_ref[tj, 7]
                e2z = tri_ref[tj, 8]
                valid = tri_ref[tj, 9]
                px = d.y * e2z - d.z * e2y
                py = d.z * e2x - d.x * e2z
                pz = d.x * e2y - d.y * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(det != 0.0,
                                    1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
                tx = o.x - v0x
                ty = o.y - v0y
                tz = o.z - v0z
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (d.x * qx + d.y * qy + d.z * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((valid > 0.0) & (det != 0.0) & (uu >= 0.0) & (vv >= 0.0)
                      & (uu + vv <= 1.0) & (t > T_MIN) & (t < T_MAX))
                t = jnp.where(ok, t, T_MAX)
                better = t < bt
                bt = jnp.where(better, t, bt)
                bid = jnp.where(better, cfg.s_pad + tj, bid)
                bu = jnp.where(better, uu, bu)
                bv = jnp.where(better, vv, bv)
                tpx = jnp.where(better, v0x + uu * e1x + vv * e2x, tpx)
                tpy = jnp.where(better, v0y + uu * e1y + vv * e2y, tpy)
                tpz = jnp.where(better, v0z + uu * e1z + vv * e2z, tpz)
            return bt, bid, bu, bv, tpx, tpy, tpz

        bt, bid, bu, bv, tpx, tpy, tpz = jax.lax.fori_loop(
            0, T8 // 8, tri_chunk, (bt, bid, bu, bv, tpx, tpy, tpz))

    is_sphere = bid < cfg.s_pad
    return bt, bid, is_sphere, bu, bv, V3(tpx, tpy, tpz)


def _sample_lights_kernel(cfg: MegaConfig, state, light_ref, lcount, o2w_cols):
    """In-kernel sample_light_sources_v3 (ray_gen.glsl:252-281).

    Small L: alias-table row selected by an SMEM compare-select loop
    (11 * L8 selects).  cfg.light_gather: per-lane lane gathers from the
    VMEM [11 * l_blocks, 128] field-major table — same f32 bits, O(1) in
    L per 128-light block — which is what makes emissive tessellated
    spheres (simple-light: 962 light triangles) viable in-kernel."""
    state, u1 = rng.random_float(state)
    state, u2 = rng.random_float(state)

    n = lcount
    i = jnp.minimum((u1 * n).astype(jnp.int32),
                    jnp.maximum(n.astype(jnp.int32) - 1, 0))
    nz = u1 * 0.0
    if cfg.light_gather:
        B = cfg.l_blocks

        def g(f, blk, col):
            out = nz
            for b in range(B):
                r = f * B + b
                row = jnp.broadcast_to(light_ref[r:r + 1, :], (SUB, 128))
                v = jnp.take_along_axis(row, col, axis=1)
                out = v if B == 1 else jnp.where(blk == b, v, out)
            return out

        blk = i // 128
        col = i - blk * 128
        prob = g(0, blk, col)
        alias = g(1, blk, col)
        tri_index = jnp.where(u2 >= prob, alias.astype(jnp.int32), i)
        tb = tri_index // 128
        tc = tri_index - tb * 128
        cols = [g(2 + c, tb, tc) for c in range(9)]
    else:
        prob = nz
        alias = nz
        for l in range(cfg.L8):
            sel = i == l
            prob = jnp.where(sel, light_ref[l, 0], prob)
            alias = jnp.where(sel, light_ref[l, 1], alias)
        tri_index = jnp.where(u2 >= prob, alias.astype(jnp.int32), i)

        cols = [nz] * 9
        for l in range(cfg.L8):
            sel = tri_index == l
            for c in range(9):
                cols[c] = jnp.where(sel, light_ref[l, 2 + c], cols[c])
    p0 = V3(cols[0], cols[1], cols[2])
    p1 = V3(cols[3], cols[4], cols[5])
    p2 = V3(cols[6], cols[7], cols[8])
    w0 = vec3.mat34_apply_point(o2w_cols, p0)
    w1 = vec3.mat34_apply_point(o2w_cols, p1)
    w2 = vec3.mat34_apply_point(o2w_cols, p2)
    state, position = rng.sample_triangle_uniform_v3(state, w0, w1, w2)
    nrm = vec3.normalize(vec3.cross(w1 - w0, w2 - w0))
    return state, nee.LightSampleV3(position=position, normal=nrm)


def _o2w_cols_kernel(cfg: MegaConfig, o2w_ref, inst, nzero):
    """Hit instance's objectToWorld via an SMEM select loop (quirk #2)."""
    cols = [nzero] * 12
    for ii in range(cfg.n_inst):
        sel = inst == ii
        for c in range(12):
            cols[c] = jnp.where(sel, o2w_ref[ii, c], cols[c])
    return tuple(cols)


# Slot indices in the prim-row table (matches wavefront.prepare_batch
# prim_rows layout; 49..57 are the added triangle attribute rows).
_SLOT_W2O = 32       # 12 floats
_SLOT_C = 44         # sphere object-space center (3)
_SLOT_R = 47         # sphere radius
_SLOT_INST = 48
_SLOT_TRIN = 49      # tri n0, dn1, dn2 (9)
_SLOT_DC = 49        # anim_lerp: sphere center motion delta (3) — shares
                     # 49:52 with _SLOT_TRIN (anim_lerp excludes tris)
_SHADE_SLOTS = tuple(range(28))


def _fetch_layout(cfg: MegaConfig):
    """(shading, geometry, exact) slots fetched per hit.

    Small-int ids/modes are exact in one bf16 matmul pass; every COLOR /
    physics constant (albedo, fuzz, RI, emission, checker colours) and
    every GEOMETRY value (w2o, sphere center/radius, triangle normals)
    rides as a full-exact _split3 triple.  Round-3 audit: bf16 albedo
    tinted channel means by ~2.6e-3 relative (PRECISION.json triangle
    row), over the 1e-3 RMSE north star — and the direct-normal path
    freed 36 w2o rows, so exactness here still nets a smaller matmul
    (~60 -> ~38 rows on final-one-weekend).  Everything fits ONE
    default-precision one-hot matmul."""
    shade = {0, 11}
    exact = {1, 2, 3, 4, 5, 6, 7, 12}
    if cfg.flags.has_emissive:
        shade.add(15)
        exact.update({8, 9, 10, 16})
    if cfg.flags.has_checker:
        shade.update({24, 26})
        exact.update({17, 18, 19, 20, 21, 22, 23, 25, 27})
    if cfg.has_lights:
        shade.add(_SLOT_INST)
    geo = set()
    if cfg.n_spheres:
        if not cfg.direct_normals:
            geo.update(range(_SLOT_W2O, _SLOT_W2O + 12))
        geo.update(range(_SLOT_C, _SLOT_C + 3))
        geo.add(_SLOT_R)
        if cfg.anim_lerp:
            geo.update(range(_SLOT_DC, _SLOT_DC + 3))
    if cfg.n_tris:
        geo.update(range(_SLOT_TRIN, _SLOT_TRIN + 9))
    return (tuple(sorted(shade)), tuple(sorted(geo)),
            tuple(sorted(exact)))


def _rowsT_m8(cfg: MegaConfig) -> int:
    shade, geo, exact = _fetch_layout(cfg)
    m = len(shade) + 3 * len(geo) + 3 * len(exact)
    return -(-m // 8) * 8


def _mega_kernel(cam_ref, prm_ref, sph_ref, sphT_ref, sieveT_ref, w_ref,
                 bnd_ref, clu_ref, tri_ref, tsieveT_ref, tw_ref, triG_ref,
                 rowsT_ref, o2w_ref, light_ref, times_ref,
                 pix_ref, rx_ref, ry_ref, rz_ref, tr_ref, it_ref,
                 ti_ref=None, *, cfg: MegaConfig, interpret_trig=False):
    """Persistent-lane path tracer: one lane owns q_pix PIXELS and traces
    each pixel's spp_local*n_batches samples sequentially (pixel after
    pixel), regenerating a fresh camera ray the moment a sample
    terminates (miss / absorb / depth exhausted).

    This is the divergence fix: a naive one-ray-per-lane cell iterates
    until its LAST ray dies (measured 6.3x waste at depth 50).  Sample
    regeneration bounds the idle tail to the final sample per lane, and
    the snake-stratified multi-pixel assignment (renderer._snake_perm)
    equalizes lane TOTALS, so the cell's slowest-lane tail nearly
    vanishes even when per-sample costs are stochastic.

    Per-pixel radiance lands in the q_pix output row-blocks in pix_ref
    order (the caller scatters them back to image order).  A pixel's
    samples are always processed by ONE lane in sample order and summed
    into its output slot in that order, so results are bit-identical to
    the single-pixel-per-lane kernel.
    """
    from . import shading

    tags = set(cfg.ablate.split(","))
    Q = cfg.q_pix
    K = cfg.spp_local * cfg.n_batches
    sample_base = prm_ref[0, 7].astype(jnp.int32)
    row0 = prm_ref[0, 1].astype(jnp.int32)
    batch0 = prm_ref[0, 0].astype(jnp.int32)
    cam = _CamRef(cam_ref, prm_ref[0, 5], prm_ref[0, 6])

    # Per-stratum pixel assignments ([Q][8,128]; entries >= n_pix dead).
    pix_q = [pix_ref[s * SUB:(s + 1) * SUB, :] for s in range(Q)]

    def pix_of(qi):
        p = pix_q[0]
        for s in range(1, Q):
            p = jnp.where(qi == s, pix_q[s], p)
        return p

    # --- pair sample-stealing (cfg.use_steal) ---------------------------
    # Lanes (g, l) and (g, l+64) share the pair's 2*Q*K sample items with
    # a two-pointer split (see MegaConfig.use_steal).  Item j's identity:
    #   s2 = j // K     slot index: s2 < Q -> LEFT lane's stratum s2,
    #                   s2 >= Q -> RIGHT lane's stratum s2 - Q
    #   sip = j % K for the left half, K-1 - j % K for the right half —
    #   so each owner, walking its natural direction (left ascending /
    #   right descending), still sees its own pixels in ascending-sample
    #   order, keeping unstolen pixels' flush order (and thus rounding)
    #   identical to the non-stealing kernel.
    # Dead (padding) slots cost one claim iteration per pixel (the jump
    # target skips the rest of the K-item block).
    STEAL = cfg.use_steal
    if STEAL:
        assert not cfg.item_mode
        KIT = 2 * Q * K                           # items per lane pair
        lane_col = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
        is_b = lane_col >= 64                     # right half of each pair
        rl64 = lambda x: pltpu.roll(x, 64, 1)
        pix_p = [rl64(t) for t in pix_q]          # partner's stratum tables

        def steal_meta(cur):
            """(s2, stratum, owned-by-this-lane, sip) of item `cur`."""
            s2 = cur // K
            jm = cur - s2 * K
            right = s2 >= Q
            stratum = jnp.where(right, s2 - Q, s2)
            own = right == is_b
            sip = jnp.where(right, K - 1 - jm, jm)
            return s2, stratum, own, sip

        def steal_pix(stratum, own):
            p = jnp.where(own, pix_q[0], pix_p[0])
            for s in range(1, Q):
                p = jnp.where(stratum == s,
                              jnp.where(own, pix_q[s], pix_p[s]), p)
            return p

        def steal_decode(cur):
            s2, stratum, own, sip = steal_meta(cur)
            return stratum, own, sip, steal_pix(stratum, own)

    def raygen(pix, sip):
        """Seed + camera ray for sample `sip` of the lane's pixel `pix`
        (identical math and RNG stream to engine.wavefront.render_tile).
        Item mode: `pix` indexes (pixel, sample) items and carries the
        sample id itself; `sip` stays 0."""
        if cfg.item_mode:
            s_all = pix % K
            pixel = pix // K
        else:
            s_all = sip
            pixel = pix
        px = pixel % cfg.width
        py = row0 + pixel // cfg.width
        batch = batch0 + s_all // cfg.spp_local
        s = s_all % cfg.spp_local + sample_base
        st = rng.init_rng(batch.astype(jnp.uint32), s.astype(jnp.uint32),
                          py.astype(jnp.uint32), px.astype(jnp.uint32),
                          cfg.width, cfg.height, cfg.spp)
        si = s % cfg.sqrt_spp
        sj = s // cfg.sqrt_spp
        return cam_ops.get_rays_v3(
            st, cam, px, py, si, sj, cfg.width, cfg.height, cfg.sqrt_spp,
            use_dof=cfg.use_dof,
        )

    qi0 = jnp.zeros_like(pix_q[0])
    if STEAL:
        # left lanes start at item 0 (own stratum 0, sample 0); right
        # lanes at item KIT-1 (own stratum Q-1, sample 0 — the right
        # half's sip map reverses j % K).
        cur0 = jnp.where(is_b, jnp.int32(KIT - 1), jnp.int32(0))
        live0 = jnp.ones_like(cur0)   # int32 0/1: Mosaic can't carry i1
        _, _, sip0, pix0 = steal_decode(cur0)
        state, ray_o, ray_d = raygen(pix0, sip0)
    else:
        pix0 = pix_of(qi0)
        state, ray_o, ray_d = raygen(pix0, qi0)
    nzero = ray_d.x * 0.0
    bg = V3(nzero + prm_ref[0, 2], nzero + prm_ref[0, 3], nzero + prm_ref[0, 4])
    lcount = prm_ref[0, 8]
    larea = prm_ref[0, 9]
    layout = _fetch_layout(cfg)
    depth0 = (nzero + cfg.max_depth).astype(jnp.int32)

    # Per-pixel accumulators live in the output refs (zeroed here); the
    # kernel flushes a sample's radiance into its pixel's row-block the
    # moment the sample completes.
    zq = jnp.zeros((Q * SUB, 128), jnp.float32)
    rx_ref[:] = zq
    ry_ref[:] = zq
    rz_ref[:] = zq
    tr_ref[:] = zq
    if ti_ref is not None:
        ti_ref[:] = zq

    def body(carry):
        if ti_ref is not None:
            (state, ray_o, ray_d, thr, acc, qi, sip, depth, scnt,
             iters, pix, ti) = carry
        else:
            (state, ray_o, ray_d, thr, acc, qi, sip, depth, scnt,
             iters, pix) = carry
            ti = None
        dead = pix >= cfg.n_pix
        if STEAL:
            # reinterpreted carry slots: qi = current item, sip = live
            cur, live = qi, sip > 0
            s2cur, stratum, own, _sipd = steal_meta(cur)
            avail = live
        else:
            avail = qi < Q
        active = avail & ~dead
        scnt = scnt + active.astype(jnp.float32)
        iters = iters + 1.0

        if cfg.anim_lerp:
            # The lane's current sample time: batch shutter times ride a
            # VMEM [8,128] row (lane b = batch b's time), gathered by
            # the sample's absolute batch index.  Recomputed per
            # iteration (a div + one lane gather) — no extra carry.
            bat = batch0 + sip // cfg.spp_local
            trow = jnp.broadcast_to(times_ref[0:1, :], (SUB, 128))
            tcur = jnp.take_along_axis(trow, jnp.clip(bat, 0, 127), axis=1)
        else:
            tcur = None

        bt, prim, is_sphere, bu, bv, tp = _sweep(
            cfg, sph_ref, sphT_ref, sieveT_ref, w_ref, bnd_ref, clu_ref,
            tri_ref, tsieveT_ref, tw_ref, triG_ref, ray_o, ray_d,
            active, nzero, tcur=tcur)
        # Controlled profiling ("dup*" tags): run a stage a SECOND time on
        # slightly perturbed input (defeats CSE) and fold its output into
        # `iters` at ~1e-30 (defeats DCE, invisible in diagnostics).
        # Unlike the "no*" stubs, control flow / iteration counts stay
        # IDENTICAL to base, so t(dup) - t(base) is that stage's cost.
        if "dupsweep" in tags:
            o2 = V3(ray_o.x + 1e-12, ray_o.y, ray_o.z)
            bt2, _, _, _, _, _ = _sweep(
                cfg, sph_ref, sphT_ref, sieveT_ref, w_ref, bnd_ref, clu_ref,
                tri_ref, tsieveT_ref, tw_ref, triG_ref, o2, ray_d,
                active, nzero, tcur=tcur)
            iters = iters + bt2 * 1e-30
        missed = bt >= T_MAX
        acc = vec3.where(active & missed, acc + thr * bg, acc)
        hit = active & ~missed

        slots = _fetch_rows(rowsT_ref, jnp.maximum(prim, 0),
                            cfg.P, layout)
        if "duprows" in tags:
            slots2 = _fetch_rows(rowsT_ref, jnp.maximum(prim, 0) + 1,
                                 cfg.P, layout)
            iters = iters + next(iter(slots2.values())) * 1e-30
        if "norows" in tags:   # perf triage: stub the one-hot row fetch
            slots = {j: nzero + 0.25 for j in slots}
        rows = _RowsT(slots)

        # --- hit reconstruction (wavefront.reconstruct_hit, fat path)
        sp = ray_o + bt * ray_d
        if cfg.n_spheres and cfg.n_tris:
            hp = vec3.where(is_sphere, sp, tp)
        elif cfg.n_spheres:
            hp = sp
        else:
            hp = tp
        if cfg.n_spheres:
            c = V3(slots[_SLOT_C], slots[_SLOT_C + 1], slots[_SLOT_C + 2])
            if cfg.anim_lerp:
                # fat rows carry endpoint-0 centers; lerp to the
                # sample's time with the _SLOT_DC motion delta (same
                # expression as the sweep, so normals match the hit)
                c = V3(c.x + tcur * slots[_SLOT_DC],
                       c.y + tcur * slots[_SLOT_DC + 1],
                       c.z + tcur * slots[_SLOT_DC + 2])
            r = slots[_SLOT_R]
            inv_r = 1.0 / jnp.where(r == 0.0, 1.0, r)
            if cfg.direct_normals:
                # world-mode uniform spheres: slots carry WORLD c/r
                # (prepare_batch), so the normal is direct — no w2o
                # fetch, no object-space round trip.
                sn = V3((sp.x - c.x) * inv_r, (sp.y - c.y) * inv_r,
                        (sp.z - c.z) * inv_r)
            else:
                m_cols = tuple(slots[_SLOT_W2O + i] for i in range(12))
                p_obj = vec3.mat34_apply_point(m_cols, sp)
                n_obj = V3((p_obj.x - c.x) * inv_r, (p_obj.y - c.y) * inv_r,
                           (p_obj.z - c.z) * inv_r)
                sn = vec3.mat34_apply_transposed_vec(m_cols, n_obj)
            if ti_ref is not None:
                # Deferred image textures: record the PRIMARY hit's texel
                # index (UV math ≡ wavefront.reconstruct_hit + nearest/
                # repeat quantization ≡ ops/textures.sample_image_nearest;
                # the deferred gate admits only single-image-sphere
                # scenes, so every hit is the image texture).  The XLA
                # post-pass turns it into one flat atlas gather — no
                # re-trace (render_tile_mega._texel_factor).
                nn_uv = vec3.normalize(n_obj)
                cy = jnp.clip(-nn_uv.y, -1.0, 1.0)
                if interpret_trig:
                    # interpret mode: XLA's own transcendentals keep the
                    # CPU parity tests bitwise vs the wavefront.
                    sv = jnp.arccos(cy) * (1.0 / np.pi)
                    su = (jnp.arctan2(nn_uv.z, -nn_uv.x)
                          * (0.5 / np.pi)) % 1.0
                else:
                    sv = _acos_k(cy) * np.float32(1.0 / np.pi)
                    su = (_atan2_k(nn_uv.z, -nn_uv.x)
                          * np.float32(0.5 / np.pi)) % 1.0
                tw = prm_ref[0, 10]
                th = prm_ref[0, 11]
                aw = prm_ref[0, 12]
                txi = jnp.clip(jnp.floor((su % 1.0) * tw), 0.0, tw - 1.0)
                tyi = jnp.clip(jnp.floor((sv % 1.0) * th), 0.0, th - 1.0)
                primary_hit = hit & (depth == cfg.max_depth)
                ti = jnp.where(primary_hit, tyi * aw + txi, ti)
        if cfg.n_tris:
            tn = V3(
                slots[_SLOT_TRIN + 0] + bu * slots[_SLOT_TRIN + 3]
                + bv * slots[_SLOT_TRIN + 6],
                slots[_SLOT_TRIN + 1] + bu * slots[_SLOT_TRIN + 4]
                + bv * slots[_SLOT_TRIN + 7],
                slots[_SLOT_TRIN + 2] + bu * slots[_SLOT_TRIN + 5]
                + bv * slots[_SLOT_TRIN + 8],
            )
        if cfg.n_spheres and cfg.n_tris:
            n = vec3.where(is_sphere, sn, tn)
        elif cfg.n_spheres:
            n = sn
        else:
            n = tn
        n = vec3.normalize(n)
        front = vec3.dot(ray_d, n) < 0.0
        normal = vec3.where(front, n, -n)

        # u/v only feed image textures (excluded from the megakernel).
        if "noshade" in tags:  # perf triage: stub material scatter
            one3s = V3(nzero + 1.0, nzero + 1.0, nzero + 1.0)
            srec = shading.ScatterV3(
                is_scattered=hit, attenuation=one3s,
                mat_pdf_type=(nzero + 1.0).astype(jnp.int32) * 0,
                skip_pdf=hit, skip_dir=vec3.where(hit, normal, ray_d))
            emit = V3(nzero, nzero, nzero)
            state2 = state
        else:
            state2, srec, emit = shading.scatter_and_emit_v3(
                state, None, cfg.flags, rows, hp, normal, front,
                nzero, nzero, ray_d,
            )
        if "dupshade" in tags:
            n2 = V3(normal.x + 1e-12, normal.y, normal.z)
            _, srec2, emit2 = shading.scatter_and_emit_v3(
                state, None, cfg.flags, rows, hp, n2, front,
                nzero, nzero, ray_d,
            )
            iters = iters + (emit2.x + srec2.attenuation.x) * 1e-30
        acc = vec3.where(hit, acc + thr * emit, acc)
        scattered = hit & srec.is_scattered

        if "nonee" in tags:    # perf triage: stub pdf mixing / direction gen
            mis_thr = thr * srec.attenuation
            mis_dir = srec.skip_dir
        elif cfg.has_lights:
            inst = slots[_SLOT_INST].astype(jnp.int32)
            o2w_cols = _o2w_cols_kernel(cfg, o2w_ref, inst, nzero)
            state2, light = _sample_lights_kernel(
                cfg, state2, light_ref, lcount, o2w_cols)
            state2, chosen = nee.choose_mixture_pdf(
                state2, srec.mat_pdf_type, True)
            state2, sdir = nee.gen_scatter_direction_v3(
                state2, chosen, hp, normal, light)
            scatter_pdf = nee.pdf_value_v3(
                srec.mat_pdf_type, sdir, normal, light, larea)
            light_pdf = nee.pdf_value_v3(
                jnp.full_like(chosen, LIGHT_PDF), sdir, normal, light,
                larea)
            pdf_value = 0.5 * light_pdf + 0.5 * scatter_pdf
            ratio = jnp.where(
                pdf_value > 0.0,
                scatter_pdf / jnp.where(pdf_value == 0.0, 1.0, pdf_value),
                0.0,
            )
            mis_thr = thr * srec.attenuation * ratio
            mis_dir = vec3.normalize(sdir)
        else:
            state2, chosen = nee.choose_mixture_pdf(
                state2, srec.mat_pdf_type, False)
            dummy = nee.LightSampleV3(position=V3(nzero, nzero, nzero),
                                      normal=V3(nzero, nzero, nzero))
            state2, sdir = nee.gen_scatter_direction_v3(
                state2, chosen, hp, normal, dummy)
            scatter_pdf = nee.pdf_value_v3(
                srec.mat_pdf_type, sdir, normal, dummy, nzero + 1.0)
            ratio = jnp.where(scatter_pdf > 0.0, 1.0, 0.0)
            mis_thr = thr * srec.attenuation * ratio
            mis_dir = vec3.normalize(sdir)

        if "dupnee" in tags:
            dummy2 = nee.LightSampleV3(
                position=V3(nzero + 1e-12, nzero, nzero),
                normal=V3(nzero, nzero + 1.0, nzero))
            _, chosen2 = nee.choose_mixture_pdf(
                state2, srec.mat_pdf_type, cfg.has_lights)
            _, sdir2 = nee.gen_scatter_direction_v3(
                state2, chosen2, hp, normal, dummy2)
            sp2 = nee.pdf_value_v3(
                srec.mat_pdf_type, sdir2, normal, dummy2, nzero + 1.0)
            iters = iters + (sdir2.x + sp2) * 1e-30

        new_thr = vec3.where(srec.skip_pdf, thr * srec.attenuation, mis_thr)
        new_dir = vec3.where(srec.skip_pdf, srec.skip_dir, mis_dir)

        # --- sample bookkeeping + regeneration
        depth2 = jnp.where(active, depth - 1, depth)
        sample_over = active & (missed | (hit & ~srec.is_scattered)
                                | (scattered & (depth2 <= 0)))
        cont = scattered & (depth2 > 0)
        # A dead (padding) pixel is skipped whole in one iteration.
        jump = avail & dead

        # Flush the completed sample's radiance + bounce count into its
        # pixel's output row-block (adds happen in sample order per
        # pixel, preserving bitwise parity with per-lane accumulation).
        def _flush():
            if STEAL:
                # A stolen sample's radiance belongs to the PARTNER's
                # output slot: roll the masked contribution by 64 lanes
                # (an involution — the partner's column) and add it under
                # the rolled stratum mask.  Own and stolen contributions
                # can land on the same slot in one iteration (both lanes
                # inside the same pixel's item range) — the two masked
                # terms simply sum.
                ownm = sample_over & own
                stlm = sample_over & ~own
                racx = rl64(jnp.where(stlm, acc.x, 0.0))
                racy = rl64(jnp.where(stlm, acc.y, 0.0))
                racz = rl64(jnp.where(stlm, acc.z, 0.0))
                rsc = rl64(jnp.where(stlm, scnt, 0.0))
                rst = rl64(jnp.where(stlm, stratum, -1))
                for s in range(Q):
                    mo = ownm & (stratum == s)
                    ms = rst == s
                    sl = slice(s * SUB, (s + 1) * SUB)
                    rx_ref[sl, :] += (jnp.where(mo, acc.x, 0.0)
                                      + jnp.where(ms, racx, 0.0))
                    ry_ref[sl, :] += (jnp.where(mo, acc.y, 0.0)
                                      + jnp.where(ms, racy, 0.0))
                    rz_ref[sl, :] += (jnp.where(mo, acc.z, 0.0)
                                      + jnp.where(ms, racz, 0.0))
                    tr_ref[sl, :] += (jnp.where(mo, scnt, 0.0)
                                      + jnp.where(ms, rsc, 0.0))
                return
            for s in range(Q):
                m = sample_over & (qi == s)
                mf = m.astype(jnp.float32)
                sl = slice(s * SUB, (s + 1) * SUB)
                rx_ref[sl, :] += jnp.where(m, acc.x, 0.0)
                ry_ref[sl, :] += jnp.where(m, acc.y, 0.0)
                rz_ref[sl, :] += jnp.where(m, acc.z, 0.0)
                tr_ref[sl, :] += mf * scnt
                if ti_ref is not None:
                    # item mode: each slot flushes exactly once, so the
                    # += lands the sample's texel index (or -1) verbatim
                    ti_ref[sl, :] += jnp.where(m, ti, 0.0)

        # Unconditional masked adds: Q*4 vector ops every iteration beat
        # gating on a cross-lane any() reduction (a vector->scalar sync;
        # measured ~0.1us/iter on v5e).
        _flush()

        live2 = None
        if STEAL:
            # Two-pointer claim: `tgt` is this lane's next item — one
            # step in its direction, or (when the current pixel is a
            # dead padding slot) the far end of the pixel's K-item
            # block.  Claims coordinate through three 64-lane rolls
            # (partner's cur/target/attempt, all computed THIS iteration
            # — lanes run in lockstep, so nothing is stale):
            #  - left lane claims iff tgt is strictly below the
            #    partner's current item and the partner isn't claiming
            #    strictly below tgt (ties go LEFT);
            #  - right lane mirrors, yielding on exact ties.
            # A failed claim retires the lane (the boundary only ever
            # tightens); overlapping claims can only land on dead items
            # (no flush), never on live ones.
            mv = sample_over | jump
            nxt = jnp.where(is_b, cur - 1, cur + 1)
            jt = jnp.where(is_b, s2cur * K - 1, (s2cur + 1) * K)
            tgt = jnp.where(jump, jt, nxt)
            pcur = rl64(cur)
            ptgt = rl64(tgt)
            # Mosaic can't rotate i1 vectors; roll the mask as int32.
            pmv = rl64(mv.astype(jnp.int32)) > 0
            pf0 = pmv & (ptgt < cur)      # partner (left role) attempts
            pb0 = pmv & (ptgt > cur)      # partner (right role) attempts
            claim_b = (tgt > pcur) & ~(pf0 & (ptgt == tgt))
            claim_f = (tgt < pcur) & ~(pb0 & (ptgt < tgt))
            claim = mv & ((is_b & claim_b) | (~is_b & claim_f))
            live2 = (live & (claim | ~mv)).astype(jnp.int32)
            qi2 = jnp.where(claim, tgt, cur)
            _, _, sip2, pix2 = steal_decode(qi2)
            regen = claim
        elif cfg.item_mode:
            crossed = sample_over          # one sample per item slot
        else:
            crossed = sample_over & (sip + 1 >= K)
        if not STEAL:
            qi2 = jnp.where(crossed | jump, qi + 1, qi)
            sip2 = jnp.where(crossed | jump, 0,
                             jnp.where(sample_over, sip + 1, sip))
            pix2 = jnp.where(crossed | jump, pix_of(qi2), pix)
            regen = (sample_over | jump) & (qi2 < Q)
        scnt = jnp.where(sample_over, nzero, scnt)

        ray_o = vec3.where(cont, hp, ray_o)
        ray_d = vec3.where(cont, new_dir, ray_d)
        thr = vec3.where(cont, new_thr, thr)
        state = jnp.where(active, state2, state)

        if "dupregen" in tags:
            _, rg_o2, rg_d2 = raygen(pix2 + 1, sip2)
            iters = iters + (rg_o2.x + rg_d2.x) * 1e-30
        if "dupflush" in tags:
            for s in range(Q):
                m = sample_over & (qi == s)
                sl = slice(s * SUB, (s + 1) * SUB)
                rx_ref[sl, :] += jnp.where(m, acc.x * 1e-30, 0.0)
                ry_ref[sl, :] += jnp.where(m, acc.y * 1e-30, 0.0)
                rz_ref[sl, :] += jnp.where(m, acc.z * 1e-30, 0.0)
                tr_ref[sl, :] += m.astype(jnp.float32) * scnt * 1e-30
        if "noregen" in tags:  # perf triage: stub camera-ray regeneration
            rg_state, rg_o, rg_d = state, ray_o, ray_d
        else:
            rg_state, rg_o, rg_d = raygen(pix2, sip2)
        state = jnp.where(regen, rg_state, state)
        ray_o = vec3.where(regen, rg_o, ray_o)
        ray_d = vec3.where(regen, rg_d, ray_d)
        one = nzero + 1.0
        thr = vec3.where(regen, V3(one, one, one), thr)
        acc = vec3.where(sample_over | jump, V3(nzero, nzero, nzero), acc)
        depth3 = jnp.where(regen, depth0, depth2)

        slot6 = live2 if STEAL else sip2
        if ti_ref is not None:
            ti = jnp.where(sample_over | jump, nzero - 1.0, ti)
            return (state, ray_o, ray_d, thr, acc, qi2, slot6, depth3,
                    scnt, iters, pix2, ti)
        return (state, ray_o, ray_d, thr, acc, qi2, slot6, depth3, scnt,
                iters, pix2)

    def cond(carry):
        if STEAL:
            return jnp.sum(carry[6]) > 0
        return jnp.sum((carry[5] < Q).astype(jnp.int32)) > 0

    one3 = V3(nzero + 1.0, nzero + 1.0, nzero + 1.0)
    zero3 = V3(nzero, nzero, nzero)
    if STEAL:
        init = (state, ray_o, ray_d, one3, zero3, cur0, live0, depth0,
                nzero, nzero, pix0)
    else:
        init = (state, ray_o, ray_d, one3, zero3, qi0, qi0, depth0, nzero,
                nzero, pix0)
    if ti_ref is not None:
        init = init + (nzero - 1.0,)
    # Amortize the cross-lane while-cond (a vector->scalar sync,
    # ~0.1us/iter measured) over 8 body iterations.  The inner fori
    # bound is a TRACED scalar so Mosaic keeps one body copy (a static
    # bound-8 fori was unrolled 8x and ran 5x slower); once all lanes
    # are done the <=7 overshoot iterations are no-ops.
    eight = jnp.max((nzero + 8.0).astype(jnp.int32))
    def chunk(carry):
        return jax.lax.fori_loop(0, eight, lambda i, c: body(c), carry)
    out = jax.lax.while_loop(cond, chunk, init)
    it_ref[:] = out[9]


def cluster_aabbs(grid, C: int, G: int):
    """[C*G, 8] sphere rows -> [C, 8] cluster AABBs (mn xyz | mx xyz).

    Conservative: boxes are inflated by a magnitude-scaled epsilon so f32
    rounding in the slab test can never skip a sphere the per-sphere f32
    test would hit.  Empty clusters get an inverted box (mn=BIGF,
    mx=-BIGF) as a SENTINEL ONLY: the use_box slab test takes per-axis
    min/max of the two plane distances, which neutralizes inversion, so
    inverted boxes PASS the pretest for every ray.  Correctness relies on
    the w_ref packing matmul zeroing columns >= C (real cluster count) —
    that column masking is load-bearing, not belt-and-braces."""
    g = grid.reshape(C, G, 8)
    c = g[..., 0:3]
    r = jnp.abs(g[..., 3:4])
    valid = (g[..., 4:5] < 1e37)
    mn = jnp.min(jnp.where(valid, c - r, BIGF), axis=1)
    mx = jnp.max(jnp.where(valid, c + r, -BIGF), axis=1)
    pad = 1e-5 + 1e-5 * jnp.maximum(jnp.abs(mn), jnp.abs(mx))
    anyv = valid[:, :, 0].any(axis=1, keepdims=True)
    mn = jnp.where(anyv, mn - pad, BIGF)
    mx = jnp.where(anyv, mx + pad, -BIGF)
    out = jnp.zeros((C, 8), jnp.float32)
    return out.at[:, 0:3].set(mn).at[:, 3:6].set(mx)


def build_cluster_tables(cfg: MegaConfig, sph_table8):
    """Selective-sweep tables from the per-batch sphere table.

    Returns (bounds [C,8] AABBs for the G-clusters past n_prefix,
    cluT [3*G*4, Cp] split-exact transposed fetch table)."""
    C, Cp, G = cfg.n_clusters, cfg.n_clusters_pad, cfg.clu_g
    S8 = sph_table8.shape[0]
    take = min(C * G, S8 - cfg.n_prefix)
    grid = sph_table8[cfg.n_prefix:cfg.n_prefix + take]
    pad = C * G - grid.shape[0]
    if pad > 0:
        fill = jnp.zeros((pad, 8), jnp.float32).at[:, 4].set(BIGF)
        grid = jnp.concatenate([grid, fill], axis=0)
    bounds = cluster_aabbs(grid, C, G)                       # [C,8]

    fields = grid[:, (0, 1, 2, 4)].reshape(C, G * 4).T       # [V, C]
    hi, mid, lo = _split3(fields)
    cluT = jnp.concatenate([hi, mid, lo], axis=0)            # [3V, C]
    if Cp > C:
        cluT = jnp.pad(cluT, ((0, 0), (0, Cp - C)))
    return bounds, cluT


def build_mega_tables(cfg, static, scene, geom):
    """Per-batch device tables for the megakernel (cheap jnp ops, called
    inside prepare; everything is already on device).

    Returns (rowsT [M,P] compacted to _rows_needed, sph [S8,8],
    bounds [C,8], cluT, tri [T8,16], o2w [I,12], light [L8,16])."""
    prim_rows = geom.prim_rows                       # [P, 64]
    if cfg.item_mode:
        # Deferred image textures: MODE_IMAGE albedo slots shade as the
        # constant 1.0 in-kernel; the per-sample texel factor lands in
        # the XLA post-pass (render_tile_mega).
        from ..models.shading_table import MODE_IMAGE as _MODE_IMAGE

        img = prim_rows[:, 11:12] == _MODE_IMAGE
        prim_rows = prim_rows.at[:, 2:5].set(
            jnp.where(img, 1.0, prim_rows[:, 2:5]))
    P = prim_rows.shape[0]
    if static.has_tris:
        att = geom.tri_attr16                         # [T8,16]: n0 dn1 dn2 uv...
        s_pad = scene.sph_center.shape[0]
        T = min(att.shape[0], P - s_pad)
        prim_rows = prim_rows.at[s_pad:s_pad + T, _SLOT_TRIN:_SLOT_TRIN + 9].set(
            att[:T, 0:9])
    shade, geo, exact = _fetch_layout(cfg)
    shadeT = prim_rows[:, list(shade)].T
    geoT = prim_rows[:, list(geo)].T
    hi, mid, lo = _split3(geoT)
    exT = prim_rows[:, list(exact)].T
    ehi, emid, elo = _split3(exT)
    rowsT = jnp.concatenate([shadeT, hi, mid, lo, ehi, emid, elo], axis=0)
    M = rowsT.shape[0]
    M8 = -(-M // 8) * 8
    if M8 > M:
        rowsT = jnp.pad(rowsT, ((0, M8 - M), (0, 0)))

    L = scene.light_prob.shape[0]
    if cfg.light_gather:
        # VMEM lane-gather layout: row f * B + b = field f (prob, alias,
        # 9 triangle coords) of lights [b*128, (b+1)*128); rows padded to
        # a multiple of 8.
        B = cfg.l_blocks
        flat = jnp.zeros((11, B * 128), jnp.float32)
        flat = flat.at[0, :L].set(scene.light_prob)
        flat = flat.at[1, :L].set(scene.light_alias.astype(jnp.float32))
        flat = flat.at[2:11, :L].set(scene.light_tri_packed[:, 0:9].T)
        light = flat.reshape(11 * B, 128)
        rpad = -(-light.shape[0] // 8) * 8 - light.shape[0]
        if rpad:
            light = jnp.pad(light, ((0, rpad), (0, 0)))
    else:
        L8 = max(8, -(-L // 8) * 8)
        light = jnp.zeros((L8, 16), jnp.float32)
        if L:
            light = light.at[:L, 0].set(scene.light_prob)
            light = light.at[:L, 1].set(
                scene.light_alias.astype(jnp.float32))
            light = light.at[:L, 2:11].set(scene.light_tri_packed[:, 0:9])

    if cfg.use_gather:
        # Lane-gather cluster table: row 4*s+f = field f (cx,cy,cz,k) of
        # the cluster's sphere s, clusters along the lane axis (C<=128).
        # Plain f32 — the gather fetch is bit-exact, no _split3 needed.
        # anim_lerp: 9 fields per sphere (c0 xyz, k0, dc xyz, k1, k2) —
        # the kernel lerps c(t) and k(t) at each sample's batch time.
        C, G = cfg.n_clusters, cfg.clu_g
        S8 = geom.sph_table8.shape[0]
        take = min(C * G, S8 - cfg.n_prefix)
        grid = geom.sph_table8[cfg.n_prefix:cfg.n_prefix + take]
        pad = C * G - grid.shape[0]
        if pad > 0:
            fill = jnp.zeros((pad, 8), jnp.float32).at[:, 4].set(BIGF)
            grid = jnp.concatenate([grid, fill], axis=0)
        if cfg.anim_lerp:
            dgrid = geom.sph_dtab8[cfg.n_prefix:cfg.n_prefix + take]
            if pad > 0:
                dgrid = jnp.concatenate(
                    [dgrid, jnp.zeros((pad, 8), jnp.float32)], axis=0)
            f9 = jnp.concatenate(
                [grid[:, (0, 1, 2, 4)], dgrid[:, (0, 1, 2, 4, 5)]],
                axis=1)                                       # [CG, 9]
            fields = f9.reshape(C, G * 9).T                   # [9G, C]
            rowsNg = -(-(9 * G) // 8) * 8
            cluT = jnp.zeros((rowsNg, 128), jnp.float32)
            # padding clusters keep k0=BIGF so their spheres never hit
            cluT = cluT.at[3:9 * G:9, :].set(BIGF)
            cluT = cluT.at[:9 * G, :C].set(fields)
        else:
            fields = grid[:, (0, 1, 2, 4)].reshape(C, G * 4).T  # [4G, C]
            rows4g = -(-(4 * G) // 8) * 8
            cluT = jnp.zeros((rows4g, 128), jnp.float32)
            # padding clusters keep k=BIGF so their spheres never hit
            cluT = cluT.at[3::4, :].set(BIGF)
            cluT = cluT.at[:4 * G, :C].set(fields)
        bounds = geom.sph_bounds8
    elif cfg.use_sel or cfg.use_sieve:
        bounds, cluT = build_cluster_tables(cfg, geom.sph_table8)
    else:
        bounds = geom.sph_bounds8
        cluT = jnp.zeros((8, 128), jnp.float32)

    def split72(g4):
        """[4, N] field rows -> [72, N] nine 8-row cross-product blocks
        (sphere-split level repeated 3x, zero-padded to 8-aligned rows,
        matching _ray_rhs' layout)."""
        hi, mid, lo = _split3(g4)
        z4 = jnp.zeros_like(g4)
        blocks = []
        for lvl in (hi, mid, lo):
            b8 = jnp.concatenate([lvl, z4], axis=0)
            blocks += [b8, b8, b8]
        return jnp.concatenate(blocks, axis=0)

    if cfg.use_mxu_sweep:
        # Split-exact per-sphere rows for the dense MXU sweep.
        sphT = split72(geom.sph_table8[:, (0, 1, 2, 4)].T)    # [72, S8]
    else:
        sphT = jnp.zeros((8, 128), jnp.float32)

    if cfg.use_sieve or cfg.use_gather:
        C, Cp, G = cfg.n_clusters, cfg.n_clusters_pad, cfg.clu_g
        S8 = geom.sph_table8.shape[0]
        take = min(C * G, S8 - cfg.n_prefix)
        grid = geom.sph_table8[cfg.n_prefix:cfg.n_prefix + take]
        pad = C * G - grid.shape[0]
        if pad > 0:
            fill = jnp.zeros((pad, 8), jnp.float32).at[:, 4].set(BIGF)
            grid = jnp.concatenate([grid, fill], axis=0)
        if cfg.use_box:
            # [Cp, 8] cluster AABB table for the slab pretest (rides the
            # sieveT input slot; see MegaConfig.use_box).  Rows >= C get
            # inverted boxes (te > tx for every ray).
            aabb = cluster_aabbs(grid, C, G)                  # [C, 8]
            if cfg.anim_lerp:
                # shutter-conservative union: linear motion means the
                # swept volume lies inside the union of the endpoint
                # boxes (c(t) on the [c0, c0+dc] segment; radii fixed).
                dg = geom.sph_dtab8[cfg.n_prefix:cfg.n_prefix + take]
                if pad > 0:
                    dg = jnp.concatenate(
                        [dg, jnp.zeros((pad, 8), jnp.float32)], axis=0)
                grid1 = grid.at[:, 0:3].add(dg[:, 0:3])
                aabb1 = cluster_aabbs(grid1, C, G)
                aabb = aabb.at[:, 0:3].set(
                    jnp.minimum(aabb[:, 0:3], aabb1[:, 0:3]))
                aabb = aabb.at[:, 3:6].set(
                    jnp.maximum(aabb[:, 3:6], aabb1[:, 3:6]))
            if Cp > C:
                fill = jnp.zeros((Cp - C, 8), jnp.float32)
                fill = fill.at[:, 0:3].set(BIGF).at[:, 3:6].set(-BIGF)
                aabb = jnp.concatenate([aabb, fill], axis=0)
            sieveT = aabb
        else:
            g = grid.reshape(C, G, 8)
            c = g[..., 0:3]
            r = jnp.abs(g[..., 3:4])
            valid = g[..., 4:5] < 1e37
            mn = jnp.min(jnp.where(valid, c - r, BIGF), axis=1)
            mx = jnp.max(jnp.where(valid, c + r, -BIGF), axis=1)
            anyv = valid[:, :, 0].any(axis=1)
            bc = jnp.where(anyv[:, None], 0.5 * (mn + mx), 0.0)  # [C, 3]
            dist = jnp.linalg.norm(c - bc[:, None, :], axis=-1)
            br = jnp.max(jnp.where(valid[:, :, 0], dist + r[:, :, 0], 0.0),
                         axis=1)
            br = br * 1.0001 + 1e-5                           # conservative
            kc = jnp.where(anyv, jnp.sum(bc * bc, axis=1) - br * br, BIGF)
            g4 = jnp.concatenate([bc.T, kc[None, :]], axis=0)  # [4, C]
            if Cp > C:
                g4 = jnp.pad(g4, ((0, 0), (0, Cp - C)),
                             constant_values=0.0)
                g4 = g4.at[3, C:].set(BIGF)
            sieveT = split72(g4)                              # [72, Cp]
        # Mask-reduction weights: rows (2w, 2w+1) hold the low/high
        # 16-bit powers of two for word w (values <= 2^15, exact in
        # bf16 and in f32 accumulation); rows padded to a multiple of 8.
        n_words = -(-C // 32)
        w_rows = -(-(2 * n_words) // 8) * 8
        w_np = np.zeros((w_rows, Cp), np.float32)
        for ci in range(C):
            word, bit = divmod(ci, 32)
            row = 2 * word + (1 if bit >= 16 else 0)
            w_np[row, ci] = float(1 << (bit % 16))
        w_tbl = jnp.asarray(w_np)
    else:
        sieveT = jnp.zeros((8, 128), jnp.float32)
        w_tbl = jnp.zeros((8, 128), jnp.float32)
    # SMEM diet: the scalar sphere table is only read for the dense
    # prefix under sieve/mxu modes (SMEM is 1MB and charges ~64B/scalar
    # — a full 2k-sphere table alone would blow it), and the o2w table
    # only feeds NEE.
    sph_smem = geom.sph_table8
    if cfg.use_sieve or cfg.use_gather or cfg.use_mxu_sweep:
        rows = max(8, -(-cfg.n_prefix // 8) * 8)
        sph_smem = sph_smem[:rows]
    if cfg.anim_lerp:
        # anim_lerp: append matching motion rows (dc xyz, -, k1, k2) —
        # sph_8 reads row si + R for sphere si's deltas (R = half the
        # table height).
        sph_smem = jnp.concatenate(
            [sph_smem, geom.sph_dtab8[:sph_smem.shape[0]]], axis=0)
    o2w = geom.inst_o2w_rows
    if not cfg.has_lights:
        o2w = jnp.zeros((8, 12), jnp.float32)

    tri_smem = geom.tri_table16
    if cfg.tri_gather:
        # Tri-gather tables: cluster AABBs for the slab pretest, the
        # [9G-rows, 128] lane-gather fetch table, and the mask-pack
        # weights.  The full tri table leaves SMEM (the dense sweep is
        # compiled out; SMEM charges ~64B/scalar).
        Ct, Gt = cfg.n_tclusters, cfg.tri_g
        take = min(Ct * Gt, tri_smem.shape[0])
        grid = tri_smem[:take, 0:10]
        pad = Ct * Gt - grid.shape[0]
        if pad > 0:
            grid = jnp.concatenate(
                [grid, jnp.zeros((pad, 10), jnp.float32)], axis=0)
        g = grid.reshape(Ct, Gt, 10)
        v0 = g[..., 0:3]
        p1 = v0 + g[..., 3:6]
        p2 = v0 + g[..., 6:9]
        valid = g[..., 9:10] > 0.0
        mn = jnp.min(jnp.where(valid, jnp.minimum(jnp.minimum(v0, p1), p2),
                               BIGF), axis=1)
        mx = jnp.max(jnp.where(valid, jnp.maximum(jnp.maximum(v0, p1), p2),
                               -BIGF), axis=1)
        ipad = 1e-5 + 1e-5 * jnp.maximum(jnp.abs(mn), jnp.abs(mx))
        anyv = valid[:, :, 0].any(axis=1, keepdims=True)
        mn = jnp.where(anyv, mn - ipad, BIGF)
        mx = jnp.where(anyv, mx + ipad, -BIGF)
        tsieveT = jnp.zeros((128, 8), jnp.float32)
        tsieveT = tsieveT.at[:, 0:3].set(BIGF).at[:, 3:6].set(-BIGF)
        tsieveT = tsieveT.at[:Ct, 0:3].set(mn).at[:Ct, 3:6].set(mx)

        fields = grid[:, 0:9].reshape(Ct, Gt * 9).T          # [9G, Ct]
        rows9g = -(-(9 * Gt) // 8) * 8
        triG = jnp.zeros((rows9g, 128), jnp.float32)
        triG = triG.at[:9 * Gt, :Ct].set(fields)

        tw_np = np.zeros((8, 128), np.float32)
        for ci in range(Ct):
            word, bit = divmod(ci, 32)
            tw_np[2 * word + (1 if bit >= 16 else 0), ci] = float(
                1 << (bit % 16))
        tw_tbl2 = jnp.asarray(tw_np)
        tri_smem = tri_smem[:8]
    else:
        tsieveT = jnp.zeros((8, 8), jnp.float32)
        triG = jnp.zeros((8, 128), jnp.float32)
        tw_tbl2 = jnp.zeros((8, 128), jnp.float32)

    return (rowsT, sph_smem, sphT, sieveT, w_tbl, bounds, cluT,
            tri_smem, tsieveT, tw_tbl2, triG, o2w, light)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_cells", "interpret"),
)
def mega_dispatch(cfg: MegaConfig, n_cells: int, cam_tbl, params, rowsT,
                  sph, sphT, sieveT, w_tbl, bnd, clu, tri, tsieveT, tw_tbl,
                  triG, o2w, light, times, pix_tbl, interpret=False):
    """One pallas_call over n_cells grid cells (n_cells*1024 rays).

    Returns (rad V3 of [n_cells*1024], traced [n_cells*1024])."""
    kernel = functools.partial(_mega_kernel, cfg=cfg,
                               interpret_trig=interpret)
    Q = cfg.q_pix
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    qspec = pl.BlockSpec((Q * SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    qshape = jax.ShapeDtypeStruct((n_cells * Q * SUB, 128), jnp.float32)
    # Item mode adds a 6th output: the per-item primary-hit texel index
    # (-1 = none) for the deferred-image post-pass.
    extra_out = [qspec] if cfg.item_mode else []
    extra_shape = [qshape] if cfg.item_mode else []
    outs = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[
            smem(),                                           # cam [8,4]
            smem(),                                           # params [1,16]
            smem(),                                           # spheres [S8,8]
            pl.BlockSpec(sphT.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # MXU sphere tbl
            pl.BlockSpec(sieveT.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # sieve clusters
            pl.BlockSpec(w_tbl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # mask weights
            smem(),                                           # cluster bounds
            pl.BlockSpec(clu.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # cluster fetch
            smem(),                                           # tris [T8,16]
            pl.BlockSpec(tsieveT.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # tri clusters
            pl.BlockSpec(tw_tbl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # tri mask wts
            pl.BlockSpec(triG.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # tri fetch
            pl.BlockSpec((_rowsT_m8(cfg), cfg.P), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # rowsT (compact)
            smem(),                                           # o2w [I,12]
            (pl.BlockSpec(light.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)            # light gather
             if cfg.light_gather else smem()),                # light [L8,16]
            pl.BlockSpec(times.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # batch times
            qspec,                                            # pix table
        ],
        out_specs=[qspec, qspec, qspec, qspec,
                   pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] + extra_out,
        out_shape=[qshape, qshape, qshape, qshape,
                   jax.ShapeDtypeStruct((n_cells * SUB, 128), jnp.float32)]
                  + extra_shape,
        interpret=interpret,
    )(cam_tbl, params, sph, sphT, sieveT, w_tbl, bnd, clu, tri, tsieveT,
      tw_tbl, triG, rowsT, o2w, light, times, pix_tbl)
    rx, ry, rz, tr, it = outs[:5]
    flatq = lambda x: x.reshape(n_cells * Q * CELL)
    ti = flatq(outs[5]) if cfg.item_mode else None
    return (V3(flatq(rx), flatq(ry), flatq(rz)), flatq(tr),
            it.reshape(n_cells * CELL), ti)


def make_config(static, scene, use_dof: bool, spp_local: int = 0) -> MegaConfig:
    """MegaConfig from scene facts + the public KernelOptions riding on
    `static.kernel_options` (options.py; env overrides already folded in
    by the Renderer)."""
    from ..options import KernelOptions

    opts = static.kernel_options
    if opts is None:
        opts = KernelOptions().with_env_overrides()
    spp = static.sqrt_spp ** 2
    L = scene.light_prob.shape[0]
    n_prefix = int(getattr(static, "sph_prefix", 0))
    sweep = opts.sweep
    # Fused animated scenes (SceneStatic.anim_fuse -> MegaConfig.
    # anim_lerp): in-kernel center/k lerp is implemented for the gather
    # rounds and the dense scalar sweep; the opt-in sel/sieve/mxu/pair
    # variants and sample stealing are forced off, and the AABB slab
    # pretest is forced on (its tables are the shutter-conservative
    # unions; the bounding-sphere pretest variant has no union form).
    anim = bool(getattr(static, "anim_fuse", False))
    # Selective sweep (opt-in): under the cost-sorted lane->pixel
    # assignment a cell's rays span the whole image, so cluster traversal
    # pays its AABB pretest + fetch rounds without pruning — measured 137
    # (dense) vs 119 (selective) Mray-bounces/s on final-one-weekend.
    # Wants spatially-coherent assignments (q=1 + tiled perm).
    use_sel = n_prefix > 0 and sweep == "selective" and not anim
    # Cluster sieve (opt-in): MXU bounding-sphere pretest + exact one-hot
    # candidate rounds.  Bit-exact vs the dense scalar sweep and
    # structurally sub-linear, but measured SLOWER than the dense MXU
    # sweep at every tested size (82 vs 151 Mrays/s at S=488, 32 vs 50
    # at S=1940): a cell pays the WORST lane's candidate count per
    # bounce (~3.5x the mean) and each round's one-hot fetch costs as
    # much as ~25 dense sphere rows.  Kept as the measured data point
    # for why TPU wavefronts prefer dense MXU sweeps over per-lane
    # BVH-style traversal at these scene sizes.
    use_sieve = n_prefix > 0 and sweep == "sieve" and not anim
    G = opts.cluster_g if opts.cluster_g is not None else 4
    n_local = int(static.num_spheres) - n_prefix
    # Gather-round sieve — the round-3 DEFAULT fast path: MXU cluster
    # pretest + per-lane candidate rounds that fetch each cluster's
    # spheres with lane gathers (bit-exact vs the dense scalar sweep).
    # Measured 3.89 us/cell-iter at G=4 + 16 unrolled rounds vs 5.63 for
    # the dense MXU sweep on final-one-weekend.  Needs the greedy
    # cluster layout and C <= 128 (gather table width); clu_g is bumped
    # for big scenes so C fits.
    use_gather = n_prefix > 0 and sweep in ("auto", "gather")
    if use_gather:
        # same doubling rule as the greedy grouping at compile time, so
        # clusters are built at the size the sweep actually uses
        from ..models.sphere_order import effective_cluster_g

        G = effective_cluster_g(n_local, G)
        if -(-n_local // G) > 128:
            use_gather = False
    C = -(-n_local // G) if (use_sel or use_sieve or use_gather) else 0
    # MXU sweep pays one matmul + ~21 [S,1024] passes regardless of S;
    # it beats the ~35-op/sphere scalar loop once S is large enough that
    # the loop dominates the iteration.
    use_mxu = (not use_sel and not use_sieve and not use_gather
               and not anim
               and (sweep == "mxu"
                    or (sweep in ("auto", "gather") and opts.allow_mxu
                        and int(static.num_spheres) >= 64)))
    unroll_default = 0 if getattr(static, "pallas_interpret", False) else 16
    rounds_unroll = (opts.rounds_unroll if opts.rounds_unroll is not None
                     else unroll_default)
    # Re-pretest culling + near-first bands: measured defaults pending
    # the round-3 sweep study (tools_dev/sweep_bench.py cull/band modes);
    # interpret mode keeps them off with the unroll (no straight-line
    # blocks to checkpoint between).
    cull_every = opts.cull_every if opts.cull_every is not None else 0
    use_bands = opts.bands if opts.bands is not None else False
    bal = opts.balance
    balance = ("idle" if bal is True else bal) if bal else ""
    # AABB slab pretest: measured default ON (round-4 on-chip ablation:
    # 3.14 vs 3.55 us/cell-iter on final-one-weekend at G=4, 5.46 vs
    # 6.37 at S=1940 combined with blockfori:4).
    use_box = True if anim else (opts.box if opts.box is not None else True)
    if anim and balance == "pair":
        balance = "idle"          # pair rounds have no lerp form
    if balance == "pair":
        # pair mode owns the candidate ordering: bands reshuffle masks
        # mid-sweep, which the rank-parity split predates.  Culling IS
        # supported (cull_pair ANDs fresh words into keep/adopt masks).
        use_bands = False
    # schedule="blockfori:k"/"blockwhile:k" rides the same tag channel
    # the round loops already parse; "auto" keeps the unroll+residual
    # structure driven by rounds_unroll.
    ablate = opts.ablate
    if opts.schedule != "auto":
        ablate = ",".join(t for t in (ablate, opts.schedule) if t)
    elif (use_gather and opts.rounds_unroll is None
          and not any(t.startswith(("blockfori", "blockwhile", "unroll",
                                    "fixrounds", "norounds"))
                      for t in ablate.split(","))):
        # Measured round-4 defaults (tools_dev/sweep_bench +
        # bench_stress, 2026-08-18), size-dependent:
        # - small scenes: blocked counted trip beats the unroll+residual
        #   structure (box-bf4 2.70 vs box 3.14 vs default 3.55
        #   us/cell-iter on final-one-weekend, 484 local spheres);
        # - stress scale: blockwhile + per-block re-pretest culling wins
        #   (BENCH_STRESS: 83.0 vs 48.3 Mrays/s at 1,940 spheres, 30.6
        #   vs 26.0 at 16,384) — exactly the regime the balance_sim
        #   predicted, where whole blocks of candidate rounds go dead.
        # An explicit rounds_unroll or a triage tag keeps the legacy
        # structure so ablations measure what they name.
        if n_local >= 1024:
            ablate = ",".join(t for t in (ablate, "blockwhile:4") if t)
            if opts.cull_every is None:
                cull_every = 1
        else:
            ablate = ",".join(t for t in (ablate, "blockfori:4") if t)
    if rounds_unroll == 0 and not any(
            t.startswith("blockwhile") for t in ablate.split(",")):
        # cull points exist only between unrolled rounds or at blockwhile
        # block ends; plain fori trips have neither.
        cull_every = 0
    flags = static.flags
    item_mode = bool(flags.has_image)
    # Pair sample-stealing (use_steal): measured default OFF — on v5e the
    # three-roll claim protocol costs more than the divergence tail it
    # recovers (flagship 292.1 -> 289.4 M ray-bounces/s, util 0.926 ->
    # 0.953; simple-light steady 383.4 -> 371.8 Mrays/s with steal on;
    # 2026-08-19).  Kept as an opt-in (KernelOptions(steal=True) /
    # MEGA_STEAL=1) because the win grows with per-pixel cost variance
    # and future scenes may cross over.  Never in item mode (each item
    # slot must flush exactly once) or selective mode.
    use_steal = False if opts.steal is None else bool(opts.steal)
    use_steal = (use_steal and not item_mode and not use_sel and not anim
                 and "nosteal" not in ablate.split(","))
    if item_mode:
        # Deferred image textures (deferred_image_supported): the kernel
        # shades MODE_IMAGE albedo slots as the constant 1.0
        # (build_mega_tables substitutes the rows) and the per-sample
        # texel factor is applied by an XLA post-pass in
        # render_tile_mega.  has_image=False compiles the in-kernel
        # atlas fetch out of ops/shading.
        flags = flags._replace(has_image=False)
    return MegaConfig(
        s_pad=int(scene.sph_center.shape[0]),
        n_spheres=int(static.num_spheres),
        n_tris=int(static.num_triangles),
        P=int(scene.shade_rows.shape[0]),
        n_inst=int(static.num_instances),
        L8=max(8, -(-L // 8) * 8),
        width=static.width,
        height=static.height,
        sqrt_spp=static.sqrt_spp,
        spp=spp,
        spp_local=spp_local or spp,
        max_depth=static.max_ray_depth,
        use_dof=bool(use_dof),
        has_lights=bool(static.has_lights),
        flags=flags,
        item_mode=item_mode,
        use_steal=use_steal,
        anim_lerp=anim,
        use_sel=use_sel,
        n_prefix=n_prefix,
        clu_g=G,
        n_clusters=C,
        n_clusters_pad=max(128, -(-C // 128) * 128),
        use_mxu_sweep=use_mxu,
        use_sieve=use_sieve,
        use_gather=use_gather,
        rounds_unroll=rounds_unroll if use_gather else 0,
        cull_every=cull_every if use_gather else 0,
        use_bands=use_bands and use_gather,
        use_balance=balance if use_gather else "",
        use_box=use_box and (use_gather or use_sieve),
        # Light-table lane gather once the select loop would dominate
        # (11 * L8 selects/bounce): small tables keep the measured
        # cornell path, big ones (tessellated sphere lights) gather.
        light_gather=bool(static.has_lights) and L > 16,
        l_blocks=-(-L // 128) if (static.has_lights and L > 16) else 0,
        direct_normals=bool(static.sphere_world_mode) and not item_mode,
        tri_gather=bool(static.tri_cluster_g > 0
                        and static.num_triangles > 0),
        tri_g=max(1, int(static.tri_cluster_g)),
        n_tclusters=(-(-int(static.num_triangles)
                       // max(1, int(static.tri_cluster_g)))
                     if static.tri_cluster_g > 0 else 0),
        ablate=ablate,
    )


def megakernel_supported(static, compiled=None) -> bool:
    """Static gate: scenes the fused kernel covers (the rest fall back to
    the XLA wavefront).  Excluded: image textures (atlas gathers),
    BVH/mesh mode, object-space spheres (non-uniform scale), huge SMEM
    tables, NEE over many instances.  Noise textures run in-kernel via
    the component-wise Perlin (ops/perlin.cnoise_v3)."""
    f = static.flags
    if f.has_image:
        return False
    if static.bvh_mode != "none" or not static.use_fat_shading:
        return False
    if static.has_spheres and not static.sphere_world_mode:
        return False
    tri_max = 16384 if static.tri_cluster_g > 0 else 2048
    # Sphere ceiling = the gather sweep's capacity: effective_cluster_g
    # doubles G until the cluster count fits the 128-wide lane-gather
    # table, so 128 clusters x G=128 = 16384 spheres is the most the
    # fast path can address (gate raised from 4096 in round 4; measured
    # on gen_stress tilings — see README scaling table).  Above 4096 the
    # full scalar sphere table would blow the 1MB SMEM budget; only
    # gather mode trims it (build_mega_tables "SMEM diet"), so the raise
    # applies only when the RESOLVED sweep is gather (ADVICE r4): an
    # explicit sweep="scalar"/"mxu"/"sieve"/"selective", a missing
    # cluster layout, or a cluster count past the 128-wide gather table
    # keep the 4096 clamp.
    sphere_max = 4096
    ko = static.kernel_options
    sweep = ko.sweep if ko is not None else "auto"
    n_prefix = int(getattr(static, "sph_prefix", 0))
    if n_prefix > 0 and sweep in ("auto", "gather"):
        from ..models.sphere_order import effective_cluster_g

        g0 = ko.cluster_g if (ko is not None
                              and ko.cluster_g is not None) else 4
        n_local = int(static.num_spheres) - n_prefix
        g_eff = effective_cluster_g(n_local, g0)
        if -(-n_local // g_eff) <= 128:
            sphere_max = 16384
    if static.num_spheres > sphere_max or static.num_triangles > tri_max:
        return False
    if static.has_lights and static.num_instances > 64:
        return False
    return True


def deferred_image_supported(static) -> bool:
    """Gate for the deferred-image megakernel: the kernel shades
    MODE_IMAGE albedo slots as 1.0 and an XLA post-pass multiplies each
    sample by its primary-hit texel with ONE batched native gather per
    dispatch — the TPU answer to the reference's bindless samplers
    (ray_gen.glsl:193-201); a 5400x2700 atlas can neither live in VMEM
    nor be fetched per-lane in Mosaic.

    The factorization is exact only when a path can see an image texture
    at most ONCE: the scene's single instance is one analytic convex
    sphere, so a ray scattered off its EXTERIOR can never re-enter it
    (covers earth.json / earth-motion-blur.json).  That argument needs
    the camera outside the sphere — from inside, every bounce re-hits
    the interior — so the renderer additionally requires the dynamic
    `camera_outside_spheres` check over all batch times before taking
    this path.  Image scenes outside these gates render on the XLA
    wavefront."""
    f = static.flags
    if not f.has_image or f.has_checker:
        return False
    if static.has_lights or static.has_tris:
        return False
    if static.num_instances != 1 or static.num_spheres != 1:
        return False
    if not static.sphere_world_mode or not static.use_fat_shading:
        return False
    if static.bvh_mode != "none":
        return False
    return True


def camera_outside_spheres(sphere_tables, eye) -> bool:
    """Host check: the camera origin lies strictly outside every real
    sphere at every batch time (sphere_tables [B, S, 5] from
    ops/spheres.world_sphere_tables; padding rows have r = 0).

    Completes deferred_image_supported's convexity argument — a camera
    inside the image sphere makes every bounce re-hit the interior,
    breaking the one-texel-per-path factorization."""
    if sphere_tables is None:
        return False
    t = np.asarray(sphere_tables, np.float64)
    d = np.linalg.norm(t[..., 0:3] - np.asarray(eye, np.float64), axis=-1)
    r = t[..., 3]
    return bool(np.all(d > r * (1.0 + 1e-6) + 1e-9))


def _texel_factor(scene, ti_items):
    """[n_items] kernel-computed texel indices -> [n_items, 3] factors.

    ti < 0 means "no image hit" (sky miss) -> 1.0; otherwise the flat
    index into image 0's padded atlas plane, quantized in-kernel with
    exactly the wavefront sampler's nearest/repeat math
    (ops/textures.sample_image_nearest ≡ render_engine.rs:241-247).
    One f32 gather from the upload-time sRGB-decoded plane
    (arrays.SceneArrays.atlas_flat) — the ~40ns/texel random-HBM gather
    is the whole remaining cost (measured floor; the reference leans on
    hardware texture caches here, ray_gen.glsl:193-201)."""
    idx = jnp.clip(ti_items.astype(jnp.int32), 0,
                   scene.atlas_flat.shape[0] - 1)
    tex = jnp.take(scene.atlas_flat, idx, axis=0)
    return jnp.where((ti_items >= 0.0)[:, None], tex, 1.0)


def render_tile_mega(
    static,
    scene,
    geom,
    cam,
    sample_batch,
    row0,
    rows_per_tile: int,
    use_dof: bool,
    spp_local: int = 0,
    sample_base=0,
    reduce_mean: bool = True,
    interpret: bool = False,
    pix_perm=None,
    n_batches: int = 1,
    q_pix: int = 1,
    times_row=None,
):
    """Megakernel drop-in for engine.wavefront.render_tile (same contract:
    (tile [rows, W, 3], rays_traced)).

    One kernel lane owns one pixel and renders its spp_local samples
    sequentially (sample regeneration), so the kernel returns per-pixel
    radiance sums directly."""
    from ..models.compile import SKY_SOLID, SKY_VERTICAL_GRADIENT

    W = static.width
    spp = static.sqrt_spp ** 2
    if spp_local == 0:
        spp_local = spp
    n_pix = rows_per_tile * W
    cfg = make_config(static, scene, use_dof, spp_local)
    # Item mode (deferred image textures): one lane slot per
    # (pixel, sample) item, K = spp_local * n_batches samples per pixel.
    K_items = spp_local * n_batches if cfg.item_mode else 1
    n_items = n_pix * K_items
    cfg = dataclasses.replace(cfg, n_pix=n_items, n_batches=n_batches,
                              q_pix=q_pix)
    n_cells = -(-n_items // (CELL * q_pix))

    cam_tbl = jnp.concatenate([cam.view_inverse, cam.proj_inverse], axis=0)

    if static.sky_type == SKY_SOLID:
        sky = scene.sky_solid
    elif static.sky_type == SKY_VERTICAL_GRADIENT:
        fct = scene.sky_factor
        sky = scene.sky_top * (1.0 - fct) + scene.sky_bottom * fct
    else:
        sky = jnp.zeros(3, jnp.float32)

    params = jnp.zeros((1, 16), jnp.float32)
    params = params.at[0, 0].set(sample_batch.astype(jnp.float32))
    params = params.at[0, 1].set(row0.astype(jnp.float32))
    params = params.at[0, 2:5].set(sky)
    params = params.at[0, 5].set(cam.focal_length)
    params = params.at[0, 6].set(cam.aperture_size)
    params = params.at[0, 7].set(jnp.float32(sample_base))
    params = params.at[0, 8].set(scene.light_count.astype(jnp.float32))
    params = params.at[0, 9].set(scene.light_total_area)
    if cfg.item_mode:
        # Deferred image textures: actual image dims + padded atlas row
        # stride for the in-kernel texel-index quantization (the gate
        # admits exactly one image texture — atlas slot 0).
        params = params.at[0, 10].set(scene.atlas_wh[0, 0].astype(jnp.float32))
        params = params.at[0, 11].set(scene.atlas_wh[0, 1].astype(jnp.float32))
        params = params.at[0, 12].set(jnp.float32(scene.atlas.shape[2]))

    if pix_perm is not None:
        # the permutation (e.g. snake strata) may carry padding slots;
        # size the grid to it
        n_cells = -(-pix_perm.shape[0] // (CELL * q_pix))
    n_slots = n_cells * CELL * q_pix
    if pix_perm is None:
        # identity assignment in [cell][stratum][lane] slot order: lane l
        # of cell c owns pixels {c*Q*1024 + s*1024 + l}.
        pix_tbl = jax.lax.iota(jnp.int32, n_slots)
    else:
        pad = n_slots - pix_perm.shape[0]
        pix_tbl = jnp.pad(pix_perm.astype(jnp.int32), (0, pad),
                          constant_values=n_items)
    pix_tbl2 = pix_tbl.reshape(n_cells * q_pix * SUB, 128)

    (rowsT, sph, sphT, sieveT, w_tbl, bnd, clu, tri, tsieveT, tw_tbl,
     triG, o2w, light) = build_mega_tables(cfg, static, scene, geom)
    if times_row is None:
        times_row = jnp.zeros((8, 128), jnp.float32)
    else:
        times_row = jnp.asarray(times_row, jnp.float32).reshape(1, -1)
        times_row = jnp.pad(
            times_row, ((0, 7), (0, 128 - times_row.shape[1])))
    psum, traced, iters, ti = mega_dispatch(
        cfg, n_cells, cam_tbl, params, rowsT, sph, sphT, sieveT, w_tbl,
        bnd, clu, tri, tsieveT, tw_tbl, triG, o2w, light, times_row,
        pix_tbl2, interpret=interpret,
    )
    rays_traced = jnp.sum(traced)

    if pix_perm is None:
        flat = vec3.to_rows(
            V3(psum.x[:n_items], psum.y[:n_items], psum.z[:n_items]))
        traced_pix = traced[:n_items]
    else:
        # scatter lane results back to image (or item) order
        dest = pix_tbl
        flat = jnp.zeros((n_items, 3), jnp.float32)
        flat = flat.at[dest].set(
            jnp.stack([psum.x, psum.y, psum.z], axis=-1), mode="drop")
        traced_pix = jnp.zeros((n_items,), jnp.float32).at[dest].set(
            traced, mode="drop")

    if cfg.item_mode:
        # Deferred image textures: multiply each sample by its
        # primary-hit texel (ONE batched XLA gather over the full atlas,
        # at the kernel-computed texel index — no re-trace), then fold
        # the K items of each pixel back into per-pixel sums.
        if "nofactor" not in set(cfg.ablate.split(",")):  # perf triage
            if pix_perm is None:
                ti_items = ti[:n_items]
            else:
                ti_items = jnp.zeros((n_items,), jnp.float32).at[dest].set(
                    ti, mode="drop")
            flat = flat * _texel_factor(scene, ti_items)
        flat = flat.reshape(n_pix, K_items, 3).sum(axis=1)
        traced_pix = traced_pix.reshape(n_pix, K_items).sum(axis=1)

    tile = flat.reshape(rows_per_tile, W, 3)
    if reduce_mean:
        tile = tile / jnp.float32(spp_local * n_batches)
    # iters[lane] = wall-clock while-iterations of the lane's CELL (equal
    # across a cell): sum(traced)/sum(iters per cell basis) = utilization.
    return tile, rays_traced, traced_pix, iters
