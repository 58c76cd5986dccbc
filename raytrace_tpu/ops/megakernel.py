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
    sky_is_gradient: bool = False


def _fetch_rows(rowsT_ref, prim, P: int, rows_needed):
    """One-hot MXU fetch: per sublane k, rowsT [64,P] @ onehot [P,128].

    Returns {slot: (8,128) f32}.  Precision.HIGHEST makes the fetch exact
    (default f32 matmul runs bf16 passes, ~2e-3 error — probed)."""
    subs = []
    for k in range(SUB):
        pk = prim[k:k + 1, :]                                   # [1,128]
        io = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
        oh = (io == pk).astype(jnp.float32)
        subs.append(jax.lax.dot_general(
            rowsT_ref[:], oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))                # [64,128]
    return {
        j: jnp.concatenate([s[j:j + 1, :] for s in subs], axis=0)
        for j in rows_needed
    }


def _sweep(cfg: MegaConfig, sph_ref, tri_ref, o: V3, d: V3, nzero):
    """Closest hit: scalar-loop sweep over SMEM tables, unrolled x8.

    Returns (t, prim, is_sphere, bu, bv) matching engine.wavefront.RawHit
    conventions (prim = sphere id | s_pad + tri id)."""
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

        def sph_chunk(ci, carry):
            bt, bid = carry
            for u in range(8):
                si = ci * 8 + u
                cx = sph_ref[si, 0]
                cy = sph_ref[si, 1]
                cz = sph_ref[si, 2]
                k = sph_ref[si, 4]
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

        bt, bid = jax.lax.fori_loop(0, S8 // 8, sph_chunk, (bt, bid))

    if cfg.n_tris:
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
    """In-kernel sample_light_sources_v3: alias-table row selected by an
    SMEM compare-select loop instead of a gather (ray_gen.glsl:252-281)."""
    state, u1 = rng.random_float(state)
    state, u2 = rng.random_float(state)

    n = lcount
    i = jnp.minimum((u1 * n).astype(jnp.int32),
                    jnp.maximum(n.astype(jnp.int32) - 1, 0))
    nz = u1 * 0.0
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
_SHADE_SLOTS = tuple(range(28))


def _rows_needed(cfg: MegaConfig):
    need = set(_SHADE_SLOTS)
    if cfg.n_spheres:
        need.update(range(_SLOT_W2O, _SLOT_W2O + 12))
        need.update(range(_SLOT_C, _SLOT_C + 3))
        need.add(_SLOT_R)
    if cfg.n_tris:
        need.update(range(_SLOT_TRIN, _SLOT_TRIN + 9))
    if cfg.has_lights:
        need.add(_SLOT_INST)
    return tuple(sorted(need))


def _mega_kernel(cam_ref, prm_ref, sph_ref, tri_ref, rowsT_ref, o2w_ref,
                 light_ref, rx_ref, ry_ref, rz_ref, tr_ref, *,
                 cfg: MegaConfig):
    from . import shading

    cell = pl.program_id(0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    gid = cell * CELL + sub * 128 + lane                # tile-local ray id

    spp_l = cfg.spp_local
    sample_base = prm_ref[0, 7].astype(jnp.int32)
    row0 = prm_ref[0, 1].astype(jnp.int32)
    s = gid % spp_l + sample_base
    pix = gid // spp_l
    px = pix % cfg.width
    py = row0 + pix // cfg.width

    batch = prm_ref[0, 0].astype(jnp.int32)
    state = rng.init_rng(batch.astype(jnp.uint32), s.astype(jnp.uint32),
                         py.astype(jnp.uint32), px.astype(jnp.uint32),
                         cfg.width, cfg.height, cfg.spp)

    si = s % cfg.sqrt_spp
    sj = s // cfg.sqrt_spp
    cam = _CamRef(cam_ref, prm_ref[0, 5], prm_ref[0, 6])
    state, ray_o, ray_d = cam_ops.get_rays_v3(
        state, cam, px, py, si, sj, cfg.width, cfg.height, cfg.sqrt_spp,
        use_dof=cfg.use_dof,
    )

    nzero = ray_d.x * 0.0
    bg = V3(nzero + prm_ref[0, 2], nzero + prm_ref[0, 3], nzero + prm_ref[0, 4])
    lcount = prm_ref[0, 8]
    larea = prm_ref[0, 9]

    rows_needed = _rows_needed(cfg)

    def bounce(_, carry):
        def body(args):
            (state, ray_o, ray_d, thr, acc, alive, traced) = args
            traced = traced + alive.astype(jnp.float32)

            bt, prim, is_sphere, bu, bv, tp = _sweep(
                cfg, sph_ref, tri_ref, ray_o, ray_d, nzero)
            missed = bt >= T_MAX
            hit_gate = alive & ~missed
            acc = vec3.where(alive & missed, acc + thr * bg, acc)
            alive2 = hit_gate

            slots = _fetch_rows(rowsT_ref, jnp.maximum(prim, 0),
                                cfg.P, rows_needed)
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
                m_cols = tuple(slots[_SLOT_W2O + i] for i in range(12))
                c = V3(slots[_SLOT_C], slots[_SLOT_C + 1], slots[_SLOT_C + 2])
                r = slots[_SLOT_R]
                p_obj = vec3.mat34_apply_point(m_cols, sp)
                inv_r = 1.0 / jnp.where(r == 0.0, 1.0, r)
                n_obj = V3((p_obj.x - c.x) * inv_r, (p_obj.y - c.y) * inv_r,
                           (p_obj.z - c.z) * inv_r)
                sn = vec3.mat34_apply_transposed_vec(m_cols, n_obj)
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
            state2, srec, emit = shading.scatter_and_emit_v3(
                state, None, cfg.flags, rows, hp, normal, front,
                nzero, nzero, ray_d,
            )
            acc = vec3.where(alive2, acc + thr * emit, acc)
            alive2 = alive2 & srec.is_scattered

            if cfg.has_lights:
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

            new_thr = vec3.where(srec.skip_pdf, thr * srec.attenuation, mis_thr)
            new_dir = vec3.where(srec.skip_pdf, srec.skip_dir, mis_dir)

            ray_o = vec3.where(alive2, hp, ray_o)
            ray_d = vec3.where(alive2, new_dir, ray_d)
            thr = vec3.where(alive2, new_thr, thr)
            return (state2, ray_o, ray_d, thr, acc, alive2, traced)

        alive = carry[5]
        n_alive = jnp.sum(alive.astype(jnp.int32))
        return jax.lax.cond(n_alive > 0, body, lambda a: a, carry)

    init = (
        state, ray_o, ray_d,
        V3(nzero + 1.0, nzero + 1.0, nzero + 1.0),       # throughput
        V3(nzero, nzero, nzero),                          # accumulated
        nzero < 1.0,                                      # alive (all True)
        nzero,                                            # traced
    )
    out = jax.lax.fori_loop(0, cfg.max_depth, bounce, init)
    acc = out[4]
    rx_ref[:] = acc.x
    ry_ref[:] = acc.y
    rz_ref[:] = acc.z
    tr_ref[:] = out[6]


def build_mega_tables(static, scene, geom):
    """Per-batch device tables for the megakernel (cheap jnp ops, called
    inside prepare; everything is already on device).

    Returns (rowsT [64,P], sph [S8,8], tri [T8,16], o2w [I,12], light [L8,16]).
    """
    prim_rows = geom.prim_rows                       # [P, 64]
    P = prim_rows.shape[0]
    if static.has_tris:
        att = geom.tri_attr16                         # [T8,16]: n0 dn1 dn2 uv...
        s_pad = scene.sph_center.shape[0]
        T = min(att.shape[0], P - s_pad)
        prim_rows = prim_rows.at[s_pad:s_pad + T, _SLOT_TRIN:_SLOT_TRIN + 9].set(
            att[:T, 0:9])
    rowsT = prim_rows.T

    L = scene.light_prob.shape[0]
    L8 = max(8, -(-L // 8) * 8)
    light = jnp.zeros((L8, 16), jnp.float32)
    if L:
        light = light.at[:L, 0].set(scene.light_prob)
        light = light.at[:L, 1].set(scene.light_alias.astype(jnp.float32))
        light = light.at[:L, 2:11].set(scene.light_tri_packed[:, 0:9])
    return rowsT, geom.sph_table8, geom.tri_table16, geom.inst_o2w_rows, light


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_cells", "interpret"),
)
def mega_dispatch(cfg: MegaConfig, n_cells: int, cam_tbl, params, rowsT,
                  sph, tri, o2w, light, interpret=False):
    """One pallas_call over n_cells grid cells (n_cells*1024 rays).

    Returns (rad V3 of [n_cells*1024], traced [n_cells*1024])."""
    kernel = functools.partial(_mega_kernel, cfg=cfg)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[
            smem(),                                           # cam [8,4]
            smem(),                                           # params [1,16]
            smem(),                                           # spheres [S8,8]
            smem(),                                           # tris [T8,16]
            pl.BlockSpec((64, cfg.P), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # rowsT
            smem(),                                           # o2w [I,12]
            smem(),                                           # light [L8,16]
        ],
        out_specs=[
            pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_cells * SUB, 128), jnp.float32)
            for _ in range(4)
        ],
        interpret=interpret,
    )(cam_tbl, params, sph, tri, rowsT, o2w, light)
    rx, ry, rz, tr = outs
    flat = lambda x: x.reshape(n_cells * CELL)
    return V3(flat(rx), flat(ry), flat(rz)), flat(tr)


def make_config(static, scene, use_dof: bool, spp_local: int = 0) -> MegaConfig:
    spp = static.sqrt_spp ** 2
    L = scene.light_prob.shape[0]
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
        flags=static.flags,
    )


def megakernel_supported(static, compiled=None) -> bool:
    """Static gate: scenes the fused kernel covers (the rest fall back to
    the XLA wavefront).  Excluded: image textures (atlas gathers), noise
    (perlin needs [R,3] temps), BVH/mesh mode, object-space spheres
    (non-uniform scale), huge SMEM tables, NEE over many instances."""
    f = static.flags
    if f.has_image or f.has_noise:
        return False
    if static.bvh_mode != "none" or not static.use_fat_shading:
        return False
    if static.has_spheres and not static.sphere_world_mode:
        return False
    if static.num_spheres > 4096 or static.num_triangles > 2048:
        return False
    if static.has_lights and static.num_instances > 64:
        return False
    return True


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
):
    """Megakernel drop-in for engine.wavefront.render_tile (same contract:
    (tile [rows, W, 3], rays_traced))."""
    from ..models.compile import SKY_SOLID, SKY_VERTICAL_GRADIENT

    W = static.width
    spp = static.sqrt_spp ** 2
    if spp_local == 0:
        spp_local = spp
    cfg = make_config(static, scene, use_dof, spp_local)
    n_rays = rows_per_tile * W * spp_local
    n_cells = -(-n_rays // CELL)

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

    rowsT, sph, tri, o2w, light = build_mega_tables(static, scene, geom)
    rad, traced = mega_dispatch(
        cfg, n_cells, cam_tbl, params, rowsT, sph, tri, o2w, light,
        interpret=interpret,
    )
    rad = V3(rad.x[:n_rays], rad.y[:n_rays], rad.z[:n_rays])
    rays_traced = jnp.sum(traced[:n_rays])

    tile = vec3.to_rows(rad).reshape(rows_per_tile, W, spp_local, 3)
    tile = tile.mean(axis=2) if reduce_mean else tile.sum(axis=2)
    return tile, rays_traced
