"""The wavefront path-tracing loop.

One sample batch = one jit'd call (`render_batch`):

  1. interpolate instance transforms to the batch ray time; re-transform the
     (non-sphere) triangle soup to world space and gather per-sphere
     world-to-object matrices (this replaces the reference's TLAS refit,
     acceleration.rs:91-115),
  2. sweep the image in row tiles with `lax.map`; each tile generates its
     pixel x sample wavefront and bounces it to termination inside a
     `lax.while_loop` with per-ray alive masks (the iterative rayColour loop
     of ray_gen.glsl:457-541 across the whole wavefront, no host round-trips
     per bounce),
  3. average samples and fold the batch into the running-mean accumulation
     image ((batch*prev + new)/(batch+1), ray_gen.glsl:597-603).

Geometry is traced through a unified HitRecord produced by the dense
analytic-sphere sweep (ops/spheres.py), the dense triangle sweep
(ops/intersect.py) and/or the BVH (ops/bvh.py), whichever the scene's
static configuration enables.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops import intersect, materials, nee, rng, spheres, transforms, vec
from ..ops.intersect import T_MAX, T_MIN
from ..ops.materials import LIGHT_PDF
from .arrays import SceneArrays, SceneStatic


class RawHit(NamedTuple):
    """Minimal closest-hit output of the trace sweep; attributes are
    reconstructed in the bounce body from ONE combined row fetch."""

    missed: jnp.ndarray     # [R] bool
    t: jnp.ndarray          # [R]
    prim: jnp.ndarray       # [R] unified primitive id (sphere i | S_pad + tri j)
    is_sphere: jnp.ndarray  # [R] bool
    bu: jnp.ndarray         # [R] triangle barycentric u (0 for spheres)
    bv: jnp.ndarray         # [R]


class HitRecord(NamedTuple):
    """Unified closest-hit result for a wavefront (ray_gen.glsl HitRecord +
    material/instance ids resolved, common.glsl:98-102)."""

    missed: jnp.ndarray     # [R] bool
    t: jnp.ndarray          # [R]
    p: jnp.ndarray          # [R,3] world hit position
    n: jnp.ndarray          # [R,3] unit outward (data-side) normal
    u: jnp.ndarray          # [R]
    v: jnp.ndarray          # [R]
    mat_type: jnp.ndarray   # [R]
    mat_index: jnp.ndarray  # [R]
    inst: jnp.ndarray       # [R] instance id of the hit primitive
    prim: jnp.ndarray       # [R] unified primitive id (sphere i | S_pad + tri j)


class BounceState(NamedTuple):
    depth: jnp.ndarray
    state: jnp.ndarray
    ray_o: jnp.ndarray
    ray_d: jnp.ndarray
    throughput: jnp.ndarray
    accumulated: jnp.ndarray
    alive: jnp.ndarray
    rays_traced: jnp.ndarray


def _compact_size(R: int) -> int:
    """Next compaction size after R (0 = stop compacting)."""
    if R < 16384:
        return 0
    return max(2048, (R // 8 + 1023) // 1024 * 1024)


def _compact_schedule(R: int):
    """Descending wavefront sizes for the multi-phase bounce loop."""
    sizes = []
    cur = R
    while True:
        nxt = _compact_size(cur)
        if nxt == 0 or nxt >= cur:
            break
        sizes.append(nxt)
        cur = nxt
    return sizes


def _background(static: SceneStatic, scene: SceneArrays, n: int):
    """Sky colour (quirk: direction-independent, ray_gen.glsl:442-455)."""
    from ..models.compile import SKY_SOLID, SKY_VERTICAL_GRADIENT

    if static.sky_type == SKY_SOLID:
        col = scene.sky_solid
    elif static.sky_type == SKY_VERTICAL_GRADIENT:
        f = scene.sky_factor
        col = scene.sky_top * (1.0 - f) + scene.sky_bottom * f
    else:
        col = jnp.zeros(3, jnp.float32)
    return jnp.broadcast_to(col, (n, 3))


def make_trace_fn(static: SceneStatic, scene: SceneArrays,
                  geom: "BatchGeometry"):
    """Build the unified closest-hit tracer for this batch.

    Returns trace(o, d, alive) -> HitRecord.  Each enabled geometry family
    is swept and the nearest hit wins; disabled families cost nothing
    (static specialization).
    """
    use_tris = static.has_tris
    use_spheres = static.has_spheres
    world_p, world_n = geom.world_p, geom.world_n
    s_pad = scene.sph_center.shape[0]

    def trace(o, d, alive) -> RawHit:
        R = o.shape[0]
        t_best = jnp.full((R,), T_MAX, jnp.float32)

        tri_hit = None
        if use_tris:
            if static.bvh_mode == "sah":
                from ..ops.bvh import BVHArrays, pack_world_tris, traverse_sah

                v0, e1, e2 = pack_world_tris(world_p)
                tri_hit = traverse_sah(
                    BVHArrays(scene.bvh_child_boxes, v0, e1, e2),
                    static.bvh_root, static.bvh_leaf_size,
                    static.bvh_stack_depth, o, d, active=alive,
                )
            elif static.bvh_mode == "implicit":
                from ..ops.bvh import BVHArrays, pack_world_tris, traverse

                v0, e1, e2 = pack_world_tris(world_p)
                tri_hit = traverse(
                    BVHArrays(scene.bvh_child_boxes, v0, e1, e2),
                    static.bvh_num_leaves, static.bvh_leaf_size,
                    static.bvh_stack_depth, o, d, active=alive,
                )
            elif static.use_pallas_sweep:
                from ..ops.pallas_tri_sweep import intersect_tris_pallas

                tri_hit = intersect_tris_pallas(
                    o, d, geom.tri_table16, active=alive,
                    interpret=static.pallas_interpret,
                )
            else:
                tri_hit = intersect.intersect_brute_force(
                    o, d, world_p, active=alive,
                    chunk=min(512, world_p.shape[0]),
                )
            t_best = tri_hit.t

        sph_hit = None
        if use_spheres:
            if static.sphere_world_mode and static.use_pallas_sweep:
                from ..ops.pallas_sweep import intersect_spheres_pallas

                sph_hit = intersect_spheres_pallas(
                    o, d, geom.sph_table8, active=alive,
                    interpret=static.pallas_interpret,
                )
            elif static.sphere_world_mode:
                sph_hit = spheres.intersect_spheres_world(
                    o, d, geom.sph_table, active=alive,
                    chunk=min(128, s_pad),
                )
            else:
                sph_hit = spheres.intersect_spheres(
                    o, d, scene.sph_center, scene.sph_radius, geom.sph_w2o,
                    active=alive, chunk=min(128, s_pad),
                )
            t_best = jnp.minimum(t_best, sph_hit.t)

        missed = t_best >= T_MAX
        zeros = jnp.zeros((R,), jnp.float32)

        if use_tris and use_spheres:
            sphere_wins = sph_hit.t < tri_hit.t
            tri = jnp.maximum(tri_hit.tri, 0)
            sid = jnp.maximum(sph_hit.sph, 0)
            return RawHit(
                missed=missed, t=t_best,
                prim=jnp.where(sphere_wins, sid, s_pad + tri),
                is_sphere=sphere_wins,
                bu=jnp.where(sphere_wins, 0.0, tri_hit.u),
                bv=jnp.where(sphere_wins, 0.0, tri_hit.v),
            )
        if use_spheres:
            sid = jnp.maximum(sph_hit.sph, 0)
            return RawHit(
                missed=missed, t=t_best, prim=sid,
                is_sphere=jnp.ones((R,), bool), bu=zeros, bv=zeros,
            )
        tri = jnp.maximum(tri_hit.tri, 0)
        return RawHit(
            missed=missed, t=t_best, prim=s_pad + tri,
            is_sphere=jnp.zeros((R,), bool), bu=tri_hit.u, bv=tri_hit.v,
        )

    return trace


def reconstruct_hit(static: SceneStatic, scene: SceneArrays,
                    geom: "BatchGeometry", raw: RawHit, ray_o, ray_d,
                    rows=None) -> HitRecord:
    """RawHit → full HitRecord.

    With combined rows (fat path) the per-hit data — material, w2o,
    object-space sphere center/radius — all come from the single row fetch;
    only triangle scenes add three soup gathers for barycentric attributes.
    """
    R = raw.prim.shape[0]
    s_pad = scene.sph_center.shape[0]

    if static.has_tris:
        tri = jnp.maximum(raw.prim - s_pad, 0)
        w = 1.0 - raw.bu - raw.bv
        bary = jnp.stack([w, raw.bu, raw.bv], axis=-1)
        tp = geom.world_p[tri]
        tn = geom.world_n[tri]
        tuv = scene.tri_uv[tri]
        tri_p_hit = jnp.einsum("rv,rvi->ri", bary, tp)
        tri_n_hit = jnp.einsum("rv,rvi->ri", bary, tn)
        tri_uv_hit = jnp.einsum("rv,rvi->ri", bary, tuv)

    if static.has_spheres:
        if rows is not None:
            w2o = rows[:, 32:44].reshape(R, 3, 4)
            c = rows[:, 44:47]
            r = rows[:, 47]
        else:
            sid = jnp.minimum(raw.prim, s_pad - 1)
            w2o = geom.sph_w2o[sid]
            c = scene.sph_center[sid]
            r = scene.sph_radius[sid]
        sp = ray_o + raw.t[:, None] * ray_d
        p_obj = jnp.einsum("rij,rj->ri", w2o[:, :, :3], sp) + w2o[:, :, 3]
        n_obj = (p_obj - c) / jnp.where(r == 0.0, 1.0, r)[:, None]
        sn = jnp.einsum("rj,rji->ri", n_obj, w2o[:, :, :3])
        nn = vec.normalize(n_obj)
        sv = jnp.arccos(jnp.clip(-nn[:, 1], -1.0, 1.0)) / spheres.PI
        su = (jnp.arctan2(nn[:, 2], -nn[:, 0]) / spheres.TWO_PI) % 1.0

    if static.has_tris and static.has_spheres:
        sw = raw.is_sphere
        n = jnp.where(sw[:, None], sn, tri_n_hit)
        p = jnp.where(sw[:, None], sp, tri_p_hit)
        u = jnp.where(sw, su, tri_uv_hit[:, 0])
        v = jnp.where(sw, sv, tri_uv_hit[:, 1])
    elif static.has_spheres:
        n, p, u, v = sn, sp, su, sv
    else:
        n, p = tri_n_hit, tri_p_hit
        u, v = tri_uv_hit[:, 0], tri_uv_hit[:, 1]

    n = vec.normalize(n)

    if rows is not None:
        mat_type = rows[:, 0].astype(jnp.int32)
        mat_index = jnp.zeros((R,), jnp.int32)       # unused on the fat path
        inst = rows[:, 48].astype(jnp.int32)
    else:
        tri_c = jnp.maximum(raw.prim - s_pad, 0) if static.has_tris else 0
        sid = jnp.minimum(raw.prim, s_pad - 1)
        if static.has_tris and static.has_spheres:
            sel1 = lambda a, b: jnp.where(raw.is_sphere, a, b)
            mat_type = sel1(scene.sph_mat_type[sid], scene.tri_mat_type[tri_c])
            mat_index = sel1(scene.sph_mat_index[sid], scene.tri_mat_index[tri_c])
            inst = sel1(scene.sph_inst[sid], scene.tri_inst[tri_c])
        elif static.has_spheres:
            mat_type = scene.sph_mat_type[sid]
            mat_index = scene.sph_mat_index[sid]
            inst = scene.sph_inst[sid]
        else:
            mat_type = scene.tri_mat_type[tri_c]
            mat_index = scene.tri_mat_index[tri_c]
            inst = scene.tri_inst[tri_c]

    return HitRecord(
        missed=raw.missed, t=raw.t, p=p, n=n, u=u, v=v,
        mat_type=mat_type, mat_index=mat_index, inst=inst, prim=raw.prim,
    )


def bounce_wavefront(
    static: SceneStatic,
    scene: SceneArrays,
    trace_fn: Callable,
    geom: "BatchGeometry",
    state: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    max_depth=None,
):
    """Run the full bounce loop for a wavefront; returns (radiance [R,3],
    rng state, rays_traced scalar) — the rayColour loop (ray_gen.glsl:457-541).

    max_depth may be a traced scalar (it only bounds the while loop, not any
    shape), so depth changes never trigger recompilation."""
    R = ray_o.shape[0]
    if max_depth is None:
        max_depth = static.max_ray_depth

    init = BounceState(
        depth=jnp.int32(max_depth),
        state=state,
        ray_o=ray_o,
        ray_d=ray_d,
        throughput=jnp.ones((R, 3), jnp.float32),
        accumulated=jnp.zeros((R, 3), jnp.float32),
        alive=jnp.ones((R,), bool),
        rays_traced=jnp.float32(0.0),
    )

    def cond(s: BounceState):
        return (s.depth > 0) & jnp.any(s.alive)

    inst_mats = geom.inst_mats

    def body(s: BounceState) -> BounceState:
        raw = trace_fn(s.ray_o, s.ray_d, s.alive)
        rays_traced = s.rays_traced + jnp.sum(s.alive.astype(jnp.float32))

        missed = s.alive & raw.missed
        bg = _background(static, scene, s.alive.shape[0])
        accumulated = s.accumulated + jnp.where(
            missed[:, None], s.throughput * bg, 0.0
        )
        alive = s.alive & ~raw.missed

        # --- one combined row fetch per bounce (fat path)
        if static.use_fat_shading:
            prim = jnp.where(alive, raw.prim, 0)
            P = geom.prim_rows.shape[0]
            rows = geom.prim_rows[jnp.clip(prim, 0, P - 1)]
        else:
            rows = None

        rec = reconstruct_hit(static, scene, geom, raw, s.ray_o, s.ray_d,
                              rows=rows)

        front = jnp.sum(s.ray_d * rec.n, axis=-1) < 0.0   # common.glsl:239-241
        normal = jnp.where(front[:, None], rec.n, -rec.n)

        # --- emission + scatter (ray_gen.glsl:499-506)
        if static.use_fat_shading:
            from ..ops import shading

            rstate, srec, emit = shading.scatter_and_emit(
                s.state, scene, static.flags, rows,
                rec.p, normal, front, rec.u, rec.v, s.ray_d,
            )
        else:
            mat_type = jnp.where(alive, rec.mat_type, 0)
            mat_index = rec.mat_index
            emit = materials.calculate_emission(
                scene, static.flags, mat_type, mat_index, rec.p, front,
                rec.u, rec.v,
            )
            rstate, srec = materials.calculate_scatter(
                s.state, scene, static.flags, mat_type, mat_index,
                rec.p, normal, front, rec.u, rec.v, s.ray_d,
            )
        accumulated = accumulated + jnp.where(alive[:, None], s.throughput * emit, 0.0)
        alive = alive & srec.is_scattered

        if static.has_lights:
            # --- NEE / MIS path (ray_gen.glsl:516-537)
            hit_o2w = inst_mats.object_to_world[rec.inst]
            rstate, light = nee.sample_light_sources(rstate, scene, hit_o2w)
            rstate, chosen = nee.choose_mixture_pdf(
                rstate, srec.mat_pdf_type, static.has_lights
            )
            rstate, sdir = nee.gen_scatter_direction(
                rstate, chosen, rec.p, normal, light
            )
            scatter_pdf = nee.pdf_value(
                srec.mat_pdf_type, sdir, normal, light, scene.light_total_area
            )
            light_pdf = nee.pdf_value(
                jnp.full_like(chosen, LIGHT_PDF), sdir, normal, light,
                scene.light_total_area,
            )
            pdf_value = 0.5 * light_pdf + 0.5 * scatter_pdf
            ratio = jnp.where(
                pdf_value > 0.0,
                scatter_pdf / jnp.where(pdf_value == 0.0, 1.0, pdf_value),
                0.0,
            )
            mis_throughput = s.throughput * srec.attenuation * ratio[:, None]
            mis_dir = vec.normalize(sdir)
        else:
            # No lights: pdfValue == scatteringPdf and the ratio cancels to 1
            # except where the cosine pdf is exactly 0 (the reference's 0/0;
            # guarded to 0 here).
            rstate, chosen = nee.choose_mixture_pdf(rstate, srec.mat_pdf_type, False)
            dummy_light = nee.LightSample(
                position=jnp.zeros_like(rec.p), normal=jnp.zeros_like(rec.p)
            )
            rstate, sdir = nee.gen_scatter_direction(
                rstate, chosen, rec.p, normal, dummy_light
            )
            scatter_pdf = nee.pdf_value(
                srec.mat_pdf_type, sdir, normal, dummy_light, jnp.float32(1.0)
            )
            ratio = jnp.where(scatter_pdf > 0.0, 1.0, 0.0)
            mis_throughput = s.throughput * srec.attenuation * ratio[:, None]
            mis_dir = vec.normalize(sdir)

        use_skip = srec.skip_pdf
        new_throughput = jnp.where(
            use_skip[:, None], s.throughput * srec.attenuation, mis_throughput
        )
        new_dir = jnp.where(use_skip[:, None], srec.skip_dir, mis_dir)

        ray_o = jnp.where(alive[:, None], rec.p, s.ray_o)
        ray_d = jnp.where(alive[:, None], new_dir, s.ray_d)
        throughput = jnp.where(alive[:, None], new_throughput, s.throughput)

        return BounceState(
            depth=s.depth - 1,
            state=rstate,
            ray_o=ray_o,
            ray_d=ray_d,
            throughput=throughput,
            accumulated=accumulated,
            alive=alive,
            rays_traced=rays_traced,
        )

    # --- multi-phase execution with tail compaction -----------------------
    # Every while iteration costs O(R) regardless of how many rays are still
    # alive, and scenes run to max_ray_depth=50 while the mean path length
    # is ~2-5 — so the tail dominates.  Each phase runs until the alive
    # count drops below the next (8x smaller) wavefront size, then the
    # survivors are compacted (sorted alive-first) and the loop continues
    # at 1/8 cost.  Contributions scatter back by index after each phase.
    sizes = _compact_schedule(R)
    if not sizes:
        final = jax.lax.while_loop(cond, body, init)
        return final.accumulated, final.state, final.rays_traced

    accumulated_total = jnp.zeros((R, 3), jnp.float32)
    state_out = init.state
    rays_total = jnp.float32(0.0)
    sel_chain = jnp.arange(R)  # composed selection back to original indices
    s_cur = init

    for next_size in sizes + [0]:
        if next_size > 0:
            def cond_phase(s, _n=next_size):
                return (s.depth > 0) & (jnp.sum(s.alive) > _n)
        else:
            cond_phase = cond
        s_cur = jax.lax.while_loop(cond_phase, body, s_cur)

        idx = sel_chain
        accumulated_total = accumulated_total.at[idx].add(s_cur.accumulated)
        state_out = state_out.at[idx].set(s_cur.state)
        rays_total = rays_total + s_cur.rays_traced

        if next_size == 0:
            break

        sel = jnp.argsort(~s_cur.alive)[:next_size]
        sel_chain = idx[sel]
        s_cur = BounceState(
            depth=s_cur.depth,
            state=s_cur.state[sel],
            ray_o=s_cur.ray_o[sel],
            ray_d=s_cur.ray_d[sel],
            throughput=s_cur.throughput[sel],
            accumulated=jnp.zeros((next_size, 3), jnp.float32),
            alive=s_cur.alive[sel],
            rays_traced=jnp.float32(0.0),
        )

    return accumulated_total, state_out, rays_total


def render_tile(
    static: SceneStatic,
    scene: SceneArrays,
    cam: cam_ops.CameraArrays,
    trace_fn,
    geom,
    sample_batch,
    row0,
    rows_per_tile: int,
    use_dof: bool,
    spp_local: int = 0,
    sample_base=0,
    reduce_mean: bool = True,
    max_depth=None,
):
    """Render `rows_per_tile` pixel rows x width x spp_local samples.

    spp_local/sample_base support sample-axis sharding across chips: a shard
    renders samples [sample_base, sample_base+spp_local) of the pixel's spp
    grid.  With reduce_mean the tile is averaged over local samples (single
    chip); otherwise the per-sample SUM is returned for a cross-chip psum.
    Returns (tile [rows, W, 3], rays-traced count).
    """
    W = static.width
    sqrt_spp = static.sqrt_spp
    spp = sqrt_spp * sqrt_spp
    if spp_local == 0:
        spp_local = spp

    n_rays = rows_per_tile * W * spp_local
    ray_ids = jnp.arange(n_rays, dtype=jnp.uint32)

    s = ray_ids % spp_local + jnp.uint32(sample_base)
    pix = ray_ids // spp_local
    px = pix % W
    py = row0.astype(jnp.uint32) + pix // W
    si = (s % sqrt_spp).astype(jnp.int32)
    sj = (s // sqrt_spp).astype(jnp.int32)

    state = rng.init_rng(sample_batch, s, py, px, static.width, static.height, spp)

    state, ray_o, ray_d = cam_ops.get_rays(
        state, cam, px.astype(jnp.int32), py.astype(jnp.int32), si, sj,
        static.width, static.height, sqrt_spp, use_dof=use_dof,
    )

    radiance, state, rays_traced = bounce_wavefront(
        static, scene, trace_fn, geom, state, ray_o, ray_d,
        max_depth=max_depth,
    )

    tile = radiance.reshape(rows_per_tile, W, spp_local, 3)
    tile = tile.mean(axis=2) if reduce_mean else tile.sum(axis=2)
    return tile, rays_traced


class BatchGeometry(NamedTuple):
    """Per-batch world-space geometry (the refit product)."""

    inst_mats: transforms.InstanceMatrices
    world_p: jnp.ndarray   # [T,3,3] (dummy [1,3,3] when no triangles)
    world_n: jnp.ndarray
    sph_w2o: jnp.ndarray   # [S,3,4] world-to-object per sphere
    sph_table: jnp.ndarray # [S,5] world c/r/k (host-precomputed per batch)
    sph_table8: jnp.ndarray # [S8,8] kernel-layout table for the Pallas sweep
    tri_table16: jnp.ndarray # [T8,16] kernel-layout triangles (Pallas sweep)
    prim_rows: jnp.ndarray # [P,64] combined per-primitive rows (fat path;
                           # [1,64] dummy otherwise)


def prepare_batch(static: SceneStatic, scene: SceneArrays,
                  batch_time: jnp.ndarray,
                  sph_table=None) -> BatchGeometry:
    """Interpolate instance transforms to the batch ray time and re-transform
    the triangle soup — the replacement for the reference's per-batch TLAS
    refit (acceleration.rs:91-115).  One jit'd call per batch.

    sph_table: [S,5] world-space sphere rows for this batch time
    (ops/spheres.world_sphere_tables), or None for the object-space path.
    """
    inst_mats = transforms.interpolate_instances(
        scene.inst_t0, scene.inst_t1, batch_time
    )
    if static.has_tris:
        world_p, world_n = transforms.transform_soup(
            scene.tri_p, scene.tri_n, scene.tri_inst, inst_mats
        )
    else:
        world_p = world_n = jnp.zeros((1, 3, 3), jnp.float32)
    if static.has_spheres:
        sph_w2o = inst_mats.world_to_object[scene.sph_inst]
    else:
        sph_w2o = jnp.zeros((scene.sph_center.shape[0], 3, 4), jnp.float32)
    if sph_table is None:
        sph_table = jnp.zeros((scene.sph_center.shape[0], 5), jnp.float32)
    if static.use_pallas_sweep:
        from ..ops.pallas_sweep import pad_table8

        sph_table8 = pad_table8(jnp.asarray(sph_table))
    else:
        sph_table8 = jnp.zeros((8, 8), jnp.float32)
    if static.use_pallas_sweep and static.has_tris and static.bvh_mode == "none":
        from ..ops.pallas_tri_sweep import pack_tri_table

        tri_table16 = pack_tri_table(world_p, static.num_triangles)
    else:
        tri_table16 = jnp.zeros((8, 16), jnp.float32)

    # Combined per-primitive rows: ONE fetch per bounce serves shading,
    # sphere attributes, and NEE's instance transform.
    # [0:32] shading row | [32:44] w2o | [44:47] obj center | [47] radius
    # | [48] instance id | [49:64] pad.
    if static.use_fat_shading:
        s_pad = scene.sph_center.shape[0]
        P = scene.shade_rows.shape[0]
        rows = jnp.zeros((P, 64), jnp.float32)
        rows = rows.at[:, 0:32].set(scene.shade_rows)
        rows = rows.at[:s_pad, 32:44].set(sph_w2o.reshape(s_pad, 12))
        rows = rows.at[:s_pad, 44:47].set(scene.sph_center)
        rows = rows.at[:s_pad, 47].set(scene.sph_radius)
        rows = rows.at[:s_pad, 48].set(scene.sph_inst.astype(jnp.float32))
        rows = rows.at[s_pad:, 48].set(scene.tri_inst.astype(jnp.float32))
        prim_rows = rows
    else:
        prim_rows = jnp.zeros((1, 64), jnp.float32)

    return BatchGeometry(inst_mats=inst_mats, world_p=world_p, world_n=world_n,
                         sph_w2o=sph_w2o, sph_table=jnp.asarray(sph_table),
                         sph_table8=sph_table8, tri_table16=tri_table16,
                         prim_rows=prim_rows)


def render_tile_step(
    static: SceneStatic,
    scene: SceneArrays,
    geom: BatchGeometry,
    cam: cam_ops.CameraArrays,
    sample_batch: jnp.ndarray,
    row0: jnp.ndarray,
    rows_per_tile: int,
    use_dof: bool = False,
    trace_builder=None,
    max_depth=None,
):
    """One jit'd dispatch: render a tile of pixel rows for one batch.

    Kept to a bounded ray count per dispatch — the moral equivalent of the
    reference's <=64 spp / <=32 batch guidance against GPU timeouts
    (ray_gen.glsl:68-74); long-running single dispatches can trip device
    watchdogs here too.
    """
    if trace_builder is None:
        trace_fn = make_trace_fn(static, scene, geom)
    else:
        trace_fn = trace_builder(static, scene, geom)
    return render_tile(
        static, scene, cam, trace_fn, geom,
        sample_batch, row0, rows_per_tile, use_dof, max_depth=max_depth,
    )
