"""The wavefront path-tracing loop.

One sample batch = one jit'd call (`render_batch`):

  1. interpolate instance transforms to the batch ray time and re-transform
     the object-space triangle soup to world space (replaces TLAS refit),
  2. sweep the image in row tiles with `lax.map`; each tile generates its
     pixel x sample wavefront and bounces it to termination inside a
     `lax.while_loop` with per-ray alive masks (the iterative rayColour loop
     of ray_gen.glsl:457-541, across the whole wavefront at once, with no
     host round-trips per bounce),
  3. average samples and fold the batch into the running-mean accumulation
     image ((batch*prev + new)/(batch+1), ray_gen.glsl:597-603).

Also counts rays actually traced (sum of alive lanes per bounce) for the
Mrays/s metric.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops import intersect, materials, nee, rng, transforms
from ..ops.intersect import T_MAX, T_MIN
from ..ops.materials import COSINE_PDF, LIGHT_PDF
from .arrays import SceneArrays, SceneStatic


class BounceState(NamedTuple):
    depth: jnp.ndarray        # remaining bounces (scalar i32)
    state: jnp.ndarray        # [R] rng
    ray_o: jnp.ndarray        # [R,3]
    ray_d: jnp.ndarray        # [R,3]
    throughput: jnp.ndarray   # [R,3]
    accumulated: jnp.ndarray  # [R,3]
    alive: jnp.ndarray        # [R] bool
    rays_traced: jnp.ndarray  # scalar i64-ish f32 counter


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


def bounce_wavefront(
    static: SceneStatic,
    scene: SceneArrays,
    trace_fn: Callable,
    inst_mats: transforms.InstanceMatrices,
    world_p: jnp.ndarray,
    world_n: jnp.ndarray,
    state: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
):
    """Run the full bounce loop for a wavefront; returns (radiance [R,3],
    rng state, rays_traced scalar)."""
    R = ray_o.shape[0]

    init = BounceState(
        depth=jnp.int32(static.max_ray_depth),
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

    def body(s: BounceState) -> BounceState:
        hit = trace_fn(s.ray_o, s.ray_d, s.alive)
        rays_traced = s.rays_traced + jnp.sum(s.alive.astype(jnp.float32))

        missed = s.alive & hit.missed
        bg = _background(static, scene, R)
        accumulated = s.accumulated + jnp.where(
            missed[:, None], s.throughput * bg, 0.0
        )
        alive = s.alive & ~hit.missed

        # --- unpack the hit (ray_gen.glsl:142-180): barycentric interpolation
        # over the pre-transformed world-space soup.
        tri = jnp.maximum(hit.tri, 0)
        w = 1.0 - hit.u - hit.v
        bary = jnp.stack([w, hit.u, hit.v], axis=-1)        # [R,3]
        tp = world_p[tri]                                    # [R,3,3]
        tn = world_n[tri]
        tuv = scene.tri_uv[tri]                              # [R,3,2]
        hit_p = jnp.einsum("rv,rvi->ri", bary, tp)
        nrm = jnp.einsum("rv,rvi->ri", bary, tn)
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
        uv = jnp.einsum("rv,rvi->ri", bary, tuv)
        front = jnp.sum(s.ray_d * nrm, axis=-1) < 0.0        # common.glsl:239-241
        normal = jnp.where(front[:, None], nrm, -nrm)

        mat_type = jnp.where(alive, scene.tri_mat_type[tri], 0)
        mat_index = scene.tri_mat_index[tri]

        # --- emission (ray_gen.glsl:499-500)
        emit = materials.calculate_emission(
            scene, static.flags, mat_type, mat_index, hit_p, front, uv[:, 0], uv[:, 1]
        )
        accumulated = accumulated + jnp.where(alive[:, None], s.throughput * emit, 0.0)

        # --- scatter (ray_gen.glsl:503-506)
        rstate, srec = materials.calculate_scatter(
            s.state, scene, static.flags, mat_type, mat_index,
            hit_p, normal, front, uv[:, 0], uv[:, 1], s.ray_d,
        )
        alive = alive & srec.is_scattered

        if static.has_lights:
            # --- NEE / MIS path (ray_gen.glsl:516-537)
            hit_o2w = inst_mats.object_to_world[scene.tri_inst[tri]]
            rstate, light = nee.sample_light_sources(rstate, scene, hit_o2w)
            rstate, chosen = nee.choose_mixture_pdf(
                rstate, srec.mat_pdf_type, static.has_lights
            )
            rstate, sdir = nee.gen_scatter_direction(rstate, chosen, hit_p, normal, light)
            scatter_pdf = nee.pdf_value(
                srec.mat_pdf_type, sdir, normal, light, scene.light_total_area
            )
            light_pdf = nee.pdf_value(
                jnp.full_like(chosen, LIGHT_PDF), sdir, normal, light,
                scene.light_total_area,
            )
            pdf_value = 0.5 * light_pdf + 0.5 * scatter_pdf
            ratio = jnp.where(pdf_value > 0.0, scatter_pdf / jnp.where(pdf_value == 0.0, 1.0, pdf_value), 0.0)
            mis_throughput = s.throughput * srec.attenuation * ratio[:, None]
            sd_norm = jnp.maximum(jnp.linalg.norm(sdir, axis=-1, keepdims=True), 1e-20)
            mis_dir = sdir / sd_norm
        else:
            # No lights: pdfValue == scatteringPdf, the ratio cancels to 1
            # (ray_gen.glsl:523-525 with the mixture branch disabled) except
            # when the cosine pdf is exactly 0 (grazing sample) where the
            # reference would produce 0/0; we emit 0 (guarded).
            rstate, chosen = nee.choose_mixture_pdf(rstate, srec.mat_pdf_type, False)
            dummy_light = nee.LightSample(
                position=jnp.zeros_like(hit_p), normal=jnp.zeros_like(hit_p)
            )
            rstate, sdir = nee.gen_scatter_direction(
                rstate, chosen, hit_p, normal, dummy_light
            )
            scatter_pdf = nee.pdf_value(
                srec.mat_pdf_type, sdir, normal, dummy_light, jnp.float32(1.0)
            )
            ratio = jnp.where(scatter_pdf > 0.0, 1.0, 0.0)
            mis_throughput = s.throughput * srec.attenuation * ratio[:, None]
            sd_norm = jnp.maximum(jnp.linalg.norm(sdir, axis=-1, keepdims=True), 1e-20)
            mis_dir = sdir / sd_norm

        # --- select between skip-pdf (specular) and MIS paths
        use_skip = srec.skip_pdf
        new_throughput = jnp.where(
            use_skip[:, None],
            s.throughput * srec.attenuation,
            mis_throughput,
        )
        new_dir = jnp.where(use_skip[:, None], srec.skip_dir, mis_dir)

        ray_o = jnp.where(alive[:, None], hit_p, s.ray_o)
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

    final = jax.lax.while_loop(cond, body, init)
    return final.accumulated, final.state, final.rays_traced


def make_trace_fn(static: SceneStatic, scene: SceneArrays, world_p: jnp.ndarray,
                  chunk: int = 512):
    """Default tracer: BVH when the scene was built with one, else the
    brute-force sweep."""
    if static.bvh_num_leaves > 0:
        from ..ops.bvh import make_bvh_trace_fn

        return make_bvh_trace_fn(
            scene.bvh_child_boxes,
            static.bvh_num_leaves,
            static.bvh_leaf_size,
            static.bvh_stack_depth,
            world_p,
        )

    def trace(o, d, alive):
        return intersect.intersect_brute_force(o, d, world_p, active=alive, chunk=chunk)

    return trace


def render_tile(
    static: SceneStatic,
    scene: SceneArrays,
    cam: cam_ops.CameraArrays,
    trace_fn,
    inst_mats,
    world_p,
    world_n,
    sample_batch,
    row0,
    rows_per_tile: int,
    use_dof: bool,
):
    """Render `rows_per_tile` pixel rows x width x spp samples; returns the
    tile image [rows, W, 3] (sample-averaged) and rays-traced count."""
    W = static.width
    sqrt_spp = static.sqrt_spp
    spp = sqrt_spp * sqrt_spp

    n_rays = rows_per_tile * W * spp
    ray_ids = jnp.arange(n_rays, dtype=jnp.uint32)

    s = ray_ids % spp
    pix = ray_ids // spp
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
        static, scene, trace_fn, inst_mats, world_p, world_n, state, ray_o, ray_d
    )

    tile = radiance.reshape(rows_per_tile, W, spp, 3).mean(axis=2)
    return tile, rays_traced


def render_batch(
    static: SceneStatic,
    scene: SceneArrays,
    cam: cam_ops.CameraArrays,
    accum: jnp.ndarray,
    sample_batch: jnp.ndarray,
    batch_time: jnp.ndarray,
    rows_per_tile: int,
    use_dof: bool = False,
    trace_builder=None,
):
    """One full progressive batch; returns (new accum [H,W,3], rays traced).

    `trace_builder(static, scene, world_p)` may supply a BVH tracer; defaults
    to the brute-force sweep.
    """
    H, W = static.height, static.width

    inst_mats = transforms.interpolate_instances(
        scene.inst_t0, scene.inst_t1, batch_time
    )
    world_p, world_n = transforms.transform_soup(
        scene.tri_p, scene.tri_n, scene.tri_inst, inst_mats
    )

    if trace_builder is None:
        trace_fn = make_trace_fn(static, scene, world_p)
    else:
        trace_fn = trace_builder(static, scene, world_p)

    n_tiles = -(-H // rows_per_tile)

    def tile_fn(row0):
        return render_tile(
            static, scene, cam, trace_fn, inst_mats, world_p, world_n,
            sample_batch, row0, rows_per_tile, use_dof,
        )

    row_starts = jnp.arange(n_tiles, dtype=jnp.int32) * rows_per_tile
    tiles, rays = jax.lax.map(tile_fn, row_starts)
    img = tiles.reshape(n_tiles * rows_per_tile, W, 3)[:H]

    b = sample_batch.astype(jnp.float32)
    new_accum = (b * accum + img) / (b + 1.0)
    return new_accum, jnp.sum(rays)
