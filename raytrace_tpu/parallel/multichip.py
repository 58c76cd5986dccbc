"""Sharded wavefront rendering over a jax.sharding.Mesh.

Layout:
- mesh axes ("px", "sp"): image rows are sharded over "px"; each pixel's
  samples are split over "sp".
- scene/camera/geometry inputs are replicated (broadcast once).
- each device renders its (row-shard, sample-shard) wavefront fully
  independently — ray bouncing is embarrassingly parallel with shared
  read-only scene state — then one `psum` over "sp" (ICI) folds partial
  sample sums; the output image shards over "px" with no communication.

Optional third axis ("sc") SHARDS THE SCENE ITSELF for scenes too large
to replicate per chip: primitive tables (and the fat shading rows) are
row-sharded over "sc", rays replicate across it, and every bounce runs
one closest-hit pmin combine plus one-owner masked psums for the
winner's rows (engine/wavefront._sc_combine_hit / _sc_fetch) — all over
ICI.  make_mesh(sp=, sc=) builds either layout.

This is the TPU-native replacement for what would be multi-queue /
multi-GPU work distribution in the reference's architecture (it had none).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.arrays import SceneArrays, SceneStatic, upload_scene
from ..engine.wavefront import BatchGeometry, prepare_batch, render_tile
from ..ops import camera as cam_ops


def make_mesh(devices=None, sp: Optional[int] = None,
              sc: Optional[int] = None) -> Mesh:
    """Build a ("px", "sp") — or ("px", "sp", "sc") — mesh.

    `sp` fixes the sample-axis size (must divide device count); by default
    uses 2 when the device count is even, else 1.  `sc` > 1 adds the
    scene-sharding axis: primitive tables are row-sharded over it and the
    bounce loop combines per-shard hits with pmin/psum collectives — for
    scenes too large to replicate per chip.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sc = sc or 1
    if sc < 1:
        raise ValueError(f"sc must be >= 1, got {sc}")
    if sp is None:
        rem = max(1, n // sc)
        sp = 2 if rem % 2 == 0 and rem > 1 else 1
    if n % (sp * sc) != 0:
        raise ValueError(
            f"sp*sc = {sp}*{sc} must divide the device count {n}")
    if sc > 1:
        arr = np.asarray(devices).reshape(n // (sp * sc), sp, sc)
        return Mesh(arr, axis_names=("px", "sp", "sc"))
    arr = np.asarray(devices).reshape(n // sp, sp)
    return Mesh(arr, axis_names=("px", "sp"))


def _padded_rows(height: int, n_px: int) -> int:
    return -(-height // n_px)


def sharded_batch_fn(static: SceneStatic, mesh: Mesh, use_dof: bool,
                     rows_inner: Optional[int] = None):
    """Build the jit'd sharded batch step.

    Returns f(scene, geom, cam, sample_batch) -> (image [H_pad, W, 3] sharded
    over rows, rays_traced scalar).

    `rows_inner` bounds rows per kernel dispatch WITHIN a shard (the same
    ~1M-ray tile budget as the single-chip Renderer): a shard's row block
    renders as ceil(rows_local/rows_inner) sequential dispatches, so one
    dispatch stays well under the device watchdog even at full
    resolution x 64 spp.
    """
    n_px = mesh.shape["px"]
    n_sp = mesh.shape["sp"]
    spp = static.sqrt_spp ** 2
    if spp % n_sp != 0:
        raise ValueError(f"effective spp {spp} must be divisible by sp={n_sp}")
    spp_local = spp // n_sp
    rows_local = _padded_rows(static.height, n_px)
    if rows_inner is None or rows_inner <= 0:
        rows_inner = rows_local
    rows_inner = min(rows_inner, rows_local)
    n_inner = -(-rows_local // rows_inner)

    def shard_body(scene, geom, cam, sample_batch):
        return _shard_tile_loop(static, scene, geom, cam, sample_batch,
                                use_dof, rows_local, rows_inner, n_inner,
                                spp, spp_local)

    mapped = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P("px", None, None), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def _shard_tile_loop(static, scene, geom, cam, sample_batch, use_dof,
                     rows_local, rows_inner, n_inner, spp, spp_local):
    """Per-shard tile loop shared by the replicated and scene-sharded
    steps: render this ('px','sp') shard's row block in n_inner
    dispatches, then psum sample partials over 'sp'.  Rays replicate
    over any 'sc' axis — psum only ('px','sp')."""
    from ..engine.wavefront import make_trace_fn

    px_rank = jax.lax.axis_index("px")
    sp_rank = jax.lax.axis_index("sp")
    row_base = (px_rank * rows_local).astype(jnp.int32)
    sample_base = (sp_rank * spp_local).astype(jnp.uint32)
    trace = make_trace_fn(static, scene, geom)
    tiles = []
    rays = jnp.float32(0.0)
    for i in range(n_inner):
        rows_i = min(rows_inner, rows_local - i * rows_inner)
        tile_i, rays_i = render_tile(
            static, scene, cam, trace, geom,
            sample_batch, row_base + i * rows_inner, rows_i, use_dof,
            spp_local=spp_local, sample_base=sample_base,
            reduce_mean=False,
        )
        tiles.append(tile_i)
        rays = rays + rays_i
    tile_sum = tiles[0] if n_inner == 1 else jnp.concatenate(tiles, 0)
    tile_sum = jax.lax.psum(tile_sum, "sp")
    rays = jax.lax.psum(rays, ("px", "sp"))
    return tile_sum / spp, rays


# ---------------------------------------------------------------- scene
# sharding ("sc" axis): primitive tables row-sharded across devices, for
# scenes too large to replicate per chip.  The bounce loop's collectives
# live in engine/wavefront (_sc_combine_hit / _sc_fetch).

#: per-primitive SceneArrays leaves sharded along "sc" (plus shade_rows,
#: rebuilt family-aware below)
_SC_SPH = ("sph_center", "sph_radius", "sph_inst", "sph_mat_type",
           "sph_mat_index")
_SC_TRI = ("tri_p", "tri_n", "tri_uv", "tri_inst", "tri_mat_type",
           "tri_mat_index")
_SC_SHARDED = _SC_SPH + _SC_TRI + ("shade_rows",)


def _pad_dup(a: np.ndarray, n: int) -> np.ndarray:
    """Pad dim0 to a multiple of n by DUPLICATING the last row: a
    duplicate primitive at a higher id never wins the strict-< closest-
    hit sweep, so the padding is provably inert for any fill content."""
    pad = -(-a.shape[0] // n) * n - a.shape[0]
    if pad == 0:
        return a
    return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)


def shard_scene_arrays(scene: SceneArrays, n_sc: int,
                       mesh: Optional[Mesh] = None) -> SceneArrays:
    """Replicated SceneArrays -> stacked [n_sc, local, ...] per-prim
    leaves (family-aware: shade_rows' [spheres | tris] block layout is
    rebuilt per shard so each shard's fat-row table matches its slices);
    all other leaves pass through replicated.  With a mesh, each stacked
    leaf is committed SHARDED over "sc" — a device holds only its slice,
    which is the point of scene sharding."""
    put = (lambda a: jnp.asarray(a)) if mesh is None else (
        lambda a: jax.device_put(a, NamedSharding(mesh, P("sc"))))
    np_of = lambda x: np.asarray(x)
    s_pad = np_of(scene.sph_center).shape[0]
    upd = {}
    for f in _SC_SPH + _SC_TRI:
        a = _pad_dup(np_of(getattr(scene, f)), n_sc)
        upd[f] = put(a.reshape((n_sc, -1) + a.shape[1:]))
    sr = np_of(scene.shade_rows)
    sph_rows = _pad_dup(sr[:s_pad], n_sc).reshape(n_sc, -1, sr.shape[1])
    tri_rows = _pad_dup(sr[s_pad:], n_sc).reshape(n_sc, -1, sr.shape[1])
    upd["shade_rows"] = put(np.concatenate([sph_rows, tri_rows], axis=1))
    return scene._replace(**upd)


def shard_sphere_tables(tables: np.ndarray, n_sc: int) -> np.ndarray:
    """[B, S, 5] world sphere tables -> [B, n_sc, S_local, 5]."""
    B, S = tables.shape[0], tables.shape[1]
    S2 = -(-S // n_sc) * n_sc
    out = np.empty((B, S2, tables.shape[2]), tables.dtype)
    for b in range(B):
        out[b] = _pad_dup(tables[b], n_sc)
    return out.reshape(B, n_sc, S2 // n_sc, tables.shape[2])


def scene_sharded_batch_fn(static: SceneStatic, mesh: Mesh, use_dof: bool,
                           rows_inner: Optional[int] = None):
    """Sharded batch step with SCENE sharding: per-prim scene leaves and
    the per-batch sphere table arrive stacked [n_sc, ...] with P("sc");
    prepare_batch runs on the local slice inside shard_map, so each chip
    holds and refits 1/n_sc of the geometry.  Rays replicate over "sc";
    the per-bounce closest-hit pmin + one-owner row psums reproduce the
    replicated render exactly (see wavefront._sc_combine_hit)."""
    n_sc = mesh.shape["sc"]
    assert static.scene_axis == "sc" and static.scene_shards == n_sc
    assert static.use_fat_shading, "scene sharding needs the fat-row ABI"
    assert static.bvh_mode == "none", "scene sharding shards the soup, not a BVH"
    assert not static.use_megakernel
    n_px = mesh.shape["px"]
    n_sp = mesh.shape["sp"]
    spp = static.sqrt_spp ** 2
    if spp % n_sp != 0:
        raise ValueError(f"effective spp {spp} must be divisible by sp={n_sp}")
    spp_local = spp // n_sp
    rows_local = _padded_rows(static.height, n_px)
    rows_inner = min(rows_inner or rows_local, rows_local)
    n_inner = -(-rows_local // rows_inner)

    def shard_body(scene_st, sph_tab, time, cam, sample_batch):
        scene = scene_st._replace(
            **{f: getattr(scene_st, f)[0] for f in _SC_SHARDED})
        tab = sph_tab[0] if static.sphere_world_mode else None
        geom = prepare_batch(static, scene, time, sph_table=tab)
        return _shard_tile_loop(static, scene, geom, cam, sample_batch,
                                use_dof, rows_local, rows_inner, n_inner,
                                spp, spp_local)

    scene_specs = SceneArrays(**{
        f: (P("sc") if f in _SC_SHARDED else P())
        for f in SceneArrays._fields})
    mapped = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(scene_specs, P("sc"), P(), P(), P()),
        out_specs=(P("px", None, None), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_chunk_fn(static: SceneStatic, mesh: Mesh, use_dof: bool,
                     k: int, q: int):
    """k-batch fused megakernel chunk, sharded like sharded_batch_fn.

    The single-chip fast path's two big wins (engine.renderer
    _cached_mega_chunk) ported to the mesh: (1) STATIC scenes fuse k
    progressive batches into ONE kernel call whose lanes stream
    k*spp_local samples each (the divergence tail amortizes over the
    chunk); animated scenes lax.scan k per-batch kernel calls; (2) each
    row shard keeps its own measured per-pixel cost history and
    re-deals its pixels to lanes with the snake-stratified assignment
    every chunk.

    f(scene, cam, accum, pix_perm, hist, batch0, times, sph_tabs) ->
      (accum', rays_per_batch [k], next_perm, hist')
    accum/hist/pix_perm are row-sharded over "px"; scene/cam replicated.
    """
    from ..engine.renderer import _snake_perm
    from ..ops.megakernel import render_tile_mega

    n_px = mesh.shape["px"]
    n_sp = mesh.shape["sp"]
    spp = static.sqrt_spp ** 2
    if spp % n_sp != 0:
        raise ValueError(f"effective spp {spp} must be divisible by sp={n_sp}")
    spp_local = spp // n_sp
    rows_local = _padded_rows(static.height, n_px)
    n_pix_local = rows_local * static.width
    n_lanes = -(-n_pix_local // (1024 * q)) * 1024

    def shard_body(scene, cam, accum, pix_perm, hist, batch0, times,
                   sph_tabs):
        px_rank = jax.lax.axis_index("px")
        sp_rank = jax.lax.axis_index("sp")
        row_base = (px_rank * rows_local).astype(jnp.int32)
        sample_base = (sp_rank * spp_local).astype(jnp.uint32)

        if not static.any_animated:
            geom = prepare_batch(
                static, scene, times[0],
                sph_table=sph_tabs[0] if static.sphere_world_mode else None,
            )
            sum_tiles, tr, traced_pix, _it = render_tile_mega(
                static, scene, geom, cam, batch0, row_base, rows_local,
                use_dof, spp_local=spp_local, sample_base=sample_base,
                reduce_mean=False, interpret=static.pallas_interpret,
                pix_perm=pix_perm, n_batches=k, q_pix=q,
            )
            trs = jnp.full((k,), tr / k, jnp.float32)
        else:
            def step(carry, inp):
                t, tab, _bi = inp
                geom = prepare_batch(
                    static, scene, t,
                    sph_table=tab if static.sphere_world_mode else None,
                )
                tile, tr, traced, _it = render_tile_mega(
                    static, scene, geom, cam, _bi, row_base, rows_local,
                    use_dof, spp_local=spp_local, sample_base=sample_base,
                    reduce_mean=False, interpret=static.pallas_interpret,
                    pix_perm=pix_perm, q_pix=q,
                )
                return carry + tile, (tr, traced)

            bids = batch0 + jnp.arange(k, dtype=jnp.int32)
            zero = jnp.zeros((rows_local, static.width, 3), jnp.float32)
            sum_tiles, (trs, traced_k) = jax.lax.scan(
                step, zero, (times, sph_tabs, bids))
            traced_pix = jnp.sum(traced_k, axis=0)

        sum_tiles = jax.lax.psum(sum_tiles, "sp")
        trs = jax.lax.psum(trs, ("px", "sp"))
        # Cost history: every sample of a pixel is traced on this row
        # shard (samples split over "sp"), so fold the sp-halves.
        traced_pix = jax.lax.psum(traced_pix, "sp")
        hist = hist + traced_pix
        next_perm = _snake_perm(hist, q, n_lanes)

        b0 = batch0.astype(jnp.float32)
        accum = (b0 * accum + sum_tiles / spp) / (b0 + k)
        return (accum, trs, next_perm, hist)

    mapped = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P("px"), P("px"), P("px"), P(), P(), P()),
        out_specs=(P("px"), P(), P("px"), P("px")),
        check_vma=False,
    )
    return jax.jit(mapped)


class MultiChipRenderer:
    """Progressive renderer sharded over a device mesh.

    Matches the single-chip Renderer's semantics and feature set — same
    RNG streams, same running-mean accumulation (a sharded render is
    bit-identical to the single-chip one up to float reduction order),
    same BVH construction, per-batch metrics, checkpoint/resume and PNG
    export, plus the single-chip ~1M-ray dispatch budget applied WITHIN
    each row shard.
    """

    def __init__(self, compiled, mesh: Optional[Mesh] = None,
                 camera_name: Optional[str] = None,
                 use_bvh="auto", leaf_size: int = 4,
                 metrics_jsonl: Optional[str] = None,
                 use_pallas_sweep: Optional[bool] = None,
                 kernel_options=None):
        import time as _time

        from ..engine.renderer import RenderStats, get_batch_ray_times
        from ..options import KernelOptions
        from ..utils.cache import enable_compilation_cache
        from ..utils.profiling import BatchMetrics

        enable_compilation_cache()
        self.kernel_options = (
            (kernel_options or KernelOptions()).with_env_overrides())
        self._time = _time
        self.compiled = compiled
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_sc = dict(self.mesh.shape).get("sc", 1)

        # Same BVH policy as the single-chip Renderer (renderer.py):
        # native SAH over the triangle soup for big meshes.  Scene
        # sharding shards the SOUP, not a BVH — brute-force/Pallas
        # sweeps only.
        bvh = None
        if use_bvh == "auto":
            use_bvh = compiled.num_triangles > 8192 and self.n_sc == 1
        if use_bvh and self.n_sc > 1:
            raise ValueError("scene sharding (sc > 1) does not support a BVH")
        if use_bvh and compiled.num_triangles > 0:
            from ..models.bvh_build import (build_bvh, build_bvh_sah,
                                            permute_soup)

            bvh = build_bvh_sah(compiled, leaf_max=8)
            if bvh is None:
                bvh = build_bvh(compiled, leaf_size=leaf_size)
            compiled = permute_soup(compiled, bvh)
            self.compiled = compiled
        self.bvh = bvh
        self.scene, self.static = upload_scene(compiled, bvh=bvh)
        self.batch_times = get_batch_ray_times(compiled.render.sample_batches)

        import dataclasses

        # Mirrors the single-chip Renderer: Pallas kernels default-on on
        # TPU; an explicit use_pallas_sweep=True on CPU runs them in
        # interpret mode (how tests exercise the sharded megakernel on
        # the virtual mesh).
        on_tpu = jax.default_backend() not in ("cpu",)
        use_pallas = use_pallas_sweep if use_pallas_sweep is not None else on_tpu
        self.static = dataclasses.replace(
            self.static, use_pallas_sweep=use_pallas,
            pallas_interpret=not on_tpu,
            kernel_options=self.kernel_options,
        )

        self.sphere_tables = None
        if self.static.has_spheres:
            from ..ops.spheres import world_sphere_tables

            self.sphere_tables = world_sphere_tables(compiled, self.batch_times)
            if self.sphere_tables is not None:
                self.static = dataclasses.replace(
                    self.static, sphere_world_mode=True
                )
            else:
                self.static = dataclasses.replace(
                    self.static, use_pallas_sweep=False
                )
        if self.static.use_pallas_sweep and self.n_sc == 1:
            from ..ops.megakernel import megakernel_supported

            if megakernel_supported(self.static):
                self.static = dataclasses.replace(
                    self.static, use_megakernel=True
                )
        if self.n_sc > 1:
            if not self.static.use_fat_shading:
                raise ValueError(
                    "scene sharding needs the fat-row ABI (shade_rows)")
            self.static = dataclasses.replace(
                self.static, scene_axis="sc", scene_shards=self.n_sc)
        self._use_dof_flag = None

        name = camera_name or compiled.render.camera
        if name not in compiled.cameras:
            raise KeyError(f"Camera {name} not found")
        self.camera = cam_ops.build_camera_arrays(
            compiled.cameras[name], self.static.width, self.static.height
        )
        use_dof = compiled.cameras[name].aperture_size > 0.0
        self._use_dof_flag = use_dof
        if self.n_sc == 1:
            # sc mode prepares INSIDE shard_map (prepare_batch calls
            # axis_index(scene_axis), illegal outside it).
            self._prepare = jax.jit(
                functools.partial(prepare_batch, self.static))

        # Single-chip dispatch budget (~1M rays) applied per shard.
        n_sp = self.mesh.shape["sp"]
        spp_local = max(1, self.static.sqrt_spp ** 2 // max(1, n_sp))
        ray_budget = (1 << 15) if self.bvh is not None else (1 << 20)
        rows_inner = max(1, ray_budget // (self.static.width * spp_local))
        if self.n_sc > 1:
            self._scene_stacked = shard_scene_arrays(
                self.scene, self.n_sc, mesh=self.mesh)
            if self.sphere_tables is not None:
                tabs = shard_sphere_tables(
                    np.asarray(self.sphere_tables), self.n_sc)
            else:
                B = len(self.batch_times)
                tabs = np.zeros((B, self.n_sc, 1, 5), np.float32)
            self._sph_tabs_sc = jax.device_put(
                tabs, NamedSharding(self.mesh, P(None, "sc")))
            # free the replicated per-prim device copies (the whole point
            # of sc mode is not holding the full scene per chip); the
            # stacked scene keeps the replicated non-prim leaves.
            tiny = {f: getattr(self.scene, f)[:1] for f in _SC_SHARDED}
            self.scene = self.scene._replace(**tiny)
            self._step = scene_sharded_batch_fn(
                self.static, self.mesh, use_dof, rows_inner=rows_inner)
        else:
            self._step = sharded_batch_fn(self.static, self.mesh, use_dof,
                                          rows_inner=rows_inner)

        # Fused k-batch chunk path (megakernel only): per-shard snake
        # cost assignment + chunked dispatch, the single-chip fast path
        # ported to the mesh.
        self._chunk_fns = {}
        self._mega_q = self.kernel_options.resolved_q()
        self._cost_perm = None
        self._traced_hist = None
        if self.static.use_megakernel:
            from ..engine.renderer import banded_pixel_perm

            n_px = self.mesh.shape["px"]
            rows_local = _padded_rows(self.static.height, n_px)
            local = banded_pixel_perm(
                rows_local, self.static.width, self._mega_q)
            perm0 = np.tile(local, n_px)
            sh = NamedSharding(self.mesh, P("px"))
            self._pix_perm = jax.device_put(perm0.astype(np.int32), sh)
            hist0 = np.zeros(
                (n_px * rows_local * self.static.width,), np.float32)
            self._traced_hist = jax.device_put(hist0, sh)
            self._times_dev = jnp.asarray(self.batch_times, jnp.float32)
            if self.sphere_tables is not None:
                self._sph_tables_dev = jnp.asarray(
                    self.sphere_tables, jnp.float32)
            else:
                B = len(self.batch_times)
                self._sph_tables_dev = jnp.zeros((B, 1, 5), jnp.float32)

        H, W = self.static.height, self.static.width
        self.accum = jnp.zeros((H, W, 3), jnp.float32)
        self.current_batch = 0
        self.rays_traced = 0.0
        self.stats = RenderStats()
        self.metrics = BatchMetrics(
            pixels=W * H, spp=self.static.sqrt_spp ** 2,
            jsonl_path=metrics_jsonl,
        )

    def render_next_batch(self) -> bool:
        if self.current_batch >= self.compiled.render.sample_batches:
            return False
        t0 = self._time.perf_counter()
        H = self.static.height
        if self.n_sc > 1:
            img_pad, rays = self._step(
                self._scene_stacked,
                self._sph_tabs_sc[self.current_batch],
                jnp.float32(self.batch_times[self.current_batch]),
                self.camera, jnp.int32(self.current_batch),
            )
        else:
            sph_table = (
                self.sphere_tables[self.current_batch]
                if self.sphere_tables is not None else None
            )
            geom = self._prepare(
                self.scene,
                jnp.float32(self.batch_times[self.current_batch]),
                sph_table=sph_table,
            )
            img_pad, rays = self._step(
                self.scene, geom, self.camera, jnp.int32(self.current_batch)
            )
        img = img_pad[:H]
        b = jnp.float32(self.current_batch)
        self.accum = (b * self.accum + img) / (b + 1.0)
        rays = float(rays)  # blocks until the batch finishes
        dt = self._time.perf_counter() - t0
        self.metrics.record(self.current_batch, dt, rays)
        self.rays_traced += rays
        self.current_batch += 1
        self.stats.batches_done += 1
        self.stats.rays_traced += rays
        self.stats.render_seconds += dt
        return True

    CHUNK = 12

    def chunk_size(self) -> int:
        spp = max(1, self.static.sqrt_spp ** 2)
        return max(1, min(self.CHUNK, 256 // spp))

    def render_batches(self, k: int) -> int:
        """Render up to k batches in ONE fused sharded device call
        (megakernel path; falls back to per-batch stepping otherwise)."""
        total = self.compiled.render.sample_batches
        k = min(k, total - self.current_batch)
        if k <= 0:
            return 0
        if not self.static.use_megakernel or k == 1:
            done = 0
            while done < k and self.render_next_batch():
                done += 1
            return done
        t0 = self._time.perf_counter()
        cur = self.current_batch
        if k not in self._chunk_fns:
            self._chunk_fns[k] = sharded_chunk_fn(
                self.static, self.mesh, self._use_dof_flag, k, self._mega_q)
        H = self.static.height
        n_px = self.mesh.shape["px"]
        rows_local = _padded_rows(H, n_px)
        pad = n_px * rows_local - H
        accum_pad = (jnp.concatenate(
            [self.accum, jnp.zeros((pad, self.static.width, 3), jnp.float32)],
            axis=0) if pad else self.accum)
        perm = self._cost_perm if self._cost_perm is not None else self._pix_perm
        accum_pad, trs, next_perm, hist = self._chunk_fns[k](
            self.scene, self.camera, accum_pad, perm, self._traced_hist,
            jnp.int32(cur), self._times_dev[cur:cur + k],
            self._sph_tables_dev[cur:cur + k],
        )
        self.accum = accum_pad[:H]
        self._cost_perm = next_perm
        self._traced_hist = hist
        trs = np.asarray(trs)  # blocks until the chunk finishes
        dt = self._time.perf_counter() - t0
        for i in range(k):
            self.metrics.record(cur + i, dt / k, float(trs[i]))
        self.current_batch += k
        self.rays_traced += float(trs.sum())
        self.stats.batches_done += k
        self.stats.rays_traced += float(trs.sum())
        self.stats.render_seconds += dt
        return k

    def render_all(self) -> np.ndarray:
        total = self.compiled.render.sample_batches
        while self.current_batch < total:
            if self.static.use_megakernel:
                self.render_batches(
                    min(self.chunk_size(), total - self.current_batch))
            elif not self.render_next_batch():
                break
        return np.asarray(self.accum)

    def image(self) -> np.ndarray:
        return np.asarray(self.accum)

    def save_png(self, path: str) -> None:
        from ..utils.image import write_png

        write_png(path, self.image())

    # ------------------------------------------------- checkpoint/resume
    # Same npz format as the single-chip Renderer: checkpoints written by
    # either renderer resume on the other.

    def save_checkpoint(self, path: str) -> None:
        np.savez(
            path,
            accum=self.image(),
            current_batch=self.current_batch,
            width=self.static.width,
            height=self.static.height,
        )

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        if (int(data["width"]), int(data["height"])) != (
            self.static.width, self.static.height,
        ):
            raise ValueError("Checkpoint resolution does not match scene")
        self.accum = jnp.asarray(data["accum"])
        self.current_batch = int(data["current_batch"])
