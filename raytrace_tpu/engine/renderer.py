"""Renderer facade: progressive batched rendering with accumulation,
checkpoint/resume, metrics and PNG export.

Plays the role of the reference's Scene + RenderEngine (scene.rs:24-92,
render_engine.rs:422-571): each call to `render_next_batch` traces one
sample batch and folds it into the running mean; `render_all` drives every
batch.  The accumulation image lives in HBM between batches; resume state
(batch index + accumulation buffer) can be saved/loaded — an upgrade over
the reference, which loses progress on exit.
"""

from __future__ import annotations

import functools
import os
import time as _time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.compile import CompiledScene
from ..ops import camera as cam_ops
from ..utils.image import write_png
from .arrays import upload_scene

# The reference seeds its host RNG with this fixed value
# (render_engine.rs:116); we use it for the batch-time jitter stream.
HOST_SEED = 485_674_845_675_491


def get_batch_ray_times(sample_batches: int, seed: int = HOST_SEED) -> np.ndarray:
    """Jittered stratified shutter times over [0,1], biased around cell
    centers (render_engine.rs:700-710), drawn from the same ChaCha20
    stream the reference seeds at engine construction
    (render_engine.rs:116) — the times match the reference bitwise
    (tools/chacha.py replicates rand 0.9's stream + float conversion)."""
    from ..tools.chacha import ChaCha20Rng

    rng = ChaCha20Rng.seed_from_u64(seed)
    f = np.float32
    d = f(1.0) / f(sample_batches)
    out = []
    for i in range(sample_batches):
        t_center = (f(i) + f(0.5)) * d
        jitter = f(rng.f32_range(-0.5, 0.5))
        out.append(np.clip(t_center + jitter * d, f(0.0), f(1.0)))
    return np.asarray(out, np.float32)


def _spheres_world_capable(compiled) -> bool:
    """Cheap predicate for whether the world-space sphere path (and thus
    the megakernel) can run: every sphere instance's transform must be
    rigid + uniform scale at both keyframes (ops/spheres.
    world_sphere_tables returns None otherwise)."""
    n = compiled.num_spheres
    if n == 0:
        return True
    si = compiled.sph_inst[:n]
    for tt in (compiled.inst_t0, compiled.inst_t1):
        sc = tt[si, 7:10]
        if not np.allclose(sc, sc[:, :1], rtol=1e-5, atol=1e-7):
            return False
    return True


@functools.lru_cache(maxsize=64)
def _cached_prepare(static):
    from .wavefront import prepare_batch

    return jax.jit(functools.partial(prepare_batch, static))


@functools.lru_cache(maxsize=64)
def _cached_tile(static, rows_per_tile: int, use_dof: bool):
    from .wavefront import render_tile_step

    return jax.jit(functools.partial(
        render_tile_step, static, rows_per_tile=rows_per_tile, use_dof=use_dof
    ))


def tile_pixel_perm(height: int, width: int, tile: int = 32) -> np.ndarray:
    """Lane->pixel assignment enumerating the image in 32x32 tiles: one
    kernel cell (1024 lanes) = one spatial tile, so primary-ray frusta are
    tight and the cluster cull can skip most of the scene per cell."""
    ty = -(-height // tile)
    tx = -(-width // tile)
    ys = np.arange(ty * tile)
    xs = np.arange(tx * tile)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    pid = np.where((yy < height) & (xx < width), yy * width + xx,
                   height * width)
    blocks = pid.reshape(ty, tile, tx, tile).transpose(0, 2, 1, 3)
    return blocks.reshape(-1).astype(np.int32)


def banded_pixel_perm(height: int, width: int, q: int) -> np.ndarray:
    """Initial q-pixel lane->pixel assignment: each lane owns one pixel
    from each of q horizontal image bands (same in-band offset), laid out
    in the megakernel's [cell][stratum][lane] slot order.

    Before any measured cost exists, a lane's total cost averages across
    the q bands (sky rows are cheap, object rows expensive), which
    roughly equalizes lane totals — the no-prior version of the
    cost-stratified snake assignment (_snake_perm)."""
    n_pix = height * width
    n_lanes = -(-n_pix // (1024 * q)) * 1024
    n_cells = n_lanes // 1024
    s, c, l = np.meshgrid(np.arange(q), np.arange(n_cells),
                          np.arange(1024), indexing="ij")
    pix = s * n_lanes + c * 1024 + l                 # [q, cells, 1024]
    pix = np.where(pix < n_pix, pix, n_pix)
    return pix.transpose(1, 0, 2).reshape(-1).astype(np.int32)


@functools.lru_cache(maxsize=64)
def _cached_mega_chunk(static, use_dof: bool, k: int, q: int):
    """k progressive batches fused into ONE device call: per-batch geometry
    prepare, whole-frame megakernel render and the running-mean fold run in
    a lax.scan — host<->device round trips per batch drop from ~5 to 1/k
    (each call through the axon tunnel costs ~100 ms, measured)."""
    from ..ops.megakernel import render_tile_mega
    from .wavefront import prepare_batch

    def chunk(scene, cam, accum, pix_perm, hist, batch0, times, sph_tabs,
              anim_args=None):
        # Item mode (deferred image textures): pix_perm is None — items
        # cost ~the same, so lanes take the identity assignment and the
        # chunk needs no scatter back to item order (renderer __init__).
        deferred = bool(static.flags.has_image)
        n_lanes = 0 if deferred else pix_perm.shape[0] // q
        if not static.any_animated or static.anim_fuse:
            # Static scene: all k batches share geometry, so they fuse into
            # ONE kernel call whose lanes run k*spp samples each — the
            # divergence tail amortizes over the whole chunk.
            # anim_fuse: animated spheres share ONE endpoint+delta table
            # (the kernel lerps centers at each sample's batch time), so
            # the same fusion applies — the TPU answer to the
            # reference's per-batch TLAS refit (acceleration.rs:91-115).
            if static.anim_fuse:
                tab0, dtab, times_full = anim_args
                geom = prepare_batch(
                    static, scene, times[0], sph_table=tab0,
                    sph_dtab=dtab)
            else:
                times_full = None
                geom = prepare_batch(
                    static, scene, times[0],
                    sph_table=(sph_tabs[0] if static.sphere_world_mode
                               else None),
                )
            sum_tiles, tr, traced_pix, _it = render_tile_mega(
                static, scene, geom, cam, batch0, jnp.int32(0),
                static.height, use_dof, reduce_mean=False,
                interpret=static.pallas_interpret, pix_perm=pix_perm,
                n_batches=k, q_pix=q, times_row=times_full,
            )
            spp = static.sqrt_spp ** 2
            b0 = batch0.astype(jnp.float32)
            accum = (b0 * accum + sum_tiles / spp) / (b0 + k)
            # Cost prediction averages over ALL past chunks: per-sample
            # bounce counts are stochastic, so more history = stabler
            # ranks = tighter cells.
            hist = hist + traced_pix
            next_perm = (pix_perm if deferred
                         else _snake_perm(hist, q, n_lanes))
            return accum, jnp.full((k,), tr / k, jnp.float32), next_perm, hist

        def step(carry, inp):
            accum = carry
            t, tab, bi = inp
            geom = prepare_batch(
                static, scene, t,
                sph_table=tab if static.sphere_world_mode else None,
            )
            tile, tr, _traced, _it = render_tile_mega(
                static, scene, geom, cam, bi, jnp.int32(0), static.height,
                use_dof, interpret=static.pallas_interpret, pix_perm=pix_perm,
                q_pix=q,
            )
            bf = bi.astype(jnp.float32)
            accum = (bf * accum + tile) / (bf + 1.0)
            return accum, (tr, _traced)

        bids = batch0 + jnp.arange(k, dtype=jnp.int32)
        accum, (trs, traced) = jax.lax.scan(
            step, accum, (times, sph_tabs, bids))
        hist = hist + jnp.sum(traced, axis=0)
        next_perm = pix_perm if deferred else _snake_perm(hist, q, n_lanes)
        return accum, trs, next_perm, hist

    return jax.jit(chunk)


@functools.lru_cache(maxsize=64)
def _cached_mega_step(static, use_dof: bool, q: int):
    """Whole-frame megakernel batch step: one dispatch renders every pixel
    with a cost-stratified lane->pixel assignment (ops/megakernel.py)."""
    from ..ops.megakernel import render_tile_mega

    def step(scene, geom, cam, sample_batch, pix_perm, times_row=None):
        return render_tile_mega(
            static, scene, geom, cam, sample_batch, jnp.int32(0),
            static.height, use_dof, interpret=static.pallas_interpret,
            pix_perm=pix_perm, q_pix=q, times_row=times_row,
        )

    return jax.jit(step)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _snake_perm(traced_pix, q: int, n_lanes: int):
    """Snake-stratified q-pixel lane->pixel assignment from measured cost.

    Pixels sorted by the previous chunk's traced-ray count split into q
    strata of n_lanes; lane L takes stratum s's rank L (even s) or rank
    n_lanes-1-L (odd s), so every lane's TOTAL cost sums one draw from
    each stratum in opposing rank order — lane totals equalize even
    though next-chunk per-sample costs are stochastic (measured cross-
    chunk cell utilization 0.57 sorted 1-pixel lanes -> 0.80 at q=8).
    Output is in the megakernel's [cell][stratum][lane] slot order;
    padding slots carry the n_pix sentinel (dead, skipped in one
    iteration)."""
    n_pix = traced_pix.shape[0]
    order = jnp.argsort(-traced_pix).astype(jnp.int32)
    pad = q * n_lanes - n_pix
    order = jnp.concatenate([order, jnp.full((pad,), n_pix, jnp.int32)])
    strata = order.reshape(q, n_lanes)
    rows = [strata[s] if s % 2 == 0 else strata[s][::-1] for s in range(q)]
    strata = jnp.stack(rows)                          # [q, n_lanes]
    n_cells = n_lanes // 1024
    sc = strata.reshape(q, n_cells, 1024)
    # Anti-pair within-cell remap: a cell's 1024 slots hold a contiguous
    # run of global cost ranks, and slot p pairs with slot p+64 (same
    # sublane) in the kernel's balance="pair" candidate split — so give
    # positions (g, l) and (g, l+64) within-cell ranks k and 1023-k.
    # Pair cost SUMS then approach 2x the cell mean instead of 2x the
    # heavy member, which is what ceil((cA+cB)/2) rounds actually pay.
    # A pure permutation per cell: lane totals / stratum equalization
    # are untouched, and the image is assignment-invariant (per-pixel
    # RNG streams), so goldens/parity are unchanged.
    p = jnp.arange(1024)
    g, l = p // 128, p % 128
    idx = jnp.where(l < 64, g * 64 + l, 1023 - (g * 64 + (l - 64)))
    sc = sc[:, :, idx]
    return sc.transpose(1, 0, 2).reshape(-1)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _finish_batch(height, accum, tiles, ray_counts, b):
    img = jnp.concatenate(tiles, axis=0)[:height]
    bf = b.astype(jnp.float32)
    return (bf * accum + img) / (bf + 1.0), jnp.sum(jnp.stack(ray_counts))


@jax.jit
def _debug_scan(accum):
    """Per-batch validation reduction (one tiny fused kernel): non-finite
    count, negative count, max channel value over the accumulation."""
    finite = jnp.isfinite(accum)
    return (jnp.sum(~finite), jnp.sum(jnp.where(finite, accum, 0.0) < 0.0),
            jnp.max(jnp.where(finite, accum, 0.0)))


@dataclass
class DebugStats:
    """`debug=True` counters — the validation-layer analogue of the
    reference's Vulkan debug callback (bin/src/app.rs:317-369): instead of
    driver messages, every batch's accumulation is scanned for non-finite /
    negative / energy-violating radiance."""
    checks: int = 0
    nonfinite_values: int = 0
    negative_values: int = 0
    max_radiance: float = 0.0
    energy_bound: float = 0.0


class DebugValidationError(RuntimeError):
    pass


@dataclass
class RenderStats:
    batches_done: int = 0
    rays_traced: float = 0.0
    render_seconds: float = 0.0

    @property
    def mrays_per_sec(self) -> float:
        if self.render_seconds <= 0:
            return 0.0
        return self.rays_traced / self.render_seconds / 1e6


class Renderer:
    def __init__(
        self,
        compiled: CompiledScene,
        camera_name: Optional[str] = None,
        rows_per_tile: Optional[int] = None,
        trace_builder=None,
        use_bvh="auto",
        leaf_size: int = 4,
        metrics_jsonl: Optional[str] = None,
        use_pallas_sweep: Optional[bool] = None,
        kernel_options=None,
        debug: bool = False,
    ):
        from ..options import KernelOptions
        from ..utils.cache import enable_compilation_cache

        enable_compilation_cache()
        self.compiled = compiled
        # Kept so update_image_size can rebuild with identical options.
        self._ctor_kwargs = dict(
            camera_name=camera_name, trace_builder=trace_builder,
            use_bvh=use_bvh, leaf_size=leaf_size,
            metrics_jsonl=metrics_jsonl, use_pallas_sweep=use_pallas_sweep,
            kernel_options=kernel_options, debug=debug,
        )
        self.debug = debug
        self.kernel_options = (
            (kernel_options or KernelOptions()).with_env_overrides())
        bvh = None
        # BVH only pays for itself on big triangle sets (OBJ meshes, mesh-
        # parity mode); small soups are faster as a dense sweep, and the
        # analytic-sphere path needs no structure at all.
        if use_bvh == "auto":
            # The megakernel's tri-gather sweep covers clustered scenes up
            # to its 128x128 gather-table gate (16,384 tris) — but only
            # when the megakernel will actually run.  On CPU (Pallas off)
            # or when the scene fails the megakernel's other gates, scenes
            # in the 8,193-16,384 range must keep the BVH: the dense O(T)
            # wavefront sweep there is a large regression (ADVICE r4).
            on_tpu_ = jax.default_backend() not in ("cpu",)
            pallas_p = (use_pallas_sweep if use_pallas_sweep is not None
                        else on_tpu_)
            tri_fast_max = 8192
            if (getattr(compiled, "tri_cluster_g", 0) and pallas_p
                    and trace_builder is None
                    and compiled.atlas.size == 0           # no image tex
                    and compiled.num_spheres <= 16384
                    and not (compiled.light_count > 0
                             and compiled.num_instances > 64)
                    and _spheres_world_capable(compiled)):
                tri_fast_max = 16384
            use_bvh = compiled.num_triangles > tri_fast_max
            # Big meshes on TPU: the paged cluster sweep (pages of
            # 128x128 Morton-ordered clusters streamed through VMEM)
            # replaces the SAH BVH — the performant counterpart of the
            # reference's driver BLAS over large meshes
            # (acceleration.rs:268-294): ~67 Mrays/s at 100k triangles
            # vs the XLA SAH traversal's ~0.01 at 2M.
            if use_bvh and pallas_p and trace_builder is None:
                use_bvh = "paged"
        self._paged_tris = use_bvh == "paged" and compiled.num_triangles > 0
        if self._paged_tris:
            import types

            from ..models.bvh_build import permute_soup
            from ..ops.pallas_paged_tri import paged_tri_order, world_soup_mid

            order = paged_tri_order(
                world_soup_mid(compiled), compiled.num_triangles)
            T = compiled.tri_p.shape[0]
            full = np.concatenate(
                [order, np.arange(compiled.num_triangles, T)])
            compiled = permute_soup(
                compiled, types.SimpleNamespace(order=full))
            self.compiled = compiled
            use_bvh = False
        if use_bvh and compiled.num_triangles > 0:
            from ..models.bvh_build import build_bvh, build_bvh_sah, permute_soup

            # Prefer the native binned-SAH builder (far better tree quality
            # than the Morton/implicit fallback).
            bvh = build_bvh_sah(compiled, leaf_max=8)
            if bvh is None:
                bvh = build_bvh(compiled, leaf_size=leaf_size)
            compiled = permute_soup(compiled, bvh)
            self.compiled = compiled
        self.bvh = bvh
        self.scene, self.static = upload_scene(compiled, bvh=bvh)

        self.batch_times = get_batch_ray_times(compiled.render.sample_batches)

        import dataclasses

        # Fused Pallas sweeps: on by default on TPU, interpret mode on CPU
        # only when explicitly requested (tests).
        on_tpu = jax.default_backend() not in ("cpu",)
        use_pallas = use_pallas_sweep if use_pallas_sweep is not None else on_tpu
        self.static = dataclasses.replace(
            self.static,
            use_pallas_sweep=use_pallas,
            pallas_interpret=not on_tpu,
            kernel_options=self.kernel_options,
        )
        self._paged_tabs_dev = None
        if self._paged_tris:
            self.static = dataclasses.replace(self.static, bvh_mode="paged")
            if not compiled.any_animated:
                # Static scene: build the page tables ONCE on the host
                # (numpy) — the layout transpose of a 2M-triangle table
                # costs seconds as a strided device transpose per
                # dispatch, milliseconds as a host copy at init.
                from ..ops.pallas_paged_tri import (build_page_tables,
                                                    world_soup_mid)

                wp = world_soup_mid(compiled).astype(np.float32)
                pg, psv = build_page_tables(
                    wp, compiled.num_triangles, xp=np)
                self._paged_tabs_dev = (jax.device_put(pg),
                                        jax.device_put(psv))

        self._use_megakernel_pref = use_pallas
        # World-space sphere tables per batch time (host f64 -> f32); None
        # when a sphere instance has non-uniform scale (ellipsoid path).
        self.sphere_tables = None
        if self.static.has_spheres:
            from ..ops.spheres import world_sphere_tables

            self.sphere_tables = world_sphere_tables(compiled, self.batch_times)
            if self.sphere_tables is not None:
                self.static = dataclasses.replace(
                    self.static, sphere_world_mode=True
                )
            else:
                # Object-space sphere path has no Pallas kernel yet.
                self.static = dataclasses.replace(
                    self.static, use_pallas_sweep=False
                )
        name = camera_name or compiled.render.camera
        if name not in compiled.cameras:
            raise KeyError(f"Camera {name} not found")
        # Whole-bounce-loop megakernel: the fast path on TPU whenever the
        # scene fits its static gate (ops/megakernel.megakernel_supported).
        if self._use_megakernel_pref and trace_builder is None:
            from ..ops.megakernel import (camera_outside_spheres,
                                          deferred_image_supported,
                                          megakernel_supported)

            if megakernel_supported(self.static) or (
                    deferred_image_supported(self.static)
                    # The single-texel factorization is exact only for
                    # paths that see the image sphere at most once; a
                    # camera INSIDE the sphere re-hits the interior every
                    # bounce, so such scenes fall back to the wavefront.
                    and camera_outside_spheres(
                        self.sphere_tables, compiled.cameras[name].eye)):
                self.static = dataclasses.replace(
                    self.static, use_megakernel=True
                )
        # Fused animated megakernel (SceneStatic.anim_fuse): sphere-only
        # LINEAR motion lets the kernel lerp world centers in-flight from
        # one endpoint+delta table pair, so animated scenes fuse k
        # batches into one kernel call exactly like static scenes
        # (ops/spheres.world_sphere_anim_tables verifies linearity /
        # constant radii and returns None otherwise).  Gated to the
        # megakernel sphere-only regime: no tris (_SLOT_DC shares fat-row
        # slots with _SLOT_TRIN), no lights (per-batch o2w would be
        # needed for NEE), no image textures (item mode flushes once per
        # slot).
        self._anim_tabs = None
        if (self.static.use_megakernel and self.static.any_animated
                and self.static.sphere_world_mode
                and not self.static.has_tris
                and not self.static.has_lights
                and not self.static.flags.has_image):
            from ..ops.spheres import world_sphere_anim_tables

            at = world_sphere_anim_tables(compiled)
            if at is not None:
                self._anim_tabs = (jnp.asarray(at[0]), jnp.asarray(at[1]))
                self.static = dataclasses.replace(
                    self.static, anim_fuse=True)
        self.camera = cam_ops.build_camera_arrays(
            compiled.cameras[name], self.static.width, self.static.height
        )

        if rows_per_tile is None:
            # Budget ~1M rays per tile: big enough to saturate the chip and
            # amortize dispatch overhead, small enough that one dispatch
            # stays well under any device watchdog.  Balance the tile count
            # so the last tile isn't mostly padding (675 rows / budget 218
            # would otherwise render a 4th tile that is 90% waste).
            # BVH traversal is ~30x slower per ray (gather-bound), so its
            # budget shrinks accordingly — a whole-frame dispatch on a 2M-
            # triangle scene crashed the TPU worker (watchdog).
            H = self.static.height
            spp = max(1, self.static.sqrt_spp ** 2)
            ray_budget = (1 << 15) if self.bvh is not None else (1 << 20)
            if self._paged_tris:
                # Paged tri sweep: pages stream once per dispatch, so
                # bigger dispatches amortize table traffic; the kernel's
                # best-hit scratch caps one dispatch at 512 ray blocks.
                ray_budget = 1 << 19
            budget = max(1, ray_budget // (self.static.width * spp))
            n_tiles = max(1, -(-H // budget))
            rows_per_tile = -(-H // n_tiles)
        self.rows_per_tile = min(rows_per_tile, self.static.height)

        use_dof = compiled.cameras[name].aperture_size > 0.0
        # Megakernel fast path: one whole-frame dispatch per batch with a
        # cost-sorted pixel permutation (divergence tail fix).
        self._mega_step = None
        self._pix_perm = None
        self._cost_perm = None
        self._traced_hist = None
        self._use_dof = use_dof
        self._mega_items = 1
        if self.static.use_megakernel:
            use_sel = (self.static.sph_prefix > 0
                       and self.kernel_options.sweep == "selective")
            self._mega_q = self.kernel_options.resolved_q()
            if self.static.flags.has_image:
                # Deferred-image item mode (megakernel.
                # deferred_image_supported): one lane slot per
                # (pixel, sample) item so the texel post-pass can scale
                # samples individually; per-batch steps use K=spp
                # items/pixel.  Items cost ~the same (single convex
                # sphere, ~2 segments each), so lanes use the IDENTITY
                # assignment — measured cell utilization 0.87-0.90
                # without any permutation, and dropping the perm removes
                # a 3-component scatter over every item from the chunk
                # (the round-3 earth bottleneck).  q=8: past 8 the
                # per-stratum flush writes dominate the uniform-cost
                # tail they'd be hiding.
                self._mega_items = self.static.sqrt_spp ** 2
                if self.kernel_options.q_pix is None:
                    self._mega_q = 8
            if self._mega_items > 1:
                self._pix_perm = None
            elif use_sel:
                # Selective sweep wants per-cell frustum coherence
                # (single-pixel lanes, 32x32 spatial tiles).
                self._pix_perm = jnp.asarray(tile_pixel_perm(
                    self.static.height, self.static.width))
            else:
                # Dense/gather sweep (default): q-pixel lanes with band-
                # averaged initial assignment, snake-stratified after
                # chunk 1.
                self._pix_perm = jnp.asarray(banded_pixel_perm(
                    self.static.height, self.static.width, self._mega_q))
            self._mega_step = _cached_mega_step(
                self.static, use_dof, self._mega_q)
            self._traced_hist = jnp.zeros(
                (self.static.height * self.static.width,), jnp.float32)
            self._times_dev = jnp.asarray(self.batch_times, jnp.float32)
            if self.sphere_tables is not None:
                self._sph_tables_dev = jnp.asarray(
                    self.sphere_tables, jnp.float32)
            else:
                B = len(self.batch_times)
                self._sph_tables_dev = jnp.zeros((B, 1, 5), jnp.float32)
        if trace_builder is None:
            # Module-level executable cache: a new Renderer for the same
            # (scene-static, tiling) reuses compiled programs instead of
            # re-tracing (compiles run 1-5 min on TPU via the remote
            # helper; tests build many Renderers).
            self._prepare = _cached_prepare(self.static)
            self._tile = _cached_tile(self.static, self.rows_per_tile, use_dof)
        else:
            from .wavefront import prepare_batch, render_tile_step

            self._prepare = jax.jit(functools.partial(prepare_batch, self.static))
            self._tile = jax.jit(
                functools.partial(
                    render_tile_step, self.static,
                    rows_per_tile=self.rows_per_tile, use_dof=use_dof,
                    trace_builder=trace_builder,
                )
            )
        self._finish = functools.partial(_finish_batch, self.static.height)

        self.accum = jnp.zeros(
            (self.static.height, self.static.width, 3), jnp.float32
        )
        self.current_batch = 0
        # Runtime-adjustable (traced, never recompiles).
        self.max_depth = compiled.render.max_ray_depth
        self.stats = RenderStats()
        self.debug_stats = None
        if debug:
            # Loose per-path radiance ceiling: every additive term is a
            # product of albedos (<=1 each) times one emission (or the
            # sky, <=1), and NEE adds at most one light term per bounce —
            # so a sample can't exceed emax * (depth + 2) without a bug
            # (zero-pdf blowup, un-guarded 0/0, ...).
            emax = max(1.0, float(compiled.const_colours.max()))
            self.debug_stats = DebugStats(
                energy_bound=emax * (self.max_depth + 2))
        from ..utils.profiling import BatchMetrics

        self.metrics = BatchMetrics(
            pixels=self.static.width * self.static.height,
            spp=self.static.sqrt_spp ** 2,
            jsonl_path=metrics_jsonl,
        )

    # ------------------------------------------------------------- debug

    def _debug_check(self, batch: int) -> None:
        """debug=True: validate the accumulation after a batch (finite,
        non-negative, energy-bounded) — raises DebugValidationError with
        the batch index on the first violation."""
        if self.debug_stats is None:
            return
        nonf, neg, mx = _debug_scan(self.accum)
        st = self.debug_stats
        st.checks += 1
        st.nonfinite_values += int(nonf)
        st.negative_values += int(neg)
        st.max_radiance = max(st.max_radiance, float(mx))
        if int(nonf) or int(neg):
            raise DebugValidationError(
                f"batch {batch}: {int(nonf)} non-finite / {int(neg)} "
                f"negative accumulation values")
        if float(mx) > st.energy_bound:
            raise DebugValidationError(
                f"batch {batch}: radiance {float(mx):.3g} exceeds energy "
                f"bound {st.energy_bound:.3g}")

    # ------------------------------------------------------------- steps

    def render_next_batch(self) -> bool:
        """Trace one sample batch; returns False when all batches are done
        (render_engine.rs:464-466 semantics)."""
        if self.current_batch >= self.compiled.render.sample_batches:
            return False
        t0 = _time.perf_counter()
        H, W = self.static.height, self.static.width
        sph_table = (
            self.sphere_tables[self.current_batch]
            if self.sphere_tables is not None else None
        )
        # A non-default max_depth is passed traced (no recompile on the XLA
        # path); the default passes None so the megakernel path can
        # specialize its in-kernel loop bound.
        md = (None if self.max_depth == self.static.max_ray_depth
              else jnp.int32(self.max_depth))
        sph_dtab = None
        if self.static.anim_fuse and self._mega_step is not None and md is None:
            # fused-anim kernel: geometry is the endpoint-0 table +
            # motion deltas; the kernel lerps at the batch time.  (The
            # wavefront fallback below keeps the true per-batch table.)
            sph_table, sph_dtab = self._anim_tabs
        geom = self._prepare(
            self.scene, jnp.float32(self.batch_times[self.current_batch]),
            sph_table=sph_table, sph_dtab=sph_dtab,
            paged_tabs=self._paged_tabs_dev,
        )
        if self._mega_step is not None and md is None:
            tile, tr, _traced, _it = self._mega_step(
                self.scene, geom, self.camera,
                jnp.int32(self.current_batch),
                self._cost_perm if self._cost_perm is not None
                else self._pix_perm,
                times_row=(self._times_dev if self.static.anim_fuse
                           else None),
            )
            tiles, ray_counts = [tile], [tr]
        else:
            tiles, ray_counts = [], []
            for row0 in range(0, H, self.rows_per_tile):
                tile, tr = self._tile(
                    self.scene, geom, self.camera,
                    jnp.int32(self.current_batch), jnp.int32(row0),
                    max_depth=md,
                )
                tiles.append(tile)
                ray_counts.append(tr)
        self.accum, rays_dev = self._finish(
            self.accum, tiles, ray_counts, jnp.int32(self.current_batch)
        )
        rays = float(rays_dev)  # blocks until the batch finishes
        self._debug_check(self.current_batch)
        dt = _time.perf_counter() - t0
        self.metrics.record(self.current_batch, dt, rays)
        self.current_batch += 1
        self.stats.batches_done += 1
        self.stats.rays_traced += rays
        self.stats.render_seconds += dt
        return True

    def render_batches(self, k: int) -> int:
        """Render up to k batches in ONE fused device call (megakernel path;
        falls back to per-batch stepping otherwise).  Returns the number of
        batches actually rendered."""
        total = self.compiled.render.sample_batches
        k = min(k, total - self.current_batch)
        if k <= 0:
            return 0
        if (self._mega_step is None or k == 1
                or self.max_depth != self.static.max_ray_depth):
            done = 0
            while done < k and self.render_next_batch():
                done += 1
            return done
        t0 = _time.perf_counter()
        cur = self.current_batch
        chunk_fn = _cached_mega_chunk(
            self.static, self._use_dof, k, self._mega_q)
        if self._mega_items > 1:
            perm = None          # identity item assignment (see __init__)
        else:
            perm = (self._cost_perm if self._cost_perm is not None
                    else self._pix_perm)
        anim_args = None
        if self.static.anim_fuse:
            anim_args = (self._anim_tabs[0], self._anim_tabs[1],
                         self._times_dev)
        accum, trs, next_perm, hist = chunk_fn(
            self.scene, self.camera, self.accum, perm, self._traced_hist,
            jnp.int32(cur), self._times_dev[cur:cur + k],
            self._sph_tables_dev[cur:cur + k],
            anim_args,
        )
        self.accum = accum
        self._traced_hist = hist
        # Next chunk's lanes are grouped by this chunk's measured pixel
        # cost (the perm is computed inside the fused chunk — no extra
        # dispatch round trip through the device tunnel).
        if self._mega_items == 1:
            self._cost_perm = next_perm
        trs = np.asarray(trs)  # blocks until the chunk finishes
        self._debug_check(cur + k - 1)
        dt = _time.perf_counter() - t0
        for i in range(k):
            self.metrics.record(cur + i, dt / k, float(trs[i]))
        self.current_batch += k
        self.stats.batches_done += k
        self.stats.rays_traced += float(trs.sum())
        self.stats.render_seconds += dt
        return k

    # Fused batches per device call on the megakernel path: big enough to
    # amortize the ~100 ms/call tunnel cost AND the per-lane divergence
    # tail (static scenes fuse k batches into one sample stream), small
    # enough that a dispatch stays far from the device watchdog.
    CHUNK = 12
    # Item-mode lane budget: deferred-image chunks put every
    # (pixel, sample) item on its own lane.  The post-pass is now one
    # flat texel gather on the kernel-recorded index (~16 B/item live),
    # so the bound is the kernel's own 6 q-block output buffers
    # (~24 B/item) — 8M items stays under ~200 MB.  (The former 2M cap
    # guarded the re-trace factor's ~24 GB of trace intermediates.)
    ITEM_BUDGET = 1 << 23

    def chunk_size(self) -> int:
        spp = max(1, self.static.sqrt_spp ** 2)
        k = max(1, min(self.CHUNK, 256 // spp))
        if self._mega_items > 1 and not self.static.any_animated:
            per_batch = self.static.height * self.static.width * spp
            k = max(1, min(k, self.ITEM_BUDGET // per_batch))
        return k

    def render_all(self, progress=None) -> np.ndarray:
        total = self.compiled.render.sample_batches
        while self.current_batch < total:
            if self._mega_step is not None:
                self.render_batches(
                    min(self.chunk_size(), total - self.current_batch))
            elif not self.render_next_batch():
                break
            if progress is not None:
                progress(self.current_batch, total)
        return self.image()

    def image(self) -> np.ndarray:
        """Current linear-light accumulation image [H,W,3]."""
        return np.asarray(self.accum)

    def save_png(self, path: str) -> None:
        write_png(path, self.image())

    # -------------------------------------------------------- checkpoints

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

    # ------------------------------------------------------------- resize

    def update_image_size(self, width: int, height: int) -> "Renderer":
        """Resize restarts progressive accumulation (render_engine.rs:397-414).
        Returns a NEW renderer compiled for the new resolution, preserving
        every constructor option of this one."""
        import dataclasses

        cs = dataclasses.replace(
            self.compiled,
            render=dataclasses.replace(self.compiled.render, width=width, height=height),
        )
        return Renderer(cs, rows_per_tile=None, **self._ctor_kwargs)
