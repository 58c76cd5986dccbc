"""Lane-utilization diagnostic on the REAL bench path (Renderer defaults:
gather sweep, snake-stratified q-pixel perm, fused k-batch chunk) — unlike
mega_diag.py, which measures the selective/tile-perm configuration.

  DB_BATCHES=24 python tools_dev/diag_bench_util.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    k = int(os.environ.get("DB_BATCHES", "24"))
    scene_name = os.environ.get("DB_SCENE", "final-one-weekend.json")
    W = int(os.environ.get("DB_W", "1200"))
    H = int(os.environ.get("DB_H", "675"))

    from raytrace_tpu.engine import Renderer
    from raytrace_tpu.engine.wavefront import prepare_batch
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.ops import megakernel as mk
    from raytrace_tpu.scene_file import SceneFile

    path = f"/root/reference/assets/{scene_name}"
    sf = SceneFile.load_json(path)
    sf.render.sample_batches = max(sf.render.sample_batches, 2 * k)
    cs = compile_scene(sf, width=W, height=H)
    r = Renderer(cs)
    assert r.static.use_megakernel
    q = r._mega_q
    print(f"q={q} chunk k={k} items={r._mega_items}")

    # Warm chunk: populates the measured-cost history -> snake perm.
    r.render_batches(k)
    perm = r._cost_perm if r._cost_perm is not None else r._pix_perm

    geom = prepare_batch(
        r.static, r.scene, r._times_dev[k],
        sph_table=(r._sph_tables_dev[k] if r.static.sphere_world_mode
                   else None))

    f = jax.jit(lambda b, p: mk.render_tile_mega(
        r.static, r.scene, geom, r.camera, b, jnp.int32(0), H, r._use_dof,
        reduce_mean=False, pix_perm=p, n_batches=k, q_pix=q))
    tile, rays, traced_pix, iters = f(jnp.int32(k), perm)
    jax.block_until_ready(rays)

    t0 = time.time()
    tile, rays, traced_pix, iters = f(jnp.int32(k), perm)
    rays = float(rays)
    dt = time.time() - t0

    it = np.asarray(iters).reshape(-1, 1024)
    cell_iters = it[:, 0]
    wall = (cell_iters * 1024).sum()
    util = rays / wall
    print(f"dispatch {dt*1e3:.1f} ms | {rays/dt/1e6:.1f} M ray-bounces/s | "
          f"rays={rays/1e6:.2f}M")
    print(f"cells={it.shape[0]} wall-iters: mean={cell_iters.mean():.1f} "
          f"p50={np.percentile(cell_iters, 50):.0f} "
          f"p95={np.percentile(cell_iters, 95):.0f} "
          f"max={cell_iters.max():.0f} min={cell_iters.min():.0f}")
    print(f"lane util = {util:.3f}")
    print(f"per-iteration cost = {dt/cell_iters.sum()*1e6:.2f} us/cell-iter")
    print(f"ceiling at util=1: {rays/(dt*util)/1e6:.0f} M ray-bounces/s")

    # Per-lane work within each cell (from traced_pix gathered per lane):
    # reconstruct lane totals by summing each lane's q pixels' traced rays.
    perm_np = np.asarray(perm).reshape(-1, q, 8, 128)  # [cells][stratum][sub][lane]
    tp = np.asarray(traced_pix)
    n_items = tp.shape[0]
    padded = np.concatenate([tp, np.zeros(1, np.float32)])
    idx = np.minimum(perm_np, n_items)
    lane_work = padded[idx].sum(axis=1).reshape(-1, 1024)   # [cells, lanes]
    lw_max = lane_work.max(axis=1)
    lw_mean = lane_work.mean(axis=1)
    print(f"within-cell lane work: mean(max/mean)="
          f"{np.mean(lw_max/np.maximum(lw_mean,1)):.2f} "
          f"p95={np.percentile(lw_max/np.maximum(lw_mean,1),95):.2f}")
    # How much of the wall is the slowest lane vs scheduling overhead?
    print(f"sum(lane max)/wall-iters = {lw_max.sum()/cell_iters.sum():.3f} "
          f"(1.0 = wall fully explained by slowest-lane work)")


if __name__ == "__main__":
    main()
