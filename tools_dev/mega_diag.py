"""Divergence diagnostics for the megakernel on the REAL bench config:
whole-frame dispatch, 32x32 tile pixel permutation, fused batches.

Reports per-cell wall iterations vs per-lane active iterations =
lane utilization, the direct measure of the divergence tail.

  MD_BATCHES=12 MD_SEL=1 python tools_dev/mega_diag.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_batches = int(os.environ.get("MD_BATCHES", "12"))
    os.environ["MEGA_SEL"] = os.environ.get("MD_SEL", "1")
    scene_name = os.environ.get("MD_SCENE", "final-one-weekend.json")
    W = int(os.environ.get("MD_W", "1200"))
    H = int(os.environ.get("MD_H", "675"))

    from raytrace_tpu.engine.arrays import upload_scene
    from raytrace_tpu.engine.renderer import tile_pixel_perm
    from raytrace_tpu.engine.wavefront import prepare_batch
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.ops import megakernel as mk
    from raytrace_tpu.ops.camera import build_camera_arrays
    from raytrace_tpu.ops.spheres import world_sphere_tables
    from raytrace_tpu.scene_file import SceneFile

    sf = SceneFile.load_json(f"/root/reference/assets/{scene_name}")
    cs = compile_scene(sf, width=W, height=H)
    scene, static = upload_scene(cs)
    static = dataclasses.replace(static, use_pallas_sweep=True,
                                 sphere_world_mode=True)
    tables = world_sphere_tables(cs, np.array([0.5], np.float32))
    cam = build_camera_arrays(cs.cameras[cs.render.camera], W, H)
    geom = prepare_batch(static, scene, jnp.float32(0.5),
                         sph_table=tables[0])
    use_dof = cs.cameras[cs.render.camera].aperture_size > 0.0
    perm = jnp.asarray(tile_pixel_perm(H, W))

    f = jax.jit(lambda b: mk.render_tile_mega(
        static, scene, geom, cam, b, jnp.int32(0), H, use_dof,
        reduce_mean=False, pix_perm=perm, n_batches=n_batches))
    tile, rays, traced_pix, iters = f(jnp.int32(0))
    jax.block_until_ready(rays)

    t0 = time.time()
    tile, rays, traced_pix, iters = f(jnp.int32(0))
    rays = float(rays)
    dt = time.time() - t0

    it = np.asarray(iters).reshape(-1, 1024)      # [cells, lanes]
    tr_lane = np.asarray(jax.device_get(traced_pix))
    cell_iters = it[:, 0]
    wall = (cell_iters * 1024).sum()
    util = rays / wall
    print(f"dispatch {dt*1e3:.1f} ms | {rays/dt/1e6:.1f} M ray-bounces/s | "
          f"rays={rays/1e6:.2f}M")
    print(f"cells={it.shape[0]} wall-iters: mean={cell_iters.mean():.1f} "
          f"p50={np.percentile(cell_iters,50):.0f} "
          f"p95={np.percentile(cell_iters,95):.0f} "
          f"max={cell_iters.max():.0f}")
    print(f"lane util = {util:.3f}  (active lane-iters / wall lane-iters)")
    print(f"per-iteration cost = {dt/cell_iters.sum()*1e9:.1f} ns/cell-iter "
          f"({dt/cell_iters.sum()/1024*1e12:.1f} ps/lane-slot)")
    # what the same dispatch would cost at 100% utilization
    print(f"ceiling at util=1: {rays/(dt*util)/1e6:.0f} M ray-bounces/s")


if __name__ == "__main__":
    main()
