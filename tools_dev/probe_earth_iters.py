"""Direct render_tile_mega timing on earth (item mode): us/cell-iter.

  EI_Q=32 EI_BATCHES=8 python tools_dev/probe_earth_iters.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from raytrace_tpu.engine.arrays import upload_scene
    from raytrace_tpu.engine.wavefront import prepare_batch
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.ops import megakernel as mk
    from raytrace_tpu.ops.camera import build_camera_arrays
    from raytrace_tpu.ops.spheres import world_sphere_tables
    from raytrace_tpu.scene_file import SceneFile
    from raytrace_tpu.utils.cache import enable_compilation_cache
    import dataclasses

    enable_compilation_cache()
    q = int(os.environ.get("EI_Q", "32"))
    n_batches = int(os.environ.get("EI_BATCHES", "8"))

    sf = SceneFile.load_json("/root/reference/assets/earth.json")
    cs = compile_scene(sf)
    scene, static = upload_scene(cs)
    static = dataclasses.replace(static, use_pallas_sweep=True,
                                 sphere_world_mode=True)
    W, H = static.width, static.height
    tables = world_sphere_tables(cs, np.array([0.5], np.float32))
    cam = build_camera_arrays(cs.cameras[cs.render.camera], W, H)
    geom = prepare_batch(static, scene, jnp.float32(0.5),
                         sph_table=tables[0] if tables is not None else None)
    use_dof = cs.cameras[cs.render.camera].aperture_size > 0.0

    f = jax.jit(lambda: mk.render_tile_mega(
        static, scene, geom, cam, jnp.int32(0), jnp.int32(0), H, use_dof,
        n_batches=n_batches, q_pix=q))
    t0 = time.time()
    tile, rays, tp, iters = f()
    jax.block_until_ready(rays)
    print(f"compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    tile, rays, tp, iters = f()
    jax.block_until_ready(rays)
    dt = time.time() - t0
    it = np.asarray(iters).reshape(-1, 1024)[:, 0].astype(np.float64)
    n_cells = it.shape[0]
    spp = static.sqrt_spp ** 2
    n_items = W * H * spp * n_batches
    print(f"q={q} k={n_batches}: {dt*1e3:.1f} ms | cells {n_cells} "
          f"| iters/cell {it.mean():.1f} | {dt/it.sum()*1e6:.2f} us/cell-iter "
          f"| rays {float(rays)/1e6:.1f}M | {float(rays)/dt/1e6:.1f} Mrays/s "
          f"| util {float(rays)/(it.sum()*1024):.3f} "
          f"| mean {float(np.asarray(tile).mean()):.4f}", flush=True)


if __name__ == "__main__":
    main()
