"""Diagnose the HEADLINE path: renderer-built snake perm + q=32 lanes.
Measures utilization and us/cell-iter for a whole-frame single-batch
dispatch using the cost perm the fused-chunk path produces."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def main():
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.scene_file import SceneFile
    from raytrace_tpu.engine import Renderer
    from raytrace_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    sf = SceneFile.load_json("/root/reference/assets/final-one-weekend.json")
    sf.render.sample_batches = 32
    cs = compile_scene(sf, width=1200, height=675)
    r = Renderer(cs)
    r.render_batches(12)          # chunk 1: builds cost history + perm
    r.render_batches(12)          # chunk 2: warm, snake perm active

    perm = r._cost_perm if r._cost_perm is not None else r._pix_perm
    step = r._mega_step
    tile, tr, tp, iters = step(r.scene,
        r._prepare(r.scene, jnp.float32(r.batch_times[0]),
                   sph_table=r.sphere_tables[0] if r.sphere_tables is not None else None),
        r.camera, jnp.int32(24), perm)
    jax.block_until_ready(tr)
    t0 = time.time()
    tile, tr, tp, iters = step(r.scene,
        r._prepare(r.scene, jnp.float32(r.batch_times[0]),
                   sph_table=r.sphere_tables[0] if r.sphere_tables is not None else None),
        r.camera, jnp.int32(24), perm)
    rays = float(tr); dt = time.time() - t0
    it = np.asarray(iters).reshape(-1, 1024)
    cell_iters = it[:, 0].astype(np.float64)
    wall = (cell_iters * 1024).sum()
    print(f"q={r._mega_q} cells={it.shape[0]} dispatch {dt*1e3:.1f} ms | "
          f"{rays/dt/1e6:.1f} M ray-bounces/s")
    print(f"util={rays/wall:.3f} | {dt/cell_iters.sum()*1e6:.2f} us/cell-iter | "
          f"wall iters p50={np.percentile(cell_iters,50):.0f} max={cell_iters.max():.0f}")

if __name__ == "__main__":
    main()
