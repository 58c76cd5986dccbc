"""Bisect the q=32-snake vs q=1-identity per-iteration cost gap."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

import json
CONFIGS = json.loads(os.environ.get("DQ_CONFIGS", '[]')) or [
    ("q32-snake", {"MEGA_Q": "32"}, True),
]

def main():
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.scene_file import SceneFile
    from raytrace_tpu.engine import Renderer
    from raytrace_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    sf = SceneFile.load_json("/root/reference/assets/final-one-weekend.json")
    sf.render.sample_batches = 32
    cs = compile_scene(sf, width=1200, height=675)
    base_env = dict(os.environ)
    for tag, env, snake in CONFIGS:
        os.environ.update({"MEGA_Q": "32", "MEGA_G": "4", "MEGA_UNROLL": "16",
                           "MEGA_ABLATE": ""})
        os.environ.update(env)
        r = Renderer(cs)
        if snake:
            r.render_batches(12)
        perm = r._cost_perm if (snake and r._cost_perm is not None) else r._pix_perm
        def once():
            geom = r._prepare(r.scene, jnp.float32(r.batch_times[0]),
                sph_table=r.sphere_tables[0] if r.sphere_tables is not None else None)
            return r._mega_step(r.scene, geom, r.camera, jnp.int32(24), perm)
        tile, tr, tp, iters = once()
        jax.block_until_ready(tr)
        t0 = time.time()
        tile, tr, tp, iters = once()
        rays = float(tr); dt = time.time() - t0
        it = np.asarray(iters).reshape(-1, 1024)[:, 0].astype(np.float64)
        print(f"{tag:22s} {dt*1e3:7.1f} ms | {rays/dt/1e6:6.1f} M r-b/s | "
              f"util={rays/(it.sum()*1024):.3f} | {dt/it.sum()*1e6:5.2f} us/cell-iter",
              flush=True)

if __name__ == "__main__":
    main()
