"""Per-stage cost breakdown on the real bench path: one process runs the
bench-config chunk once per ablation tag (same snake perm, same geometry),
so stage deltas are directly comparable.

  DB_TAGS="norounds,norows" DB_BATCHES=8 python tools_dev/diag_ablate.py
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
    k = int(os.environ.get("DB_BATCHES", "8"))
    scene_name = os.environ.get("DB_SCENE", "final-one-weekend.json")
    W = int(os.environ.get("DB_W", "1200"))
    H = int(os.environ.get("DB_H", "675"))
    tags = os.environ.get(
        "DB_TAGS", ";norounds;norows;noshade;nonee;noregen").split(";")

    from raytrace_tpu.engine import Renderer
    from raytrace_tpu.engine.wavefront import prepare_batch
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.ops import megakernel as mk
    from raytrace_tpu.scene_file import SceneFile

    sf = SceneFile.load_json(f"/root/reference/assets/{scene_name}")
    sf.render.sample_batches = max(sf.render.sample_batches, 2 * k)
    cs = compile_scene(sf, width=W, height=H)
    r = Renderer(cs)
    assert r.static.use_megakernel
    q = r._mega_q
    r.render_batches(k)        # warm chunk -> measured snake perm
    perm = r._cost_perm if r._cost_perm is not None else r._pix_perm
    geom = prepare_batch(
        r.static, r.scene, r._times_dev[k],
        sph_table=(r._sph_tables_dev[k] if r.static.sphere_world_mode
                   else None))

    base_cost = None
    for tag in tags:
        st = dataclasses.replace(
            r.static,
            kernel_options=dataclasses.replace(r.kernel_options, ablate=tag))
        f = jax.jit(lambda b, p: mk.render_tile_mega(
            st, r.scene, geom, r.camera, b, jnp.int32(0), H, r._use_dof,
            reduce_mean=False, pix_perm=p, n_batches=k, q_pix=q))
        out = f(jnp.int32(k), perm)
        jax.block_until_ready(out[1])
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = f(jnp.int32(k), perm)
            rays = float(out[1])
            best = min(best, time.time() - t0)
        it = np.asarray(out[3]).reshape(-1, 1024)[:, 0]
        cost = best / it.sum() * 1e6
        if tag == "":
            base_cost = cost
        delta = "" if base_cost is None else f"  d={base_cost-cost:+.2f}"
        print(f"[{tag or 'base':10s}] {best*1e3:7.1f} ms  "
              f"{rays/best/1e6:6.1f} Mrb/s  {cost:.2f} us/cell-iter"
              f"  iters={it.sum()}{delta}", flush=True)


if __name__ == "__main__":
    main()
