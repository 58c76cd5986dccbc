"""On-chip cost triage for the megakernel: time mega_dispatch on
final-one-weekend tables at controlled depth / ablation.

  MEGA_ABLATE=sweeponly MB_DEPTH=1 python tools_dev/mega_bench.py
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
    from raytrace_tpu.engine.arrays import upload_scene
    from raytrace_tpu.engine.wavefront import prepare_batch
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.ops import megakernel as mk
    from raytrace_tpu.ops.camera import build_camera_arrays
    from raytrace_tpu.ops.spheres import world_sphere_tables
    from raytrace_tpu.scene_file import SceneFile

    depth = int(os.environ.get("MB_DEPTH", 50))
    n_cells = int(os.environ.get("MB_CELLS", 512))
    scene_name = os.environ.get("MB_SCENE", "final-one-weekend.json")

    sf = SceneFile.load_json(f"/root/reference/assets/{scene_name}")
    cs = compile_scene(sf, width=1200, height=675)
    scene, static = upload_scene(cs)
    static = dataclasses.replace(static, use_pallas_sweep=True)
    tables = world_sphere_tables(cs, np.array([0.5], np.float32))
    static = dataclasses.replace(static, sphere_world_mode=True)
    cam = build_camera_arrays(cs.cameras[cs.render.camera], 1200, 675)
    geom = prepare_batch(static, scene, jnp.float32(0.5), sph_table=tables[0])
    use_dof = cs.cameras[cs.render.camera].aperture_size > 0.0

    cfg = mk.make_config(static, scene, use_dof)
    cfg = dataclasses.replace(cfg, max_depth=depth, n_pix=n_cells * 1024)
    print(f"cfg: K={cfg.spp_local} S={cfg.n_spheres} T={cfg.n_tris} P={cfg.P} depth={depth} "
          f"cells={n_cells} dof={use_dof}")

    cam_tbl = jnp.concatenate([cam.view_inverse, cam.proj_inverse], axis=0)
    params = jnp.zeros((1, 16), jnp.float32)
    params = params.at[0, 0].set(0.0)
    params = params.at[0, 5].set(cam.focal_length)
    params = params.at[0, 6].set(cam.aperture_size)
    sky = scene.sky_top * (1.0 - scene.sky_factor) + scene.sky_bottom * scene.sky_factor
    params = params.at[0, 2:5].set(sky)
    (rowsT, sph, sphT, sieveT, w_tbl, bnd, clu, tri, tsv, tw, trg, o2w,
     light) = mk.build_mega_tables(cfg, static, scene, geom)
    import jax.lax
    pix_tbl = jax.lax.iota(jnp.int32, n_cells * 1024).reshape(n_cells * 8, 128)

    f = lambda prm: mk.mega_dispatch(cfg, n_cells, cam_tbl, prm, rowsT,
                                     sph, sphT, sieveT, w_tbl, bnd, clu,
                                     tri, tsv, tw, trg, o2w, light,
                                     pix_tbl)[:2]
    t0 = time.time()
    rad, tr = f(params)
    jax.block_until_ready(tr)
    print(f"compile+run {time.time()-t0:.1f}s; traced/ray="
          f"{float(tr.sum())/(n_cells*1024):.2f} mean={float(rad.x.mean()):.4f}")

    N = 8
    @jax.jit
    def bench(prm):
        def step(c, _):
            rad, tr = f(prm + c * 0.0)
            return jnp.sum(tr) * 0.0, jnp.sum(tr)
        c, trs = jax.lax.scan(step, jnp.float32(0), None, length=N)
        return trs
    trs = bench(params)
    jax.block_until_ready(trs)
    rays = n_cells * 1024
    for rep in range(4):
        t0 = time.time()
        trs = bench(params)
        tr_total = float(jnp.sum(trs))
        dt = (time.time() - t0) / N
        print(f"rep{rep}: {dt*1e3:.2f} ms/dispatch | "
              f"{rays/dt/1e6:.1f} Mrays/s launched | "
              f"{tr_total/N/dt/1e6:.1f} M ray-bounces/s | "
              f"{dt/ (tr_total/N) * 1e9:.2f} ns/ray-bounce")


if __name__ == "__main__":
    main()
