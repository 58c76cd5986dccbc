"""Round-3 sweep-strategy bench: one process, several MegaConfig variants,
persistent compile cache enabled.  Each variant times mega_dispatch on
final-one-weekend tables (identity pixel assignment, q=1).

  SB_MODES=mxu,gather,gather-norounds SB_CELLS=512 python tools_dev/sweep_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _env(gather="1", mxu="0", ablate="", g="8", cull="0", bands="0",
         unroll=None, balance="0", box="0"):
    env = {"MEGA_GATHER": gather, "MEGA_MXU": mxu, "MEGA_SIEVE": "0",
           "MEGA_SEL": "0", "MEGA_ABLATE": ablate, "MEGA_G": g,
           "MEGA_CULL": cull, "MEGA_BANDS": bands, "MEGA_BALANCE": balance,
           "MEGA_BOX": box}
    if unroll is not None:
        env["MEGA_UNROLL"] = str(unroll)
    return env


ENV_FOR_MODE = {
    "body": _env(ablate="nosieve"),
    "body-dynfori": _env(ablate="nosieve,dynfori"),
    "body-nowhen": _env(ablate="nosieve,nowhen"),
    "body-both": _env(ablate="nosieve,dynfori,nowhen"),
    "mxu-both": _env(gather="0", mxu="1", ablate="dynfori,nowhen"),
    "gather-un12": _env(ablate="dynfori,nowhen,unroll:12"),
    "default": _env(g="4"),
    "gather-uniformci": _env(g="4", ablate="uniformci"),
    "gather-nofetch": _env(g="4", ablate="nofetch"),
    "g4-un16": _env(ablate="dynfori,nowhen,unroll:16", g="4"),
    "g4-un24": _env(ablate="dynfori,nowhen,unroll:24", g="4"),
    "g16-un8": _env(ablate="dynfori,nowhen,unroll:8", g="16"),
    "gather-un16": _env(ablate="dynfori,nowhen,unroll:16"),
    "gather-both": _env(ablate="dynfori,nowhen"),
    "mxu": {"MEGA_GATHER": "0", "MEGA_MXU": "1", "MEGA_SIEVE": "0", "MEGA_SEL": "0", "MEGA_ABLATE": ""},
    "scalar": {"MEGA_GATHER": "0", "MEGA_MXU": "0", "MEGA_SIEVE": "0", "MEGA_SEL": "0", "MEGA_ABLATE": ""},
    "sieve": {"MEGA_GATHER": "0", "MEGA_MXU": "0", "MEGA_SIEVE": "1", "MEGA_SEL": "0", "MEGA_ABLATE": ""},
    "gather": {"MEGA_GATHER": "1", "MEGA_MXU": "0", "MEGA_SIEVE": "0", "MEGA_SEL": "0", "MEGA_ABLATE": ""},
    "gather-norounds": {"MEGA_GATHER": "1", "MEGA_ABLATE": "norounds", "MEGA_MXU": "0", "MEGA_SIEVE": "0", "MEGA_SEL": "0"},
    "body-only": _env(g="4", ablate="nosieve,nopref"),
    "g4-norounds": _env(g="4", ablate="norounds"),
    "g4-nosieve": _env(g="4", ablate="nosieve"),
    "gather-nosieve": {"MEGA_GATHER": "1", "MEGA_ABLATE": "nosieve", "MEGA_MXU": "0", "MEGA_SIEVE": "0", "MEGA_SEL": "0"},
    "gather-mm": {"MEGA_GATHER": "1", "MEGA_ABLATE": "sieve-mm", "MEGA_MXU": "0", "MEGA_SIEVE": "0", "MEGA_SEL": "0"},
    "gather-mask": {"MEGA_GATHER": "1", "MEGA_ABLATE": "sieve-mask", "MEGA_MXU": "0", "MEGA_SIEVE": "0", "MEGA_SEL": "0"},
    "gather-fix8": {"MEGA_GATHER": "1", "MEGA_ABLATE": "fixrounds:8", "MEGA_MXU": "0", "MEGA_SIEVE": "0", "MEGA_SEL": "0"},
    # round-3: re-pretest culling + near-first bands
    "cull4": _env(g="4", cull="4"),
    "cull8": _env(g="4", cull="8"),
    "cull4-un8": _env(g="4", cull="4", unroll=8),
    "cull4-un12": _env(g="4", cull="4", unroll=12),
    "cull2-un8": _env(g="4", cull="2", unroll=8),
    "bands-cull4": _env(g="4", cull="4", bands="1"),
    "bands-cull4-un8": _env(g="4", cull="4", bands="1", unroll=8),
    "bands-cull2-un6": _env(g="4", cull="2", bands="1", unroll=6),
    "bands-cull3-un6": _env(g="4", cull="3", bands="1", unroll=6),
    "bands-cull4-p35": _env(g="4", cull="4", bands="1", ablate="pivot:0.35"),
    # round-3 idle-lane adoption
    "bal": _env(g="4", balance="1"),
    "bal-un8": _env(g="4", balance="1", unroll=8),
    "bal-un10": _env(g="4", balance="1", unroll=10),
    "bal-un12": _env(g="4", balance="1", unroll=12),
    "un8": _env(g="4", unroll=8),
    "un12": _env(g="4", unroll=12),
    # round-3 pairwise candidate split
    "pair": _env(g="4", balance="pair"),
    "pair-un6": _env(g="4", balance="pair", unroll=6),
    "pair-un8": _env(g="4", balance="pair", unroll=8),
    "pair-un10": _env(g="4", balance="pair", unroll=10),
    "pair-un12": _env(g="4", balance="pair", unroll=12),
    "pair-norounds": _env(g="4", balance="pair", ablate="norounds"),
    # round-3 AABB slab pretest
    "box": _env(g="4", box="1"),
    "box-un8": _env(g="4", box="1", unroll=8),
    "box-un10": _env(g="4", box="1", unroll=10),
    "box-pair": _env(g="4", box="1", balance="pair"),
    "box-pair-un6": _env(g="4", box="1", balance="pair", unroll=6),
    "box-pair-un8": _env(g="4", box="1", balance="pair", unroll=8),
    "box-pair-un10": _env(g="4", box="1", balance="pair", unroll=10),
    "box-norounds": _env(g="4", box="1", ablate="norounds"),
    "box-bf3": _env(g="4", box="1", ablate="blockfori:3", unroll=0),
    "box-bf4": _env(g="4", box="1", ablate="blockfori:4", unroll=0),
    "box-pair-bf3": _env(g="4", box="1", balance="pair",
                         ablate="blockfori:3", unroll=0),
    "box-pair-bf4": _env(g="4", box="1", balance="pair",
                         ablate="blockfori:4", unroll=0),
    "box-pair-bf6": _env(g="4", box="1", balance="pair",
                         ablate="blockfori:6", unroll=0),
    "pair-bf4": _env(g="4", balance="pair", ablate="blockfori:4", unroll=0),
    "box-g8": _env(g="8", box="1"),
    "box-g8-pair": _env(g="8", box="1", balance="pair"),
    # round-3 blocked-while rounds (adaptive trip + per-block culling)
    "box-bw4": _env(g="4", box="1", ablate="blockwhile:4", unroll=0),
    "box-bw4c": _env(g="4", box="1", cull="1", ablate="blockwhile:4",
                     unroll=0),
    "box-bw8c": _env(g="4", box="1", cull="1", ablate="blockwhile:8",
                     unroll=0),
    "box-pair-bw4": _env(g="4", box="1", balance="pair",
                         ablate="blockwhile:4", unroll=0),
    "box-pair-bw4c": _env(g="4", box="1", balance="pair", cull="1",
                          ablate="blockwhile:4", unroll=0),
    "box-pair-bw6c": _env(g="4", box="1", balance="pair", cull="1",
                          ablate="blockwhile:6", unroll=0),
    "box-pair-bw3c": _env(g="4", box="1", balance="pair", cull="1",
                          ablate="blockwhile:3", unroll=0),
    "pair-bw4c": _env(g="4", balance="pair", cull="1",
                      ablate="blockwhile:4", unroll=0),
    "box-pair-cull2-un8": _env(g="4", box="1", balance="pair", cull="2",
                               unroll=8),
    "box-pair-cull4-un8": _env(g="4", box="1", balance="pair", cull="4",
                               unroll=8),
    # round-3 body decomposition (stage stubs)
    "body-norows": _env(g="4", ablate="nosieve,nopref,norows"),
    "body-noshade": _env(g="4", ablate="nosieve,nopref,noshade"),
    "body-nonee": _env(g="4", ablate="nosieve,nopref,nonee"),
    "body-noregen": _env(g="4", ablate="nosieve,nopref,noregen"),
    "body-none": _env(g="4", ablate="nosieve,nopref,norows,noshade,nonee,noregen"),
    "g4-nopref": _env(g="4", ablate="nosieve,nopref"),
}


def main():
    from raytrace_tpu.engine.arrays import upload_scene
    from raytrace_tpu.engine.wavefront import prepare_batch
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.ops import megakernel as mk
    from raytrace_tpu.ops.camera import build_camera_arrays
    from raytrace_tpu.ops.spheres import world_sphere_tables
    from raytrace_tpu.scene_file import SceneFile
    from raytrace_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    depth = int(os.environ.get("SB_DEPTH", 50))
    n_cells = int(os.environ.get("SB_CELLS", 512))
    scene_name = os.environ.get("SB_SCENE", "final-one-weekend.json")
    modes = os.environ.get("SB_MODES", "mxu,gather").split(",")

    path = f"/root/reference/assets/{scene_name}"
    if not os.path.exists(path):
        path = scene_name
    sf = SceneFile.load_json(path)
    cs = compile_scene(sf, width=1200, height=675)
    scene, static = upload_scene(cs)
    static = dataclasses.replace(static, use_pallas_sweep=True,
                                 sphere_world_mode=True)
    tables = world_sphere_tables(cs, np.array([0.5], np.float32))
    cam = build_camera_arrays(cs.cameras[cs.render.camera], 1200, 675)
    geom = prepare_batch(static, scene, jnp.float32(0.5), sph_table=tables[0])
    use_dof = cs.cameras[cs.render.camera].aperture_size > 0.0

    cam_tbl = jnp.concatenate([cam.view_inverse, cam.proj_inverse], axis=0)
    params = jnp.zeros((1, 16), jnp.float32)
    params = params.at[0, 5].set(cam.focal_length)
    params = params.at[0, 6].set(cam.aperture_size)
    sky = (scene.sky_top * (1.0 - scene.sky_factor)
           + scene.sky_bottom * scene.sky_factor)
    params = params.at[0, 2:5].set(sky)
    pix_base = int(os.environ.get("SB_PIXBASE", 0))
    pix_tbl = (jax.lax.iota(jnp.int32, n_cells * 1024)
               + pix_base).reshape(n_cells * 8, 128)

    for mode in modes:
        for k in ("MEGA_UNROLL", "MEGA_CULL", "MEGA_BANDS", "MEGA_BALANCE",
                  "MEGA_BOX"):
            os.environ.pop(k, None)
        os.environ.update(ENV_FOR_MODE[mode])
        cfg = mk.make_config(static, scene, use_dof)
        cfg = dataclasses.replace(cfg, max_depth=depth,
                                  n_pix=pix_base + n_cells * 1024)
        tabs = mk.build_mega_tables(cfg, static, scene, geom)
        (rowsT, sph, sphT, sieveT, w_tbl, bnd, clu, tri, tsv, tw,
         trg, o2w, light) = tabs

        def f(prm):
            rad, tr, iters, _ti = mk.mega_dispatch(
                cfg, n_cells, cam_tbl, prm, rowsT, sph, sphT, sieveT,
                w_tbl, bnd, clu, tri, tsv, tw, trg, o2w, light, pix_tbl)
            return rad, tr, iters

        N = 6

        @jax.jit
        def bench(prm):
            def step(c, _):
                rad, tr, iters = f(prm + c * 0.0)
                # per-cell wall iterations: lane 0 of each cell
                cell_iters = jnp.sum(iters.reshape(n_cells, 1024)[:, 0])
                return jnp.sum(tr) * 0.0, (jnp.sum(tr), cell_iters)
            _c, (trs, its) = jax.lax.scan(step, jnp.float32(0), None, length=N)
            return trs, its

        t0 = time.time()
        rad, tr, _it = f(params)
        jax.block_until_ready(tr)
        tcompile = time.time() - t0
        trs, its = bench(params)
        jax.block_until_ready(trs)
        t0 = time.time()
        trs, its = bench(params)
        jax.block_until_ready(trs)
        dt = (time.time() - t0) / N
        total = float(jnp.sum(trs)) / N
        iters_mean = float(jnp.sum(its)) / N
        print(f"{mode:16s} compile {tcompile:6.1f}s | {dt*1e3:7.2f} ms/dispatch"
              f" | {total/dt/1e6:7.1f} M ray-bounces/s"
              f" | {dt/iters_mean*1e6:6.2f} us/cell-iter"
              f" | mean {float(rad.x.mean()):.4f} traced/ray {total/(n_cells*1024):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
