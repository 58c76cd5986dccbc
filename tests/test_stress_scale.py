"""Scaling tests: scenes big enough that the gather sweep's cluster size
auto-doubles (effective_cluster_g) and the greedy grouping runs at the
doubled G.  Locks in the make_config <-> sphere_order shared rule and the
gather/pair sweeps' bit-parity on clusters larger than the G=4 default.
"""
import dataclasses
import json

import numpy as np
import pytest

import jax.numpy as jnp

from raytrace_tpu.engine.arrays import upload_scene
from raytrace_tpu.engine.wavefront import prepare_batch
from raytrace_tpu.models import compile_scene
from raytrace_tpu.models.sphere_order import effective_cluster_g
from raytrace_tpu.ops.camera import build_camera_arrays
from raytrace_tpu.ops.megakernel import make_config, render_tile_mega
from raytrace_tpu.ops.spheres import world_sphere_tables
from raytrace_tpu.options import KernelOptions
from raytrace_tpu.scene_file import SceneFile


def _big_sphere_scene(n_grid: int = 24, tmp_path=None):
    """~n_grid^2 small lambertian spheres + ground: n_local big enough
    that effective_cluster_g doubles past the default 4."""
    rng = np.random.default_rng(11)
    textures = [{"constant": {"name": "grey", "rgb": [0.5, 0.5, 0.5]}},
                {"constant": {"name": "ground", "rgb": [0.8, 0.8, 0.0]}}]
    materials = [{"lambertian": {"name": "grey", "albedo": "grey"}},
                 {"lambertian": {"name": "ground", "albedo": "ground"}}]
    prims = [{"uv_sphere": {"name": "ground", "center": [0, -1000, 0],
                            "radius": 1000, "rings": 4, "segments": 8,
                            "material": "ground"}}]
    insts = [{"name": "ground"}]
    for i in range(n_grid):
        for j in range(n_grid):
            nm = f"s{i}_{j}"
            c = [i - n_grid / 2 + 0.6 * rng.random(),
                 0.2,
                 j - n_grid / 2 + 0.6 * rng.random()]
            prims.append({"uv_sphere": {"name": nm, "center": c,
                                        "radius": 0.2, "rings": 4,
                                        "segments": 8, "material": "grey"}})
            insts.append({"name": nm})
    doc = {
        "cameras": [{"perspective": {
            "name": "default", "eye": [13, 2, 3], "look_at": [0, 0, 0],
            "up": [0, 1, 0], "fov_y": 20, "z_near": 0.1, "z_far": 10000,
            "focal_length": 10.0, "aperture_size": 0}}],
        "textures": textures, "materials": materials,
        "primitives": prims, "instances": insts,
        "sky": {"vertical_gradient": {"factor": 0.5,
                                      "top": [0.5, 0.7, 1.0],
                                      "bottom": [1.0, 1.0, 1.0]}},
        "render": {"camera": "default", "samples_per_pixel": 4,
                   "sample_batches": 1, "max_ray_depth": 4,
                   "aspect_ratio": 1.7777778},
    }
    p = tmp_path / "big_spheres.json"
    p.write_text(json.dumps(doc))
    return SceneFile.load_json(str(p))


def test_group_order_partial_group_stays_last():
    """With n % G != 0 the single short greedy group must be emitted
    LAST: clusters are consecutive runs of G, so a short group anywhere
    else shifts every later group off its cluster boundary."""
    from raytrace_tpu.models.sphere_order import _group_order

    rng = np.random.default_rng(0)
    pts = rng.random((485, 3)) * 20
    order = _group_order(pts, np.full(485, 0.1), 4)
    assert sorted(order.tolist()) == list(range(485))
    # all runs of 4 before the tail are full greedy groups; only the
    # final element is the partial group
    assert len(order) % 4 == 1


def test_group_order_no_full_groups():
    """effective G above the local sphere count leaves only a partial
    group; _emit_groups must return it instead of crashing on a
    zero-size Morton reduction (advisor round-3 finding)."""
    from raytrace_tpu.models.sphere_order import _group_order

    rng = np.random.default_rng(1)
    for n in (96, 100, 127):
        pts = rng.random((n, 3)) * 20
        order = _group_order(pts, np.full(n, 0.1), 128)
        assert sorted(order.tolist()) == list(range(n))


def test_effective_cluster_g_rule():
    assert effective_cluster_g(484) == 4
    assert effective_cluster_g(600) == 8
    assert effective_cluster_g(1936) == 16
    assert effective_cluster_g(484 * 16) == 64
    # gather capacity ceiling: 128 clusters x G=128
    assert effective_cluster_g(16384) == 128


def test_sphere_gate_at_gather_capacity():
    """The megakernel sphere gate (round 4: 4096 -> 16384) admits exactly
    the scenes the gather sweep can address (128 clusters x G=128) and
    resolves them onto the gather path with a trimmed SMEM table."""
    import json

    from tools_dev.gen_tri_stress import sphere_stress_doc
    from raytrace_tpu.ops.megakernel import make_config, megakernel_supported

    doc = sphere_stress_doc(6, cap=16384)
    p = "/tmp/test-stress-16k.json"
    json.dump(doc, open(p, "w"))
    sf = SceneFile.load_json(p)
    cs = compile_scene(sf, width=64)
    assert cs.num_spheres == 16384
    scene, static = upload_scene(cs)
    static = dataclasses.replace(
        static, use_pallas_sweep=True, sphere_world_mode=True,
        pallas_interpret=True, kernel_options=KernelOptions())
    assert megakernel_supported(static)
    cfg = make_config(static, scene, False)
    assert cfg.use_gather and cfg.clu_g == 128 and cfg.n_clusters <= 128
    # stress-scale schedule default: blockwhile + per-block cull
    # (BENCH_STRESS 2026-08-18: 83 vs 48 Mrays/s at 1,940 spheres)
    assert "blockwhile:4" in cfg.ablate and cfg.cull_every == 1
    # one more sphere would overflow the gather table
    over = dataclasses.replace(static, num_spheres=16385)
    assert not megakernel_supported(over)


@pytest.mark.slow
def test_gather_pair_bitwise_vs_dense_at_doubled_g(tmp_path):
    """576 local spheres -> effective G=8: the greedy-8 grouping plus the
    gather/pair/blockwhile sweeps must stay bit-identical to the dense
    scalar sweep."""
    sf = _big_sphere_scene(24, tmp_path=tmp_path)
    cs = compile_scene(sf, width=48, height=27)
    assert cs.sph_prefix > 0
    n_local = cs.num_spheres - cs.sph_prefix
    assert effective_cluster_g(n_local) == 8

    scene, static = upload_scene(cs)
    static = dataclasses.replace(
        static, use_pallas_sweep=True, sphere_world_mode=True,
        pallas_interpret=True)
    cfg = make_config(dataclasses.replace(
        static, kernel_options=KernelOptions(sweep="gather")), scene, False)
    assert cfg.clu_g == 8

    tables = world_sphere_tables(cs, np.array([0.5], np.float32))
    cam = build_camera_arrays(cs.cameras[cs.render.camera], 48, 27)
    geom = prepare_batch(static, scene, jnp.float32(0.5),
                         sph_table=tables[0])
    st0 = dataclasses.replace(
        static, kernel_options=KernelOptions(sweep="scalar"))
    base, r0, _, _ = render_tile_mega(
        st0, scene, geom, cam, jnp.int32(0), jnp.int32(0), 27, False,
        interpret=True)
    for kw in (dict(box=True, balance="pair"),
               dict(box=True, cull_every=1, ablate="blockwhile:2")):
        st1 = dataclasses.replace(
            static, kernel_options=KernelOptions(
                sweep="gather", rounds_unroll=4, **kw))
        got, r1, _, _ = render_tile_mega(
            st1, scene, geom, cam, jnp.int32(0), jnp.int32(0), 27, False,
            interpret=True)
        assert float(r0) == float(r1), kw
        np.testing.assert_array_equal(np.asarray(base), np.asarray(got))
