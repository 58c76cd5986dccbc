"""Fused animated megakernel (SceneStatic.anim_fuse / MegaConfig.anim_lerp).

Animated sphere-only scenes with LINEAR center paths render all k
batches of a chunk in ONE kernel call: the kernel lerps world centers
at each sample's batch shutter time from an endpoint+delta table
(ops/spheres.world_sphere_anim_tables), instead of scanning k per-batch
kernel calls over host-precomputed tables — the TPU answer to the
reference's per-batch TLAS refit + fence (acceleration.rs:91-115).

Parity contract:
  - fused chunk vs per-batch steps of the SAME lerp kernel: identical up
    to the running-mean fold order (~1 ulp) — fusion itself is exact;
  - vs the wavefront (host f64 per-batch tables): statistical, not
    bitwise — the in-kernel f32 lerp shifts centers by ~1 ulp, which
    steers a few percent of MC paths; channel means must agree to MC
    noise (same class as the on-chip Mosaic deltas, BENCH_STRESS
    parity rows).  End-to-end physics is oracle-gated separately
    (tests/test_oracle.py final-one-weekend-motion-blur case).
"""

import dataclasses

import numpy as np
import pytest

from conftest import reference_asset

from raytrace_tpu.engine.renderer import Renderer, get_batch_ray_times
from raytrace_tpu.models import compile_scene
from raytrace_tpu.ops.spheres import (world_sphere_anim_tables,
                                      world_sphere_tables)
from raytrace_tpu.scene_file import SceneFile


def _compiled(name, w=64, h=36, spp=4, batches=4, depth=8):
    sf = SceneFile.load_json(reference_asset(name))
    sf.render.samples_per_pixel = spp
    sf.render.sample_batches = batches
    sf.render.max_ray_depth = depth
    return compile_scene(sf, width=w, height=h)


def test_anim_tables_match_per_batch_host_tables():
    """tab0 + t*dtab reproduces the host f64 per-batch table to f32
    rounding at every batch time the engine actually uses."""
    cs = _compiled("final-one-weekend-motion-blur.json")
    at = world_sphere_anim_tables(cs)
    assert at is not None
    tab0, dtab = at
    S = tab0.shape[0]
    times = get_batch_ray_times(25)
    true = world_sphere_tables(cs, times)
    for bi, t in enumerate(times):
        c = tab0[:, 0:3] + t * dtab[:S, 0:3]
        k = tab0[:, 4] + t * (dtab[:S, 4] + t * dtab[:S, 5])
        np.testing.assert_allclose(c, true[bi, :, 0:3], rtol=0, atol=1e-6)
        # k0 keeps the f64 cancellation; t-terms are motion-scale
        np.testing.assert_allclose(k, true[bi, :, 4], rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(tab0[:, 3], true[bi, :, 3])  # radii


def test_anim_tables_reject_nonlinear_and_radius_animation():
    """Rotation about an offset axis (nonlinear center path) and animated
    uniform scale (dr != 0) must fall back (return None)."""
    cs = _compiled("final-one-weekend-motion-blur.json")
    si = int(cs.sph_inst[0])
    # radius animation: double the instance's uniform scale at t1
    # (inst rows are decomposed TRS: t 0:3 | quat xyzw 3:7 | scale 7:10)
    inst_t1 = np.array(cs.inst_t1)
    inst_t1[si, 7:10] = inst_t1[si, 7:10] * 2.0
    cs2 = dataclasses.replace(cs, inst_t1=inst_t1)
    assert world_sphere_anim_tables(cs2) is None
    # nonlinear: slerp to a 90-deg X rotation at t1 — sphere 0's center
    # ([0, 1000, 0], off the X axis) sweeps an arc, not a line
    s45 = np.sin(np.pi / 4)
    inst_t1b = np.array(cs.inst_t1)
    inst_t1b[si, 3:7] = [s45, 0.0, 0.0, s45]
    cs3 = dataclasses.replace(cs, inst_t1=inst_t1b)
    assert world_sphere_anim_tables(cs3) is None


def _renderer(cs, pallas):
    return Renderer(cs, use_pallas_sweep=pallas)


def test_anim_fuse_chunk_matches_per_batch_steps():
    """render_batches (one fused kernel call) equals stepping the same
    lerp kernel batch-by-batch, up to the running-mean fold order."""
    cs = _compiled("final-one-weekend-motion-blur.json", batches=4)
    r1 = _renderer(cs, True)
    assert r1.static.anim_fuse and r1.static.use_megakernel
    assert r1.render_batches(4) == 4
    r2 = _renderer(cs, True)
    while r2.render_next_batch():
        pass
    np.testing.assert_allclose(r1.image(), r2.image(), rtol=2e-6, atol=2e-7)


@pytest.mark.slow
def test_anim_fuse_vs_wavefront_statistical():
    """vs the host-per-batch wavefront: channel means agree to MC noise;
    only the expected few percent of MC paths diverge."""
    cs = _compiled("final-one-weekend-motion-blur.json", batches=4)
    r1 = _renderer(cs, True)
    assert r1.static.anim_fuse
    a = r1.render_all()
    b = _renderer(cs, False).render_all()
    assert np.abs(a.mean((0, 1)) - b.mean((0, 1))).max() < 2e-3
    frac = (np.abs(a - b).max(-1) > 1e-3).mean()
    assert frac < 0.15, frac


def test_anim_fuse_gate_rejects_lights_tris_static():
    """Static scenes and scenes with lights/tris keep anim_fuse off."""
    cs = _compiled("final-one-weekend.json", batches=2)
    assert not _renderer(cs, True).static.anim_fuse      # static scene
    cs2 = _compiled("simple-light.json", batches=2)
    assert not _renderer(cs2, True).static.anim_fuse     # lights
