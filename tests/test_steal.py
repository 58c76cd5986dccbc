"""Pair sample-stealing (megakernel use_steal) vs the non-stealing kernel.

Stealing only reorders WHICH LANE runs each (pixel, sample) item — the
per-pixel RNG streams make every sample's radiance lane-independent, so:
  - each pixel's traced-ray count must match EXACTLY (same integer sum),
  - each pixel's radiance must match up to FP add order (stolen samples
    flush into the owner's slot out of order), i.e. allclose, not
    bitwise.
Interpret mode on CPU; steal is forced via KernelOptions(steal=True)
(the interpret default keeps it off so the bitwise parity tests stay
meaningful).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import reference_asset

from raytrace_tpu.engine.arrays import upload_scene
from raytrace_tpu.engine.wavefront import prepare_batch
from raytrace_tpu.models import compile_scene
from raytrace_tpu.options import KernelOptions
from raytrace_tpu.ops.camera import build_camera_arrays
from raytrace_tpu.ops.megakernel import (make_config, megakernel_supported,
                                         render_tile_mega)
from raytrace_tpu.ops.spheres import world_sphere_tables
from raytrace_tpu.scene_file import SceneFile


def _setup(name, width=64, height=36, spp=4, depth=8, batches=1):
    sf = SceneFile.load_json(reference_asset(name))
    sf.render.samples_per_pixel = spp
    sf.render.sample_batches = max(1, batches)
    sf.render.max_ray_depth = depth
    cs = compile_scene(sf, width=width, height=height)
    scene, static = upload_scene(cs)
    static = dataclasses.replace(
        static, use_pallas_sweep=True, pallas_interpret=True)
    table = None
    if static.has_spheres:
        tables = world_sphere_tables(cs, np.array([0.5], np.float32))
        assert tables is not None
        static = dataclasses.replace(static, sphere_world_mode=True)
        table = tables[0]
    cam = build_camera_arrays(
        cs.cameras[cs.render.camera], static.width, static.height)
    geom = prepare_batch(static, scene, jnp.float32(0.5), sph_table=table)
    use_dof = cs.cameras[cs.render.camera].aperture_size > 0.0
    return cs, scene, static, cam, geom, use_dof


def _render(static, scene, geom, cam, use_dof, steal, q_pix, n_batches):
    st = dataclasses.replace(
        static, kernel_options=KernelOptions(steal=steal))
    cfg = make_config(st, scene, use_dof)
    assert cfg.use_steal is steal
    tile, rays, traced, _it = render_tile_mega(
        st, scene, geom, cam, jnp.int32(0), jnp.int32(0), static.height,
        use_dof, interpret=True, n_batches=n_batches, q_pix=q_pix,
        reduce_mean=False)
    return np.asarray(tile), float(rays), np.asarray(traced)


# q_pix=4 on a 64x36 frame leaves 1792 dead padding slots under the
# identity assignment (1 cell of 4096 slots for 2304 pixels), so the
# dead-pixel jump/claim path is exercised on both pointer directions.
@pytest.mark.parametrize("name,q,k", [
    ("diffuse-spheres.json", 4, 1),
    ("quads.json", 4, 1),
    pytest.param("metal-spheres.json", 4, 1, marks=pytest.mark.slow),
    pytest.param("diffuse-spheres.json", 2, 2, marks=pytest.mark.slow),
])
def test_steal_matches_nonsteal(name, q, k):
    cs, scene, static, cam, geom, use_dof = _setup(name, batches=k)
    assert megakernel_supported(static), name
    base, rays0, traced0 = _render(
        static, scene, geom, cam, use_dof, False, q, k)
    got, rays1, traced1 = _render(
        static, scene, geom, cam, use_dof, True, q, k)
    # identical per-pixel ray counts: stealing must neither drop nor
    # double-process any sample (integer sums, exact in f32)
    np.testing.assert_array_equal(traced0, traced1)
    assert rays0 == rays1
    # radiance equal up to FP add reorder on stolen pixels
    np.testing.assert_allclose(got, base, rtol=2e-4, atol=1e-5)
    # most pixels are never straddled by the two pointers -> bitwise
    assert (base == got).all(axis=-1).mean() > 0.5


def test_steal_default_resolution():
    """steal=None resolves OFF (measured net-negative on v5e); explicit
    steal=True turns it on; item/sel modes and ablate=nosteal force off."""
    _, scene, static, _, _, use_dof = _setup("diffuse-spheres.json")
    st = dataclasses.replace(static, kernel_options=KernelOptions())
    assert not make_config(st, scene, use_dof).use_steal
    st2 = dataclasses.replace(st, pallas_interpret=False)
    assert not make_config(st2, scene, use_dof).use_steal
    st3 = dataclasses.replace(
        st2, kernel_options=KernelOptions(steal=True, ablate="nosteal"))
    assert not make_config(st3, scene, use_dof).use_steal
    st4 = dataclasses.replace(st, kernel_options=KernelOptions(steal=True))
    assert make_config(st4, scene, use_dof).use_steal
    # (the selective-sweep gate keys on the RESOLVED mode, which needs a
    # cluster layout this 2-sphere scene doesn't have — covered by the
    # use_sel term in make_config)
