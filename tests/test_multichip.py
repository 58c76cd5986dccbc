"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the sharded
render must match the single-chip render exactly (same RNG streams, float
reduction order aside)."""

import numpy as np
import jax
import pytest

from raytrace_tpu.models import compile_scene
from raytrace_tpu.scene_file import SceneFile
from raytrace_tpu.engine import Renderer
from raytrace_tpu.parallel import MultiChipRenderer, make_mesh
from conftest import reference_asset


@pytest.fixture(scope="module")
def small_scene():
    sf = SceneFile.load_json(reference_asset("diffuse-spheres.json"))
    sf.render.samples_per_pixel = 4
    sf.render.sample_batches = 2
    sf.render.max_ray_depth = 6
    return compile_scene(sf, width=32, height=18)


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["px"] * mesh.shape["sp"] == len(jax.devices())
    mesh41 = make_mesh(sp=1)
    assert mesh41.shape["sp"] == 1


@pytest.mark.parametrize("sp", [1, 2, 4])
def test_sharded_matches_single_chip(small_scene, sp):
    single = Renderer(small_scene).render_all()
    multi = MultiChipRenderer(small_scene, mesh=make_mesh(sp=sp)).render_all()
    np.testing.assert_allclose(multi, single, atol=2e-5)


def test_rays_counted_across_shards(small_scene):
    r = MultiChipRenderer(small_scene, mesh=make_mesh(sp=2))
    r.render_next_batch()
    # At least one primary ray per sample.
    assert r.rays_traced >= 32 * 18 * 4


def test_full_mesh_axes_used(small_scene):
    mesh = make_mesh(sp=2)
    r = MultiChipRenderer(small_scene, mesh=mesh)
    img = r.render_all()
    assert img.shape == (18, 32, 3)
    assert np.isfinite(img).all()
