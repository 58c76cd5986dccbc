"""Fused Pallas sphere sweep vs the XLA reference sweep (interpret mode on
CPU): same hits, same images."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytrace_tpu.models import compile_scene
from raytrace_tpu.ops.pallas_sweep import (
    BLOCK, intersect_spheres_pallas, pad_table8,
)
from raytrace_tpu.ops.spheres import intersect_spheres_world
from raytrace_tpu.scene_file import SceneFile
from raytrace_tpu.engine import Renderer
from conftest import reference_asset


def _random_case(S, R, seed=0):
    rs = np.random.default_rng(seed)
    c = rs.uniform(-10, 10, (S, 3))
    r = rs.uniform(0.3, 2.0, S)
    table5 = np.zeros((S, 5), np.float32)
    table5[:, :3] = c
    table5[:, 3] = r
    table5[:, 4] = (c ** 2).sum(1) - r ** 2
    o = rs.uniform(-12, 12, (R, 3)).astype(np.float32)
    d = rs.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return table5, o, d


@pytest.mark.parametrize("S,R", [
    (3, 100), (21, 500),
    pytest.param(64, BLOCK, marks=pytest.mark.slow),
    pytest.param(100, BLOCK + 7, marks=pytest.mark.slow),
])
def test_matches_xla_sweep(S, R):
    table5, o, d = _random_case(S, R, seed=S)
    ref = intersect_spheres_world(jnp.asarray(o), jnp.asarray(d), jnp.asarray(table5))
    pal = intersect_spheres_pallas(
        jnp.asarray(o), jnp.asarray(d), pad_table8(jnp.asarray(table5)),
        interpret=True,
    )
    # The XLA sweep uses HIGHEST-precision dots, the kernel fuses FMAs:
    # grazing hits can flip by ~1e-4 relative.  Distances must agree to
    # 1e-3 rel; hit/miss classification may differ only on such tangents.
    np.testing.assert_allclose(
        np.asarray(pal.t), np.asarray(ref.t), rtol=2e-3, atol=1e-3
    )
    assert (np.asarray(pal.sph) == np.asarray(ref.sph)).mean() > 0.99
    assert (
        (np.asarray(pal.sph) < 0) == (np.asarray(ref.sph) < 0)
    ).mean() > 0.995


def test_active_mask():
    table5, o, d = _random_case(8, 64)
    alive = jnp.asarray(np.arange(64) % 2 == 0)
    pal = intersect_spheres_pallas(
        jnp.asarray(o), jnp.asarray(d), pad_table8(jnp.asarray(table5)),
        active=alive, interpret=True,
    )
    assert (np.asarray(pal.sph)[~np.asarray(alive)] == -1).all()


def test_renderer_image_identical():
    sf = SceneFile.load_json(reference_asset("diffuse-spheres.json"))
    sf.render.samples_per_pixel = 4
    sf.render.sample_batches = 1
    sf.render.max_ray_depth = 6
    cs = compile_scene(sf, width=48, height=27)
    img_ref = Renderer(cs, use_pallas_sweep=False).render_all()
    img_pal = Renderer(cs, use_pallas_sweep=True).render_all()
    np.testing.assert_allclose(img_pal, img_ref, atol=5e-4)


class TestTriSweep:
    def test_matches_brute(self):
        from raytrace_tpu.ops.pallas_tri_sweep import (
            intersect_tris_pallas, pack_tri_table,
        )
        from raytrace_tpu.ops import intersect

        rs = np.random.default_rng(3)
        n = 37
        tris = (rs.uniform(-8, 8, (n, 1, 3)) + rs.normal(0, 1, (n, 3, 3))).astype(np.float32)
        T = 64
        world = np.zeros((T, 3, 3), np.float32); world[:n] = tris
        o = rs.uniform(-10, 10, (200, 3)).astype(np.float32)
        d = rs.normal(size=(200, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)

        tbl = pack_tri_table(jnp.asarray(world), n)
        pal = intersect_tris_pallas(jnp.asarray(o), jnp.asarray(d), tbl, interpret=True)
        ref = intersect.intersect_brute_force(jnp.asarray(o), jnp.asarray(d), jnp.asarray(world))
        np.testing.assert_allclose(np.asarray(pal.t), np.asarray(ref.t), rtol=2e-3, atol=1e-3)
        assert (np.asarray(pal.tri) == np.asarray(ref.tri)).mean() > 0.99
        np.testing.assert_allclose(np.asarray(pal.u), np.asarray(ref.u), atol=2e-3)

    def test_cornell_image_identical(self):
        sf = SceneFile.load_json(reference_asset("cornell-box.json"))
        sf.render.samples_per_pixel = 4
        sf.render.sample_batches = 1
        sf.render.max_ray_depth = 6
        cs = compile_scene(sf, width=48, height=48)
        img_ref = Renderer(cs, use_pallas_sweep=False).render_all()
        img_pal = Renderer(cs, use_pallas_sweep=True).render_all()
        np.testing.assert_allclose(img_pal, img_ref, atol=2e-3)

    @pytest.mark.slow
    def test_mixed_scene_simple_light(self):
        sf = SceneFile.load_json(reference_asset("simple-light.json"))
        sf.render.samples_per_pixel = 4
        sf.render.sample_batches = 1
        sf.render.max_ray_depth = 6
        cs = compile_scene(sf, width=48, height=27)
        img_ref = Renderer(cs, use_pallas_sweep=False).render_all()
        img_pal = Renderer(cs, use_pallas_sweep=True).render_all()
        # A flipped grazing hit reroutes that ray's whole path, so compare
        # by outlier count rather than a global atol.
        bad = (np.abs(img_pal - img_ref) > 2e-3).any(axis=-1).mean()
        assert bad < 0.005, f"{bad:.4%} pixels differ"
