"""Paged hierarchical triangle sweep (ops/pallas_paged_tri) — the
>16,384-triangle closest-hit path standing in for the reference's driver
BVH over large meshes (acceleration.rs:268-294, ray_gen.glsl:467-478).

Kernel-level: multi-page accumulation must be BIT-IDENTICAL to the dense
Pallas tri sweep over the same (permuted) soup (both use the same
Moller-Trumbore op order).  End-to-end: a tessellated scene rendered
through the paged path must statistically match the SAH-BVH wavefront
render (different closest-hit op orders steer MC paths by ulps, so the
gate is distributional, like megakernel-vs-wavefront parity).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from raytrace_tpu.engine import Renderer
from raytrace_tpu.models import compile_scene
from raytrace_tpu.ops import pallas_paged_tri as ppt
from raytrace_tpu.ops.pallas_tri_sweep import (
    intersect_tris_pallas_v3, pack_tri_table,
)
from raytrace_tpu.ops.vec3 import V3
from raytrace_tpu.scene_file import SceneFile


def _soup(T, seed=0, spread=0.3):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-5, 5, (T, 3))
    tri = base[:, None, :] + rng.uniform(-spread, spread, (T, 3, 3))
    return tri.astype(np.float32)


def _rays(R, seed=0):
    rng = np.random.default_rng(seed + 100)
    o = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oV = V3(*[jnp.asarray(o[:, i]) for i in range(3)])
    dV = V3(*[jnp.asarray(d[:, i]) for i in range(3)])
    return oV, dV


def test_order_is_permutation():
    tri = _soup(1000)
    perm = ppt.paged_tri_order(tri, 1000)
    assert sorted(perm.tolist()) == list(range(1000))


def test_page_tables_layout():
    g, c = 8, 16
    tri = _soup(300)
    pageG, psieve = ppt.build_page_tables(jnp.asarray(tri), 300, g, c)
    NP = ppt.num_pages(300, g, c)
    assert pageG.shape == (NP, 9 * g, 128)
    assert psieve.shape == (NP, 128, 8)
    # field round-trip: triangle t = p*(g*c) + ci*g + s lives at
    # pageG[p, 9*s+f, ci]
    t = 137
    p, rem = divmod(t, g * c)
    ci, s = divmod(rem, g)
    v0 = np.asarray(pageG[p, 9 * s:9 * s + 3, ci])
    np.testing.assert_array_equal(v0, tri[t, 0])
    e1 = np.asarray(pageG[p, 9 * s + 3:9 * s + 6, ci])
    np.testing.assert_array_equal(e1, tri[t, 1] - tri[t, 0])
    # cluster AABB contains the cluster's triangles
    lo = np.asarray(psieve[p, ci, 0:3])
    hi = np.asarray(psieve[p, ci, 3:6])
    cl = tri[(p * c + ci) * g:(p * c + ci) * g + g]
    assert (cl.reshape(-1, 3) >= lo).all() and (cl.reshape(-1, 3) <= hi).all()


def test_kernel_bitwise_vs_dense_multipage():
    g, c = 8, 16    # 128-tri pages -> 8 pages: exercises accumulation
    T = 1000
    tri = _soup(T, seed=1)
    perm = ppt.paged_tri_order(tri, T)
    tri_p = tri[perm]
    tw = jnp.asarray(ppt.build_page_valid(T, g, c))
    pageG, psieve = ppt.build_page_tables(jnp.asarray(tri_p), T, g, c)
    oV, dV = _rays(2048, seed=1)
    act = jnp.ones((2048,), bool).at[:7].set(False)   # active masking
    hit = ppt.intersect_tris_paged(oV, dV, tw, psieve, pageG, active=act,
                                   interpret=True, g=g, c=c)
    dense = intersect_tris_pallas_v3(
        oV, dV, pack_tri_table(jnp.asarray(tri_p), T), active=act,
        interpret=True)
    assert (np.asarray(dense.tri) >= 0).sum() > 20   # non-trivial scene
    np.testing.assert_array_equal(np.asarray(hit.t), np.asarray(dense.t))
    np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(dense.tri))
    # u/v are only defined on hits (the dense sweep also computes them
    # for inactive rays; the paged kernel masks candidates up front)
    am = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(hit.u)[am],
                                  np.asarray(dense.u)[am])
    np.testing.assert_array_equal(np.asarray(hit.v)[am],
                                  np.asarray(dense.v)[am])


def test_kernel_padding_tail():
    # T not a multiple of g*c: pad clusters/pages must never win
    g, c = 8, 16
    T = 77
    tri = _soup(T, seed=2, spread=1.0)
    tw = jnp.asarray(ppt.build_page_valid(T, g, c))
    pageG, psieve = ppt.build_page_tables(jnp.asarray(tri), T, g, c)
    oV, dV = _rays(1024, seed=2)
    hit = ppt.intersect_tris_paged(oV, dV, tw, psieve, pageG,
                                   interpret=True, g=g, c=c)
    ids = np.asarray(hit.tri)
    assert ((ids < T) | (ids == -1)).all()
    dense = intersect_tris_pallas_v3(
        oV, dV, pack_tri_table(jnp.asarray(tri), T), interpret=True)
    np.testing.assert_array_equal(ids, np.asarray(dense.tri))
    np.testing.assert_array_equal(np.asarray(hit.t), np.asarray(dense.t))


@pytest.mark.slow
def test_render_paged_matches_bvh():
    # A tessellated-sphere scene through the paged path (explicit
    # use_bvh="paged", interpret Pallas on CPU) vs the SAH-BVH wavefront.
    # Closest-hit op orders differ by ulps, which steer MC paths, so the
    # gate is distributional (same class as megakernel-vs-wavefront).
    sf = SceneFile.load_json(
        "/root/reference/assets/diffuse-spheres.json")
    sf.render.samples_per_pixel = 8
    sf.render.sample_batches = 2
    sf.render.max_ray_depth = 6
    cs = compile_scene(sf, width=48, analytic_spheres=False)
    assert cs.num_triangles > 500
    r_pg = Renderer(cs, use_bvh="paged", use_pallas_sweep=True)
    assert r_pg.static.bvh_mode == "paged"
    img_pg = np.asarray(r_pg.render_all())
    cs2 = compile_scene(sf, width=48, analytic_spheres=False)
    r_bv = Renderer(cs2, use_bvh=True, use_pallas_sweep=False)
    assert r_bv.static.bvh_mode in ("sah", "implicit")
    img_bv = np.asarray(r_bv.render_all())
    assert np.isfinite(img_pg).all()
    diff = np.abs(img_pg - img_bv)
    assert float(diff.mean()) < 2e-3
    match = float((diff.max(axis=-1) < 1e-4).mean())
    assert match > 0.9
