"""Megakernel (ops/megakernel.py) parity vs the XLA wavefront.

The fused kernel runs in interpret mode on CPU and must reproduce the
existing bounce loop: identical RNG draw order and identical arithmetic
give bitwise-equal images except where chaotic FP divergence (dielectric/
metal secondary paths) flips individual rays — those scenes are held to a
pixel-count bound instead.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import reference_asset

from raytrace_tpu.engine.arrays import upload_scene
from raytrace_tpu.engine.wavefront import make_trace_fn, prepare_batch, render_tile
from raytrace_tpu.models import compile_scene
from raytrace_tpu.ops.camera import build_camera_arrays
from raytrace_tpu.ops.megakernel import megakernel_supported, render_tile_mega
from raytrace_tpu.ops.spheres import world_sphere_tables
from raytrace_tpu.scene_file import SceneFile


def _setup(name, width=64, height=36, spp=4, depth=8):
    sf = SceneFile.load_json(reference_asset(name))
    sf.render.samples_per_pixel = spp
    sf.render.sample_batches = 1
    sf.render.max_ray_depth = depth
    cs = compile_scene(sf, width=width, height=height)
    scene, static = upload_scene(cs)
    static = dataclasses.replace(
        static, use_pallas_sweep=True, pallas_interpret=True
    )
    table = None
    if static.has_spheres:
        tables = world_sphere_tables(cs, np.array([0.5], np.float32))
        assert tables is not None
        static = dataclasses.replace(static, sphere_world_mode=True)
        table = tables[0]
    cam = build_camera_arrays(
        cs.cameras[cs.render.camera], static.width, static.height
    )
    geom = prepare_batch(static, scene, jnp.float32(0.5), sph_table=table)
    use_dof = cs.cameras[cs.render.camera].aperture_size > 0.0
    return cs, scene, static, cam, geom, use_dof


def _compare(name, **kw):
    cs, scene, static, cam, geom, use_dof = _setup(name, **kw)
    assert megakernel_supported(static), name
    H = static.height
    trace_fn = make_trace_fn(static, scene, geom)
    ref, rays_ref = render_tile(
        static, scene, cam, trace_fn, geom,
        jnp.int32(0), jnp.int32(0), H, use_dof,
    )
    got, rays_got, traced_pix, _it = render_tile_mega(
        static, scene, geom, cam,
        jnp.int32(0), jnp.int32(0), H, use_dof, interpret=True,
    )
    assert float(jnp.sum(traced_pix)) == float(rays_got)
    return np.asarray(ref), np.asarray(got), float(rays_ref), float(rays_got)


# Fast set keeps one sphere scene and one quad/triangle scene; the other
# two run in the slow sweep (same code paths, different assets).
@pytest.mark.parametrize("name", [
    "diffuse-spheres.json",
    pytest.param("checkered-spheres.json", marks=pytest.mark.slow),
    "quads.json",
    pytest.param("triangle.json", marks=pytest.mark.slow),
])
def test_bitwise_parity(name):
    ref, got, rr, rg = _compare(name)
    assert rr == rg
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("name,max_bad", [
    pytest.param("metal-spheres.json", 8, marks=pytest.mark.slow),
    pytest.param("dielectric-spheres.json", 8, marks=pytest.mark.slow),
    ("cornell-box.json", 4),
    # final-one-weekend runs the MXU sphere sweep (>=64 spheres): c.d and
    # c.o accumulate in matmul order, so grazing hits flip at ulp level on
    # top of the usual metal/dielectric chaos — ~1-2% of pixels at depth 8.
    ("final-one-weekend.json", 48),
    # Noise textures amplify ulp-level FMA-contraction differences between
    # the two compiled graphs ~100x (7-octave turbulence), so the marble
    # pattern drifts at FP-noise scale on most surfaces (measured 47
    # pixels > 1e-4 of 2304, channel-mean diff 2.8e-5).
    pytest.param("perlin-spheres.json", 96, marks=pytest.mark.slow),
])
def test_statistical_parity(name, max_bad):
    """Chaotic scenes: individual rays may diverge at FP noise level; the
    image must agree everywhere else and in its channel means."""
    ref, got, rr, rg = _compare(name)
    d = np.abs(ref - got).max(axis=2)
    n_bad = int((d > 1e-4).sum())
    assert n_bad <= max_bad, f"{n_bad} divergent pixels"
    assert abs(ref.mean() - got.mean()) < 1e-3
    assert abs(rr - rg) <= 0.002 * rr


def test_qpix_lanes_bitwise():
    """Multi-pixel lanes (q_pix>1) with banded and snake-stratified
    assignments reproduce the single-pixel kernel bitwise: each pixel's
    samples are still traced by one lane in sample order."""
    from raytrace_tpu.engine.renderer import banded_pixel_perm, _snake_perm

    cs, scene, static, cam, geom, use_dof = _setup("diffuse-spheres.json")
    H, W = static.height, static.width
    base, rays, traced, _ = render_tile_mega(
        static, scene, geom, cam, jnp.int32(0), jnp.int32(0), H, use_dof,
        interpret=True)
    got, rays_q, traced_q, _ = render_tile_mega(
        static, scene, geom, cam, jnp.int32(0), jnp.int32(0), H, use_dof,
        interpret=True, q_pix=4)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))
    assert float(rays) == float(rays_q)
    np.testing.assert_array_equal(np.asarray(traced), np.asarray(traced_q))

    bp = jnp.asarray(banded_pixel_perm(H, W, 4))
    got_b, _, traced_b, _ = render_tile_mega(
        static, scene, geom, cam, jnp.int32(0), jnp.int32(0), H, use_dof,
        interpret=True, q_pix=4, pix_perm=bp)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got_b))

    sp = _snake_perm(traced_b, 4, bp.shape[0] // 4)
    got_s, _, _, _ = render_tile_mega(
        static, scene, geom, cam, jnp.int32(0), jnp.int32(0), H, use_dof,
        interpret=True, q_pix=4, pix_perm=sp)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got_s))


@pytest.mark.slow
def test_sieve_bitwise_vs_dense():
    """The opt-in cluster sieve (KernelOptions(sweep="sieve")) must be
    bit-identical to the dense scalar sweep: the pretest is conservative
    and the rounds rerun the dense test in id order."""
    from raytrace_tpu.options import KernelOptions

    cs, scene, static, cam, geom, use_dof = _setup(
        "final-one-weekend.json", width=48, height=27, depth=5)
    assert static.sph_prefix > 0
    st_dense = dataclasses.replace(
        static, kernel_options=KernelOptions(sweep="scalar"))
    base, rays0, _, _ = render_tile_mega(
        st_dense, scene, geom, cam, jnp.int32(0), jnp.int32(0),
        static.height, use_dof, interpret=True)
    st_sieve = dataclasses.replace(
        static, kernel_options=KernelOptions(sweep="sieve"))
    got, rays1, _, _ = render_tile_mega(
        st_sieve, scene, geom, cam, jnp.int32(0), jnp.int32(0),
        static.height, use_dof, interpret=True)
    assert float(rays0) == float(rays1)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_gather_balance_bitwise_vs_dense():
    """Idle-lane adoption must stay bit-identical to the dense scalar
    sweep: the odd/even candidate split + (t, id) lexicographic merge
    reproduces the ascending-id strict-< result exactly."""
    from raytrace_tpu.options import KernelOptions

    cs, scene, static, cam, geom, use_dof = _setup(
        "final-one-weekend.json", width=48, height=27, depth=5)
    st_dense = dataclasses.replace(
        static, kernel_options=KernelOptions(sweep="scalar"))
    base, rays0, _, _ = render_tile_mega(
        st_dense, scene, geom, cam, jnp.int32(0), jnp.int32(0),
        static.height, use_dof, interpret=True)
    st = dataclasses.replace(
        static, kernel_options=KernelOptions(
            sweep="gather", rounds_unroll=4, balance=True))
    got, rays1, _, _ = render_tile_mega(
        st, scene, geom, cam, jnp.int32(0), jnp.int32(0),
        static.height, use_dof, interpret=True)
    assert float(rays0) == float(rays1)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_gather_pairsplit_bitwise_vs_dense():
    """Pairwise candidate splitting must stay bit-identical to the dense
    scalar sweep: the global-rank-parity split + dual accumulators +
    (t, id) lexicographic merge reproduces the ascending-id strict-<
    result exactly."""
    from raytrace_tpu.options import KernelOptions

    cs, scene, static, cam, geom, use_dof = _setup(
        "final-one-weekend.json", width=48, height=27, depth=5)
    st_dense = dataclasses.replace(
        static, kernel_options=KernelOptions(sweep="scalar"))
    base, rays0, _, _ = render_tile_mega(
        st_dense, scene, geom, cam, jnp.int32(0), jnp.int32(0),
        static.height, use_dof, interpret=True)
    st = dataclasses.replace(
        static, kernel_options=KernelOptions(
            sweep="gather", rounds_unroll=4, balance="pair"))
    got, rays1, _, _ = render_tile_mega(
        st, scene, geom, cam, jnp.int32(0), jnp.int32(0),
        static.height, use_dof, interpret=True)
    assert float(rays0) == float(rays1)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_gather_box_pretest_bitwise_vs_dense():
    """The AABB slab pretest must stay bit-identical to the dense scalar
    sweep (conservative pretest; rounds run the exact per-sphere test) —
    alone and combined with the pairwise split."""
    from raytrace_tpu.options import KernelOptions

    cs, scene, static, cam, geom, use_dof = _setup(
        "final-one-weekend.json", width=48, height=27, depth=5)
    st_dense = dataclasses.replace(
        static, kernel_options=KernelOptions(sweep="scalar"))
    base, rays0, _, _ = render_tile_mega(
        st_dense, scene, geom, cam, jnp.int32(0), jnp.int32(0),
        static.height, use_dof, interpret=True)
    for kw in (dict(box=True), dict(box=True, balance="pair"),
               dict(box=True, ablate="blockfori:3"),
               dict(box=True, balance="pair", ablate="blockfori:3")):
        st = dataclasses.replace(
            static, kernel_options=KernelOptions(
                sweep="gather", rounds_unroll=4, **kw))
        got, rays1, _, _ = render_tile_mega(
            st, scene, geom, cam, jnp.int32(0), jnp.int32(0),
            static.height, use_dof, interpret=True)
        assert float(rays0) == float(rays1), kw
        np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


@pytest.mark.slow
def test_gather_blockwhile_cull_bitwise_vs_dense():
    """blockwhile:k blocked-while rounds (with and without per-block
    re-pretest culling, gather and pair) and the pair unroll+cull path
    must stay bit-identical to the dense scalar sweep."""
    from raytrace_tpu.options import KernelOptions

    cs, scene, static, cam, geom, use_dof = _setup(
        "final-one-weekend.json", width=48, height=27, depth=5)
    st_dense = dataclasses.replace(
        static, kernel_options=KernelOptions(sweep="scalar"))
    base, rays0, _, _ = render_tile_mega(
        st_dense, scene, geom, cam, jnp.int32(0), jnp.int32(0),
        static.height, use_dof, interpret=True)
    for kw in (dict(box=True, ablate="blockwhile:3"),
               dict(box=True, cull_every=1, ablate="blockwhile:2"),
               dict(box=True, balance="pair", ablate="blockwhile:3"),
               dict(box=True, balance="pair", cull_every=1,
                    ablate="blockwhile:2"),
               dict(box=True, balance="pair", cull_every=2)):
        st = dataclasses.replace(
            static, kernel_options=KernelOptions(
                sweep="gather", rounds_unroll=4, **kw))
        got, rays1, _, _ = render_tile_mega(
            st, scene, geom, cam, jnp.int32(0), jnp.int32(0),
            static.height, use_dof, interpret=True)
        assert float(rays0) == float(rays1), kw
        np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


@pytest.mark.slow
def test_gather_cull_bands_bitwise_vs_dense():
    """Gather rounds with re-pretest culling + near-first bands must stay
    bit-identical to the dense scalar sweep: culled clusters provably
    cannot beat the current best t, and the banded visit order is
    tie-guarded on sphere id."""
    from raytrace_tpu.options import KernelOptions

    cs, scene, static, cam, geom, use_dof = _setup(
        "final-one-weekend.json", width=48, height=27, depth=5)
    assert static.sph_prefix > 0
    st_dense = dataclasses.replace(
        static, kernel_options=KernelOptions(sweep="scalar"))
    base, rays0, _, _ = render_tile_mega(
        st_dense, scene, geom, cam, jnp.int32(0), jnp.int32(0),
        static.height, use_dof, interpret=True)
    st = dataclasses.replace(
        static, kernel_options=KernelOptions(
            sweep="gather", rounds_unroll=6, cull_every=2, bands=True))
    got, rays1, _, _ = render_tile_mega(
        st, scene, geom, cam, jnp.int32(0), jnp.int32(0),
        static.height, use_dof, interpret=True)
    assert float(rays0) == float(rays1)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_image_scenes_gated_to_deferred():
    """Image-texture scenes are excluded from the plain megakernel (no
    in-Mosaic atlas fetch) but the single-convex-sphere earth family
    qualifies for the deferred-texel item mode instead."""
    from raytrace_tpu.ops.megakernel import deferred_image_supported

    for name in ["earth.json", "earth-motion-blur.json"]:
        sf = SceneFile.load_json(reference_asset(name))
        cs = compile_scene(sf, width=32, height=18)
        scene, static = upload_scene(cs)
        static = dataclasses.replace(
            static, use_pallas_sweep=True, sphere_world_mode=True
        )
        assert not megakernel_supported(static), name
        assert deferred_image_supported(static), name


def test_deferred_image_tile_parity():
    """Deferred-texel item mode (earth.json): the kernel shades image
    albedo as 1.0 and an XLA post-pass multiplies each (pixel, sample)
    item by its primary-hit texel.  Exact for <=1 image hit per path, so
    the tile must match the wavefront to FP noise (the factorization
    changes the multiply order) with identical ray counts."""
    from raytrace_tpu.ops.megakernel import deferred_image_supported

    cs, scene, static, cam, geom, use_dof = _setup("earth.json")
    assert deferred_image_supported(static)
    H = static.height
    trace_fn = make_trace_fn(static, scene, geom)
    ref, rays_ref = render_tile(
        static, scene, cam, trace_fn, geom,
        jnp.int32(0), jnp.int32(0), H, use_dof,
    )
    got, rays_got, traced_pix, _ = render_tile_mega(
        static, scene, geom, cam,
        jnp.int32(0), jnp.int32(0), H, use_dof, interpret=True,
    )
    ref, got = np.asarray(ref), np.asarray(got)
    assert float(rays_ref) == float(rays_got)
    d = np.abs(ref - got).max(axis=2)
    assert int((d > 1e-3).sum()) == 0
    assert abs(ref.mean() - got.mean()) < 1e-5


def test_camera_inside_image_sphere_falls_back():
    """A camera INSIDE the image-textured sphere re-hits the interior
    every bounce, so the one-texel-per-path factorization is wrong for
    it; the renderer must route such scenes to the XLA wavefront
    (advisor round-3 medium finding).  The outside camera keeps the
    deferred fast path."""
    from raytrace_tpu.engine.renderer import Renderer
    from raytrace_tpu.ops.megakernel import camera_outside_spheres

    sf = SceneFile.load_json(reference_asset("earth.json"))
    sf.render.samples_per_pixel = 1
    sf.render.sample_batches = 1
    sf.render.max_ray_depth = 4

    cs = compile_scene(sf, width=16, height=9)
    r_out = Renderer(cs, use_pallas_sweep=True)
    assert r_out.static.use_megakernel
    assert camera_outside_spheres(r_out.sphere_tables, [0, 0, 12])

    # globe: center (0,0,0) radius 2 — move the eye inside
    sf.cameras[0].eye = [0.0, 0.0, 1.0]
    cs_in = compile_scene(sf, width=16, height=9)
    r_in = Renderer(cs_in, use_pallas_sweep=True)
    assert not r_in.static.use_megakernel
    assert not camera_outside_spheres(r_in.sphere_tables, [0, 0, 1.0])
    img = r_in.render_all()  # wavefront path still renders
    assert np.isfinite(img).all()


@pytest.mark.parametrize("name", [
    "earth.json",
    pytest.param("earth-motion-blur.json", marks=pytest.mark.slow),
])
def test_deferred_image_renderer(name):
    """Renderer integration for the deferred-texel path: fused chunks
    (item-mode lane assignment, incl. the hist-rebuilt second chunk)
    match per-batch stepping and the XLA renderer."""
    from raytrace_tpu.engine.renderer import Renderer

    sf = SceneFile.load_json(reference_asset(name))
    sf.render.samples_per_pixel = 4
    sf.render.sample_batches = 4
    sf.render.max_ray_depth = 6
    cs = compile_scene(sf, width=48, height=27)

    r_ref = Renderer(cs, use_pallas_sweep=False)
    img_ref = r_ref.render_all()

    r_f = Renderer(cs, use_pallas_sweep=True)
    assert r_f.static.use_megakernel
    assert r_f._mega_items == 4
    assert r_f.render_batches(2) == 2
    assert r_f.render_batches(2) == 2  # hist-based item perm
    img_f = r_f.image()

    assert np.isfinite(img_f).all()
    assert np.abs(img_ref - img_f).max() < 1e-4
    assert abs(r_ref.stats.rays_traced - r_f.stats.rays_traced) < 1.0


def test_renderer_integration():
    """Renderer with the megakernel flag forced on (interpret) matches the
    default XLA renderer output."""
    from raytrace_tpu.engine.renderer import Renderer

    sf = SceneFile.load_json(reference_asset("diffuse-spheres.json"))
    sf.render.samples_per_pixel = 4
    sf.render.sample_batches = 2
    sf.render.max_ray_depth = 6
    cs = compile_scene(sf, width=48, height=27)

    r_ref = Renderer(cs, use_pallas_sweep=False)
    img_ref = r_ref.render_all()

    r_mega = Renderer(cs, use_pallas_sweep=True)
    assert r_mega.static.use_megakernel
    img_mega = r_mega.render_all()

    assert np.isfinite(img_mega).all()
    # XLA sweep vs interpret-kernel sweep agree to FP noise.
    assert np.abs(img_ref - img_mega).max() < 1e-4


@pytest.mark.slow
def test_renderer_integration_tuned_combo():
    """The sim-backed fast combo (box pretest + pairwise split +
    blockfori schedule) plumbs through the FULL Renderer chunk path
    (render_batches with the snake cost perm) BIT-IDENTICALLY to the
    default-options megakernel renderer: the sweep variants are
    bit-exact, so the whole-render results must be too.  (The XLA
    renderer is not the baseline here: final-one-weekend is chaotic —
    DOF + dielectrics — so megakernel-vs-XLA only agrees statistically,
    see test_statistical_parity.)"""
    from raytrace_tpu.engine.renderer import Renderer
    from raytrace_tpu.options import KernelOptions

    sf = SceneFile.load_json(reference_asset("final-one-weekend.json"))
    sf.render.samples_per_pixel = 4
    sf.render.sample_batches = 4
    sf.render.max_ray_depth = 5
    cs = compile_scene(sf, width=48, height=27)

    r_ref = Renderer(cs, use_pallas_sweep=True,
                     kernel_options=KernelOptions(sweep="gather", q_pix=4))
    assert r_ref.static.use_megakernel
    r_ref.render_batches(2)
    r_ref.render_batches(2)
    img_ref = r_ref.image()

    r = Renderer(cs, use_pallas_sweep=True,
                 kernel_options=KernelOptions(
                     sweep="gather", box=True, balance="pair",
                     schedule="blockfori:4", rounds_unroll=0, q_pix=4))
    assert r.static.use_megakernel
    assert r.render_batches(2) == 2
    assert r.render_batches(2) == 2   # snake cost perm from chunk 1
    img = r.image()
    assert np.isfinite(img).all()
    np.testing.assert_array_equal(img_ref, img)
    assert r_ref.stats.rays_traced == r.stats.rays_traced


def test_fused_multibatch_chunk():
    """render_batches(k) fuses k batches into one kernel call on static
    scenes; the result must match per-batch stepping (same samples, same
    seeds — only the accumulation FP order differs)."""
    from raytrace_tpu.engine.renderer import Renderer

    sf = SceneFile.load_json(reference_asset("diffuse-spheres.json"))
    sf.render.samples_per_pixel = 4
    sf.render.sample_batches = 3
    sf.render.max_ray_depth = 6
    cs = compile_scene(sf, width=48, height=27)

    r_seq = Renderer(cs, use_pallas_sweep=True)
    assert r_seq.static.use_megakernel
    while r_seq.render_next_batch():
        pass

    r_fused = Renderer(cs, use_pallas_sweep=True)
    assert r_fused.render_batches(3) == 3
    assert r_fused.current_batch == 3

    a = r_seq.image()
    b = r_fused.image()
    assert np.abs(a - b).max() < 1e-5
    assert abs(r_seq.stats.rays_traced - r_fused.stats.rays_traced) < 1.0
