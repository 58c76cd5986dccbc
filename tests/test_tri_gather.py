"""Tri-gather sweep tests: the megakernel's cluster-selective triangle
path (ops/megakernel._sweep_tri_gather) must stay bit-identical to the
dense scalar tri sweep over the same (permuted) table, end-to-end through
the Renderer, and across the round-scheduling variants.

The clustered layout comes from models/sphere_order.apply_triangle_order —
the triangle analogue of the sphere cluster ordering, standing in for the
reference's driver-built triangle BLAS (acceleration.rs:268-294).
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from raytrace_tpu.engine import Renderer
from raytrace_tpu.engine.arrays import upload_scene
from raytrace_tpu.engine.wavefront import prepare_batch
from raytrace_tpu.models import compile_scene
from raytrace_tpu.models.sphere_order import (
    effective_tri_g, triangle_cluster_order,
)
from raytrace_tpu.ops.camera import build_camera_arrays
from raytrace_tpu.ops.megakernel import make_config, render_tile_mega
from raytrace_tpu.options import KernelOptions
from raytrace_tpu.scene_file import (
    ConstantTexture, Instance, Lambertian, Metal, ObjMesh,
    PerspectiveCamera, Render, SceneFile as SF, SolidSky, UvSphere,
)

OBJ = "/root/reference/assets/obj/sphere-smooth.obj"


def _obj_scene(with_sphere=False):
    prims = [ObjMesh(name="mesh", path=OBJ, material="m")]
    insts = [Instance(name="mesh")]
    if with_sphere:
        prims.append(UvSphere(name="ball", center=[2.0, 0.0, 0.0],
                              radius=0.8, rings=4, segments=8,
                              material="shiny"))
        insts.append(Instance(name="ball"))
    return SF(
        cameras=[PerspectiveCamera(
            name="c", eye=[0, 0, 5], look_at=[0, 0, 0], up=[0, 1, 0],
            fov_y=40, z_near=0.01, z_far=100, focal_length=1,
            aperture_size=0)],
        textures=[ConstantTexture(name="w", rgb=[0.7, 0.7, 0.7]),
                  ConstantTexture(name="f", rgb=[0.05, 0.05, 0.05])],
        materials=[Lambertian(name="m", albedo="w"),
                   Metal(name="shiny", albedo="w", fuzz="f")],
        primitives=prims,
        instances=insts,
        sky=SolidSky(rgb=[1.0, 1.0, 1.0]),
        render=Render(camera="c", samples_per_pixel=2, sample_batches=1,
                      max_ray_depth=4, aspect_ratio=1.0),
    )


def test_effective_tri_g_rule():
    assert effective_tri_g(960) == 16
    assert effective_tri_g(2048) == 16
    assert effective_tri_g(4096) == 32
    assert effective_tri_g(16384) == 128
    assert effective_tri_g(100000) == 128  # capped; caller must reject


def test_triangle_order_is_permutation():
    cs = compile_scene(_obj_scene(), width=16, height=16)
    assert cs.num_triangles == 960
    assert cs.tri_cluster_g == 16
    perm, g = triangle_cluster_order(
        cs.tri_p, cs.tri_inst, cs.inst_t0, cs.inst_t1, cs.num_triangles)
    assert g == 16
    assert sorted(perm.tolist()) == list(range(960))


def test_small_scenes_keep_file_order():
    """Below the MEGA_TRI_MIN threshold the dense sweep's file order (and
    therefore every shipped golden) is untouched."""
    from raytrace_tpu.scene_file import SceneFile

    sf = SceneFile.load_json("/root/reference/assets/cornell-box.json")
    cs = compile_scene(sf, width=16, height=16)
    assert cs.tri_cluster_g == 0


def test_tri_gather_bitwise_vs_dense():
    """Gather rounds visit clusters in ascending id order with the dense
    sweep's exact Moller-Trumbore op order — bit-identical radiance and
    ray counts, across schedule variants."""
    cs = compile_scene(_obj_scene(), width=16, height=16)
    assert cs.tri_cluster_g == 16
    scene, static = upload_scene(cs)
    static = dataclasses.replace(
        static, use_pallas_sweep=True, pallas_interpret=True)
    W = H = 16
    cam = build_camera_arrays(cs.cameras[cs.render.camera], W, H)
    geom = prepare_batch(static, scene, jnp.float32(0.5))

    st0 = dataclasses.replace(     # dense sweep over the SAME table
        static, tri_cluster_g=0,
        kernel_options=KernelOptions(sweep="scalar"))
    cfg0 = make_config(st0, scene, False)
    assert not cfg0.tri_gather
    base, r0, _, _ = render_tile_mega(
        st0, scene, geom, cam, jnp.int32(0), jnp.int32(0), H, False,
        interpret=True)

    for ko in (KernelOptions(),
               KernelOptions(ablate="blockfori:2"),
               KernelOptions(rounds_unroll=3)):
        st1 = dataclasses.replace(static, kernel_options=ko)
        cfg1 = make_config(st1, scene, False)
        assert cfg1.tri_gather and cfg1.tri_g == 16
        got, r1, _, _ = render_tile_mega(
            st1, scene, geom, cam, jnp.int32(0), jnp.int32(0), H, False,
            interpret=True)
        assert float(r0) == float(r1), ko
        np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_tri_gather_bitwise_large_world_coords():
    """ADVICE r4: the tri pretest's t-prune margin (te < bt*1.0001 + 1e-4)
    must hold when f32 slab-entry error grows with coordinate magnitude —
    geometry and camera offset to ~1e4 must keep gather == dense bitwise
    (no true closest hit dropped by the conservative pretest)."""
    from raytrace_tpu.scene_file import Transform, TransformType

    off = [1.0e4, -1.0e4, 1.0e4]
    sf = _obj_scene()
    sf.instances[0].transform = TransformType(start=Transform(translate=off))
    cam = sf.cameras[0]
    cam.eye = [off[0], off[1], off[2] + 5.0]
    cam.look_at = off
    cs = compile_scene(sf, width=16, height=16)
    assert cs.tri_cluster_g == 16
    scene, static = upload_scene(cs)
    static = dataclasses.replace(
        static, use_pallas_sweep=True, pallas_interpret=True)
    W = H = 16
    cam_arr = build_camera_arrays(cs.cameras[cs.render.camera], W, H)
    geom = prepare_batch(static, scene, jnp.float32(0.5))

    st0 = dataclasses.replace(
        static, tri_cluster_g=0, kernel_options=KernelOptions(sweep="scalar"))
    base, r0, _, _ = render_tile_mega(
        st0, scene, geom, cam_arr, jnp.int32(0), jnp.int32(0), H, False,
        interpret=True)
    st1 = dataclasses.replace(static, kernel_options=KernelOptions())
    assert make_config(st1, scene, False).tri_gather
    got, r1, _, _ = render_tile_mega(
        st1, scene, geom, cam_arr, jnp.int32(0), jnp.int32(0), H, False,
        interpret=True)
    # the scene must actually be visible (guard against an all-sky render
    # passing vacuously)
    assert float(r0) > 0 and np.asarray(base).std() > 0
    assert float(r0) == float(r1)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


@pytest.mark.slow
def test_tri_gather_renderer_vs_wavefront():
    """End-to-end Renderer parity: megakernel tri-gather == XLA wavefront
    bitwise, on a mixed triangle+sphere scene (sphere-seeded bt prune)."""
    cs = compile_scene(_obj_scene(with_sphere=True), width=24, height=24)
    assert cs.tri_cluster_g == 16 and cs.num_spheres == 1
    r1 = Renderer(cs, use_pallas_sweep=True)
    assert r1.static.use_megakernel
    img1 = np.asarray(r1.render_all())
    img2 = np.asarray(Renderer(cs, use_pallas_sweep=False).render_all())
    np.testing.assert_array_equal(img1, img2)
