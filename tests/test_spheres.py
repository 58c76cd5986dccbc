"""Analytic-sphere path tests: closed-form intersection against math oracle,
attribute parity with the tessellation's parameterization, and whole-image
agreement between analytic and mesh-parity modes."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.models import compile_scene
from raytrace_tpu.ops import spheres
from raytrace_tpu.ops.intersect import T_MAX
from raytrace_tpu.scene_file import SceneFile
from raytrace_tpu.engine import Renderer
from raytrace_tpu.utils.image import rmse
from conftest import reference_asset

IDENTITY_W2O = np.tile(np.eye(3, 4, dtype=np.float32), (128, 1, 1))


def _pad_spheres(centers, radii):
    S = 128
    c = np.zeros((S, 3), np.float32)
    r = np.zeros(S, np.float32)
    c[: len(radii)] = centers
    r[: len(radii)] = radii
    return jnp.asarray(c), jnp.asarray(r), jnp.asarray(IDENTITY_W2O)


class TestIntersect:
    def test_head_on(self):
        c, r, m = _pad_spheres([[0, 0, -5]], [1.0])
        o = jnp.asarray([[0, 0, 0.0]]); d = jnp.asarray([[0, 0, -1.0]])
        hit = spheres.intersect_spheres(o, d, c, r, m)
        assert int(hit.sph[0]) == 0
        np.testing.assert_allclose(float(hit.t[0]), 4.0, atol=1e-5)

    def test_inside_hit_second_root(self):
        c, r, m = _pad_spheres([[0, 0, 0]], [2.0])
        o = jnp.asarray([[0, 0, 0.0]]); d = jnp.asarray([[0, 0, -1.0]])
        hit = spheres.intersect_spheres(o, d, c, r, m)
        np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=1e-5)

    def test_miss(self):
        c, r, m = _pad_spheres([[0, 3, -5]], [1.0])
        o = jnp.asarray([[0, 0, 0.0]]); d = jnp.asarray([[0, 0, -1.0]])
        hit = spheres.intersect_spheres(o, d, c, r, m)
        assert int(hit.sph[0]) == -1 and float(hit.t[0]) == T_MAX

    def test_closest_of_two(self):
        c, r, m = _pad_spheres([[0, 0, -10], [0, 0, -5]], [1.0, 1.0])
        o = jnp.asarray([[0, 0, 0.0]]); d = jnp.asarray([[0, 0, -1.0]])
        hit = spheres.intersect_spheres(o, d, c, r, m)
        assert int(hit.sph[0]) == 1

    def test_translated_instance(self):
        # Sphere at object origin, instance translated by (3,0,0):
        # w2o translates the ray by (-3,0,0).
        c = np.zeros((128, 3), np.float32); rr = np.zeros(128, np.float32)
        rr[0] = 1.0
        w2o = np.tile(np.eye(3, 4, dtype=np.float32), (128, 1, 1))
        w2o[0, 0, 3] = -3.0
        hit = spheres.intersect_spheres(
            jnp.asarray([[3.0, 0, 5.0]]), jnp.asarray([[0, 0, -1.0]]),
            jnp.asarray(c), jnp.asarray(rr), jnp.asarray(w2o),
        )
        np.testing.assert_allclose(float(hit.t[0]), 4.0, atol=1e-5)

    def test_scaled_instance_is_ellipsoid(self):
        # Scale x by 2 (o2w): w2o scales x by 0.5 -> unit sphere becomes
        # ellipsoid with x-semiaxis 2.
        c = np.zeros((128, 3), np.float32); rr = np.zeros(128, np.float32)
        rr[0] = 1.0
        w2o = np.tile(np.eye(3, 4, dtype=np.float32), (128, 1, 1))
        w2o[0, 0, 0] = 0.5
        hit = spheres.intersect_spheres(
            jnp.asarray([[5.0, 0, 0.0]]), jnp.asarray([[-1.0, 0, 0.0]]),
            jnp.asarray(c), jnp.asarray(rr), jnp.asarray(w2o),
        )
        np.testing.assert_allclose(float(hit.t[0]), 3.0, atol=1e-5)

    def test_unnormalized_direction_t_is_parametric(self):
        c, r, m = _pad_spheres([[0, 0, -10]], [1.0])
        o = jnp.asarray([[0, 0, 0.0]]); d = jnp.asarray([[0, 0, -3.0]])
        hit = spheres.intersect_spheres(o, d, c, r, m)
        np.testing.assert_allclose(float(hit.t[0]), 3.0, atol=1e-5)


class TestAttributes:
    def test_normal_and_uv(self):
        c, r, m = _pad_spheres([[0, 0, 0]], [2.0])
        o = jnp.asarray([[5.0, 0, 0]]); d = jnp.asarray([[-1.0, 0, 0]])
        hit = spheres.intersect_spheres(o, d, c, r, m)
        p, n, u, v = spheres.sphere_hit_attributes(
            o, d, hit.t, hit.sph, c, r, m, jnp.zeros(128, jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(p[0]), [2, 0, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(n[0]), [1, 0, 0], atol=1e-5)
        # Tessellator: n=(-sin(phi)cos(theta), -cos(phi), sin(phi)sin(theta));
        # n=(1,0,0) -> phi=pi/2 (v=0.5), cos(theta)=-1 -> theta=pi -> u=0.5.
        np.testing.assert_allclose([float(u[0]), float(v[0])], [0.5, 0.5], atol=1e-5)

    def test_uv_matches_tessellation_interpolation(self):
        """Analytic UV at tessellated-vertex directions equals vertex UV."""
        from raytrace_tpu.models.tessellate import generate_uv_sphere

        pos, nrm, uv, idx = generate_uv_sphere([0, 0, 0], 1.0, 8, 16)
        # skip poles (u is shifted there) and the seam duplicates (u=1 wraps to 0)
        interior = ~(
            (np.abs(nrm[:, 1]) > 0.999) | (uv[:, 0] >= 1.0) | (uv[:, 1] >= 1.0)
        )
        pts = pos[interior]
        o = jnp.asarray(pts * 3.0, jnp.float32)   # rays from outside, toward center
        d = jnp.asarray(-pts, jnp.float32)
        c, r, m = _pad_spheres([[0, 0, 0]], [1.0])
        hit = spheres.intersect_spheres(o, d, c, r, m)
        p, n, u, v = spheres.sphere_hit_attributes(
            o, d, hit.t, hit.sph, c, r, m, jnp.zeros(128, jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(u), uv[interior, 0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), uv[interior, 1], atol=1e-4)


class TestModeAgreement:
    @pytest.mark.parametrize("asset,res,spp,tol", [
        ("diffuse-spheres.json", 48, 16, 0.09),
        ("metal-spheres.json", 48, 8, 0.12),
    ])
    def test_analytic_vs_mesh_image(self, asset, res, spp, tol):
        """Analytic and tessellated geometry must agree to within MC noise +
        silhouette/facet differences at low resolution.  Per-pixel RMSE is
        noise-bounded (independent RNG streams at 8-16 spp differ by ~0.1
        rms), so the sharp check is the per-channel image MEAN, which
        averages the noise out and exposes any systematic geometry bias."""
        sf = SceneFile.load_json(reference_asset(asset))
        sf.render.samples_per_pixel = spp
        sf.render.sample_batches = 1
        sf.render.max_ray_depth = 8
        # Full shipped tessellation: an inscribed polyhedron's silhouette is
        # smaller than the true sphere, so coarse meshes leak sky at edges;
        # at 32x64+ the facet bias drops below the tolerance.
        w = res; h = int(res / sf.render.aspect_ratio)
        img_a = Renderer(compile_scene(sf, width=w, height=h)).render_all()
        img_m = Renderer(
            compile_scene(sf, width=w, height=h, analytic_spheres=False)
        ).render_all()
        err = rmse(img_a, img_m)
        assert err < tol, f"analytic vs mesh rmse {err}"
        mean_diff = np.abs(img_a.mean(axis=(0, 1)) - img_m.mean(axis=(0, 1)))
        assert mean_diff.max() < 0.01, f"mean bias {mean_diff}"


class TestEllipsoidFallback:
    def test_nonuniform_scale_uses_object_path(self):
        """A non-uniformly scaled sphere instance can't use world-space
        sphere tables; the renderer must fall back to the object-space
        intersector and still agree with tessellated geometry."""
        from raytrace_tpu.scene_file import (
            ConstantTexture, Instance, Lambertian, PerspectiveCamera,
            Render, Rotate, SceneFile as SF, SolidSky, Transform,
            TransformType, UvSphere,
        )

        sf = SF(
            cameras=[PerspectiveCamera(name="c", eye=[0, 0, 6], look_at=[0, 0, 0],
                                       up=[0, 1, 0], fov_y=45, z_near=0.01,
                                       z_far=100, focal_length=1, aperture_size=0)],
            textures=[ConstantTexture(name="g", rgb=[0.6, 0.3, 0.3])],
            materials=[Lambertian(name="m", albedo="g")],
            primitives=[UvSphere(name="s", center=[0, 0, 0], radius=1.0,
                                 rings=32, segments=64, material="m")],
            instances=[Instance(name="s", transform=TransformType(
                start=Transform(scale=[2.0, 1.0, 1.0])))],
            sky=SolidSky(rgb=[1.0, 1.0, 1.0]),
            render=Render(camera="c", samples_per_pixel=9, sample_batches=1,
                          max_ray_depth=6, aspect_ratio=1.0),
        )
        cs = compile_scene(sf, width=40, height=40)
        r = Renderer(cs)
        assert not r.static.sphere_world_mode     # fallback detected
        img_a = r.render_all()

        cs_m = compile_scene(sf, width=40, height=40, analytic_spheres=False)
        img_m = Renderer(cs_m).render_all()
        # Ellipsoid silhouette must match the tessellated render closely.
        assert abs(float(img_a.mean() - img_m.mean())) < 0.015
        # The ellipsoid is wider than tall: x-extent of non-sky pixels.
        sky = np.all(np.isclose(img_a, 1.0, atol=0.02), axis=-1)
        cols = (~sky).any(axis=0).sum()
        rows = (~sky).any(axis=1).sum()
        assert cols > rows * 1.5
