"""Device-op unit tests: RNG hash parity, samplers, camera rays,
intersection, transforms, Perlin, textures."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from raytrace_tpu.ops import rng, intersect, transforms
from raytrace_tpu.ops.camera import (
    build_camera_arrays,
    get_rays,
    look_at_rh,
    perspective_rh,
)


def _ref_pcg_sequence(seed, n):
    """Independent numpy implementation of common.glsl:251-261."""
    state = np.uint32(seed)
    out = []
    for _ in range(n):
        state = np.uint32((int(state) * 747796405 + 1) & 0xFFFFFFFF)
        word = np.uint32(
            ((int(state) >> ((int(state) >> 28) + 4)) ^ int(state)) * 277803737
            & 0xFFFFFFFF
        )
        word = np.uint32((int(word) >> 22) ^ int(word))
        out.append(int(word) / 4294967295.0)
    return np.array(out, np.float64)


class TestRng:
    def test_hash_matches_reference_formula(self):
        seeds = jnp.asarray([0, 1, 12345, 0xDEADBEEF], jnp.uint32)
        state = seeds
        ours = []
        for _ in range(8):
            state, f = rng.random_float(state)
            ours.append(np.asarray(f, np.float64))
        ours = np.stack(ours, axis=1)  # [4, 8]
        for i, s in enumerate([0, 1, 12345, 0xDEADBEEF]):
            np.testing.assert_allclose(ours[i], _ref_pcg_sequence(s, 8), atol=1e-7)

    def test_uniformity(self):
        state = jnp.arange(100_000, dtype=jnp.uint32) * jnp.uint32(2654435761)
        state, f = rng.random_float(state)
        state, f2 = rng.random_float(state)
        f = np.asarray(f)
        assert 0.49 < f.mean() < 0.51
        assert abs(np.corrcoef(f, np.asarray(f2))[0, 1]) < 0.01

    def test_unit_vec3_distribution(self):
        state = jnp.arange(50_000, dtype=jnp.uint32) * jnp.uint32(747796405)
        _, v = rng.random_unit_vec3(state)
        v = np.asarray(v)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
        assert np.abs(v.mean(axis=0)).max() < 0.02  # isotropic

    def test_cosine_direction(self):
        state = jnp.arange(50_000, dtype=jnp.uint32) * jnp.uint32(2891336453)
        _, v = rng.random_cosine_direction(state)
        v = np.asarray(v)
        assert (v[:, 2] >= 0).all()
        # E[cos theta] = 2/3 for pdf cos/pi
        assert abs(v[:, 2].mean() - 2 / 3) < 0.01

    def test_concentric_disk(self):
        state = jnp.arange(50_000, dtype=jnp.uint32) * jnp.uint32(97)
        _, d = rng.sample_uniform_disk_concentric(state)
        d = np.asarray(d)
        r2 = (d ** 2).sum(axis=1)
        assert r2.max() <= 1.0 + 1e-6
        # Uniform density: E[r^2] = 1/2
        assert abs(r2.mean() - 0.5) < 0.01

    def test_triangle_uniform(self):
        state = jnp.arange(20_000, dtype=jnp.uint32)
        p0 = jnp.zeros((20_000, 3)); p1 = jnp.tile(jnp.array([1., 0, 0]), (20_000, 1))
        p2 = jnp.tile(jnp.array([0., 1, 0]), (20_000, 1))
        _, p = rng.sample_triangle_uniform(state, p0, p1, p2)
        p = np.asarray(p)
        assert (p[:, 0] >= 0).all() and (p[:, 1] >= 0).all()
        assert (p[:, 0] + p[:, 1] <= 1 + 1e-6).all()
        # Centroid of uniform samples = (1/3, 1/3)
        np.testing.assert_allclose(p.mean(axis=0)[:2], [1 / 3, 1 / 3], atol=0.01)


class TestCameraMatrices:
    def test_look_at_rh_matches_glam_semantics(self):
        m = look_at_rh([0, 0, 1], np.array([0.0, 0, 0]), np.array([0.0, 1, 0]))
        # Camera at z=1 looking at origin: forward = -z.
        p_world = np.array([0, 0, 0, 1.0])
        p_cam = m @ p_world
        np.testing.assert_allclose(p_cam[:3], [0, 0, -1], atol=1e-6)

    def test_perspective_inverse_roundtrip(self):
        import math
        p = perspective_rh(math.radians(60), 16 / 9, 0.01, 100.0)
        pi = np.linalg.inv(p)
        np.testing.assert_allclose(p @ pi, np.eye(4), atol=1e-10)

    def test_center_ray_points_at_look_at(self):
        from raytrace_tpu.models.compile import CameraParams

        params = CameraParams(
            eye=np.array([3.0, -2.0, 5.0], np.float32),
            look_at=np.array([0.0, 0.0, 0.0], np.float32),
            up=np.array([0.0, 1.0, 0.0], np.float32),
            fov_y_deg=45.0, z_near=0.01, z_far=100.0,
            focal_length=1.0, aperture_size=0.0,
        )
        cam = build_camera_arrays(params, 101, 101)
        # Center pixel (50,50) + 0.5 offset with si=sj=0, 1 spp; jitter moves
        # within the pixel — use many rays and check the mean direction.
        n = 512
        state = jnp.arange(n, dtype=jnp.uint32)
        px = jnp.full((n,), 50, jnp.int32)
        py = jnp.full((n,), 50, jnp.int32)
        zeros = jnp.zeros((n,), jnp.int32)
        state, o, d = get_rays(state, cam, px, py, zeros, zeros, 101, 101, 1)
        o, d = np.asarray(o), np.asarray(d)
        np.testing.assert_allclose(o, np.tile([3, -2, 5], (n, 1)), atol=1e-5)
        mean_dir = d.mean(axis=0)
        mean_dir /= np.linalg.norm(mean_dir)
        expect = -params.eye / np.linalg.norm(params.eye)
        np.testing.assert_allclose(mean_dir, expect, atol=1e-3)


class TestIntersect:
    def test_single_triangle_hit_miss(self):
        tri = jnp.asarray(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], jnp.float32
        )
        o = jnp.asarray([[0.2, 0.2, 1.0], [0.9, 0.9, 1.0]], jnp.float32)
        d = jnp.asarray([[0, 0, -1.0], [0, 0, -1.0]], jnp.float32)
        hit = intersect.intersect_brute_force(o, d, tri)
        assert not bool(hit.missed[0])
        assert bool(hit.missed[1])  # outside the triangle
        np.testing.assert_allclose(float(hit.t[0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(
            [float(hit.u[0]), float(hit.v[0])], [0.2, 0.2], atol=1e-6
        )

    def test_closest_of_many(self):
        # Two parallel triangles; the nearer one must win regardless of order.
        tris = np.zeros((2, 3, 3), np.float32)
        tris[0] = [[-5, -5, -2], [5, -5, -2], [0, 5, -2]]
        tris[1] = [[-5, -5, -1], [5, -5, -1], [0, 5, -1]]
        hit = intersect.intersect_brute_force(
            jnp.asarray([[0, 0, 0.0]]), jnp.asarray([[0, 0, -1.0]]),
            jnp.asarray(tris),
        )
        assert int(hit.tri[0]) == 1
        np.testing.assert_allclose(float(hit.t[0]), 1.0, atol=1e-6)

    def test_tmin_prevents_self_hit(self):
        tri = jnp.asarray([[[-1, -1, 0], [1, -1, 0], [0, 1, 0]]], jnp.float32)
        o = jnp.asarray([[0, 0, 0.0005]], jnp.float32)  # closer than T_MIN
        d = jnp.asarray([[0, 0, -1.0]], jnp.float32)
        hit = intersect.intersect_brute_force(o, d, tri)
        assert bool(hit.missed[0])

    def test_degenerate_padding_never_hits(self):
        tris = np.zeros((4, 3, 3), np.float32)
        tris[0] = [[-5, -5, -1], [5, -5, -1], [0, 5, -1]]
        hit = intersect.intersect_brute_force(
            jnp.asarray([[0, 0, 0.0]]), jnp.asarray([[0, 0, -1.0]]),
            jnp.asarray(tris),
        )
        assert int(hit.tri[0]) == 0

    def test_brute_force_matches_bruteforce_numpy_random(self):
        rs = np.random.default_rng(7)
        tris = rs.normal(size=(64, 3, 3)).astype(np.float32)
        o = rs.normal(size=(32, 3)).astype(np.float32) * 3
        d = rs.normal(size=(32, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        hit = intersect.intersect_brute_force(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris))
        # numpy oracle
        v0 = tris[:, 0]; e1 = tris[:, 1] - tris[:, 0]; e2 = tris[:, 2] - tris[:, 0]
        best_t = np.full(32, intersect.T_MAX); best_i = np.full(32, -1)
        for r in range(32):
            pvec = np.cross(d[r], e2)
            det = (e1 * pvec).sum(1)
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = np.where(det != 0, 1.0 / det, 0.0)
            tvec = o[r] - v0
            u = (tvec * pvec).sum(1) * inv
            qvec = np.cross(tvec, e1)
            v = (d[r] * qvec).sum(1) * inv
            t = (e2 * qvec).sum(1) * inv
            ok = (det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0.001) & (t < 10000)
            if ok.any():
                i = np.where(ok, t, np.inf).argmin()
                best_t[r] = t[i]; best_i[r] = i
        np.testing.assert_array_equal(np.asarray(hit.tri), best_i)
        np.testing.assert_allclose(np.asarray(hit.t), best_t, rtol=1e-4)


class TestDeviceTransforms:
    def test_static_identity(self):
        t0 = jnp.asarray([[0, 0, 0, 0, 0, 0, 1, 1, 1, 1]], jnp.float32)
        mats = transforms.interpolate_instances(t0, t0, jnp.float32(0.37))
        np.testing.assert_allclose(
            np.asarray(mats.object_to_world[0]),
            np.eye(3, 4), atol=1e-6,
        )

    def test_matches_host_lerp(self):
        from raytrace_tpu.models.transform import decompose_matrix
        from raytrace_tpu.scene_file import Transform, Rotate

        a = decompose_matrix(
            Transform(translate=[1, 2, 3], rotate=Rotate(axis=[0, 1, 0], degrees=10),
                      scale=[1, 1, 1]).to_matrix())
        b = decompose_matrix(
            Transform(translate=[4, 2, 3], rotate=Rotate(axis=[0, 1, 0], degrees=80),
                      scale=[2, 2, 2]).to_matrix())
        pack = lambda t: np.concatenate([t.translation, t.rotation, t.scale]).astype(np.float32)
        for time in [0.0, 0.25, 0.8, 1.0]:
            mats = transforms.interpolate_instances(
                jnp.asarray(pack(a))[None], jnp.asarray(pack(b))[None], jnp.float32(time)
            )
            expect = a.lerp(b, time).to_matrix()[:3]
            np.testing.assert_allclose(
                np.asarray(mats.object_to_world[0]), expect, atol=1e-5
            )
            # world_to_object really is the inverse.
            m34 = np.asarray(mats.object_to_world[0])
            w34 = np.asarray(mats.world_to_object[0])
            m4 = np.vstack([m34, [0, 0, 0, 1]])
            w4 = np.vstack([w34, [0, 0, 0, 1]])
            np.testing.assert_allclose(m4 @ w4, np.eye(4), atol=1e-4)

    def test_soup_transform_normals(self):
        # Non-uniform scale: normals must use inverse-transpose.
        t = jnp.asarray([[0, 0, 0, 0, 0, 0, 1, 2, 1, 1]], jnp.float32)  # scale x by 2
        mats = transforms.interpolate_instances(t, t, jnp.float32(0.0))
        tri_p = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], jnp.float32)
        # Normal along +x on a plane x=0.
        tri_n = jnp.tile(jnp.asarray([1.0, 0, 0]), (1, 3, 1))
        wp, wn = transforms.transform_soup(tri_p, tri_n, jnp.asarray([0]), mats)
        n = np.array(wn[0, 0]); n /= np.linalg.norm(n)
        np.testing.assert_allclose(n, [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(wp[0, 1]), [2, 0, 0], atol=1e-6)


class TestPerlin:
    def test_range_and_continuity(self):
        from raytrace_tpu.ops.perlin import cnoise, turbulence

        pts = jnp.asarray(np.random.default_rng(3).uniform(-10, 10, (1000, 3)), jnp.float32)
        n = np.asarray(cnoise(pts))
        assert np.abs(n).max() <= 2.2  # scaled amplitude bound
        assert n.std() > 0.1           # actually varies
        # Continuity: tiny step changes value only slightly.
        n2 = np.asarray(cnoise(pts + 1e-4))
        assert np.abs(n - n2).max() < 0.01
        t = np.asarray(turbulence(pts, 7))
        assert (t >= 0).all()

    def test_zero_at_integer_lattice(self):
        from raytrace_tpu.ops.perlin import cnoise

        pts = jnp.asarray(np.random.default_rng(0).integers(-20, 20, (64, 3)), jnp.float32)
        np.testing.assert_allclose(np.asarray(cnoise(pts)), 0.0, atol=1e-4)
