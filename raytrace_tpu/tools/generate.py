"""Deterministic generator for the "Ray Tracing in One Weekend" final scene
(reference: tools/src/main.rs:52-326).

Same construction: a 1000-radius checkered ground sphere (y-down world), a
22x22 grid of small spheres with material chosen by a random draw
(diffuse < 0.8 <= metal < 0.95 <= glass), rejection against the three hero
spheres, every sphere snapped onto the ground sphere with a 0.035 fudge,
motion-blur variant giving diffuse spheres an animated falling translation.

RNG note: the reference uses an OS-independent but library-specific
ChaCha20 stream (seed 485674845675491) through rand's distributions; we use
numpy PCG64 with the same seed — same distributions, different draws, so the
generated scene differs sphere-by-sphere but is statistically identical and
fully deterministic.  For renders that must match the reference's shipped
assets byte-for-byte, use the shipped JSON files directly — they load
unchanged (scene_file is format-compatible).
"""

from __future__ import annotations

import numpy as np

from ..scene_file import (
    ConstantTexture,
    CheckerTexture,
    Dielectric,
    Instance,
    Lambertian,
    Metal,
    PerspectiveCamera,
    Render,
    SceneFile,
    Transform,
    TransformType,
    UvSphere,
    VerticalGradientSky,
)

SEED = 485_674_845_675_491
FUDGE = 0.035


def _touch_ground(center, radius, g_center, g_radius):
    center = np.asarray(center, np.float64)
    g_center = np.asarray(g_center, np.float64)
    d = center - g_center
    d = d / np.linalg.norm(d)
    return (d * (g_radius + radius - FUDGE) + g_center).astype(np.float32).tolist()


def generate_final_one_weekend_scene(do_motion_blur: bool = False,
                                     seed: int = SEED) -> SceneFile:
    rng = np.random.default_rng(seed)

    textures = [
        ConstantTexture(name="green", rgb=[0.2, 0.3, 0.1]),
        ConstantTexture(name="pale-white", rgb=[0.9, 0.9, 0.9]),
        CheckerTexture(name="green-and-white-checker", scale=0.32,
                       even="green", odd="pale-white"),
    ]
    materials = [Lambertian(name="ground", albedo="green-and-white-checker")]

    ground_center = [0.0, 1000.0, 0.0]
    ground_radius = 1000.0
    primitives = [UvSphere(name="ground_sphere", center=ground_center,
                           radius=ground_radius, rings=128, segments=256,
                           material="ground")]
    instances = [Instance(name="ground_sphere")]

    c1 = np.array([0.0, -1.0, 0.0])
    c2 = np.asarray(_touch_ground([-4.0, -1.0, 0.0], 1.0, ground_center, ground_radius))
    c3 = np.asarray(_touch_ground([4.0, -1.0, 0.0], 1.0, ground_center, ground_radius))
    hero_r = 1.0

    for a in range(-11, 11):
        for b in range(-11, 11):
            choose_mat = rng.random()
            radius = 0.2
            while True:
                center = _touch_ground(
                    [a + 0.9 * rng.random(), -radius, b + 0.9 * rng.random()],
                    radius, ground_center, ground_radius,
                )
                p = np.asarray(center)
                total = hero_r + radius
                if (np.linalg.norm(p - c1) > total
                        and np.linalg.norm(p - c2) > total
                        and np.linalg.norm(p - c3) > total):
                    break

            transform = None
            if choose_mat < 0.8:
                name = f"diffuse_{a}_{b}"
                albedo = (rng.random(3) * rng.random(3)).astype(float).tolist()
                textures.append(ConstantTexture(name=f"tex_albedo_{name}", rgb=albedo))
                mat = Lambertian(name=f"mat_{name}", albedo=f"tex_albedo_{name}")
                if do_motion_blur:
                    transform = TransformType(
                        start=Transform(translate=[0.0, float(rng.uniform(-0.5, 0.0)), 0.0]),
                        end=Transform(translate=[0.0, 0.0, 0.0]),
                    )
            elif choose_mat < 0.95:
                name = f"metal_{a}_{b}"
                albedo = rng.uniform(0.5, 1.0, 3).astype(float).tolist()
                fuzz = rng.uniform(0.0, 0.5, 3).astype(float).tolist()
                textures.append(ConstantTexture(name=f"tex_albedo_{name}", rgb=albedo))
                textures.append(ConstantTexture(name=f"tex_fuzz_{name}", rgb=fuzz))
                mat = Metal(name=f"mat_metal_{a}_{b}", albedo=f"tex_albedo_{name}",
                            fuzz=f"tex_fuzz_{name}")
            else:
                mat = Dielectric(name=f"mat_dielectric_{a}_{b}", refraction_index=1.5)

            materials.append(mat)
            sphere_name = f"sphere_{a}_{b}"
            primitives.append(UvSphere(
                name=sphere_name, center=center, radius=radius,
                rings=32, segments=64, material=mat.name,
            ))
            instances.append(Instance(name=sphere_name, transform=transform))

    # Hero spheres.
    materials.append(Dielectric(name="material1", refraction_index=1.5))
    primitives.append(UvSphere(name="sphere1", center=c1.tolist(), radius=hero_r,
                               rings=64, segments=128, material="material1"))
    instances.append(Instance(name="sphere1"))

    textures.append(ConstantTexture(name="texture2", rgb=[0.4, 0.2, 0.1]))
    materials.append(Lambertian(name="material2", albedo="texture2"))
    primitives.append(UvSphere(name="sphere2", center=c2.tolist(), radius=hero_r,
                               rings=64, segments=128, material="material2"))
    instances.append(Instance(name="sphere2"))

    textures.append(ConstantTexture(name="texture3", rgb=[0.7, 0.6, 0.5]))
    textures.append(ConstantTexture(name="texture4", rgb=[0.0, 0.0, 0.0]))
    materials.append(Metal(name="material3", albedo="texture3", fuzz="texture4"))
    primitives.append(UvSphere(name="sphere3", center=c3.tolist(), radius=hero_r,
                               rings=64, segments=128, material="material3"))
    instances.append(Instance(name="sphere3"))

    cameras = [PerspectiveCamera(
        name="default", eye=[13.0, -2.0, 3.0], look_at=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0], fov_y=20.0, z_near=0.01, z_far=100.0,
        focal_length=10.0, aperture_size=0.2,
    )]

    return SceneFile(
        cameras=cameras,
        textures=textures,
        materials=materials,
        primitives=primitives,
        instances=instances,
        sky=VerticalGradientSky(factor=0.5, top=[0.5, 0.7, 1.0], bottom=[1.0, 1.0, 1.0]),
        render=Render(camera="default", samples_per_pixel=4, sample_batches=25,
                      max_ray_depth=50, aspect_ratio=16.0 / 9.0),
    )
