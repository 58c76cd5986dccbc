"""Tail compaction must not change images: a tile large enough to trigger
the two-phase path must render identically to small tiles (which skip it),
since RNG streams are per-(pixel, sample) and independent of tiling."""

import numpy as np

from raytrace_tpu.models import compile_scene
from raytrace_tpu.scene_file import SceneFile
from raytrace_tpu.engine import Renderer
from raytrace_tpu.engine.wavefront import _compact_size
from conftest import reference_asset


def test_compact_size_policy():
    assert _compact_size(8192) == 0            # too small, disabled
    assert _compact_size(16384) == 2048
    assert _compact_size(1 << 19) == 1 << 16
    assert _compact_size(1 << 19) % 1024 == 0


def test_compacted_render_matches_uncompacted():
    sf = SceneFile.load_json(reference_asset("diffuse-spheres.json"))
    sf.render.samples_per_pixel = 4
    sf.render.sample_batches = 1
    sf.render.max_ray_depth = 12
    cs = compile_scene(sf, width=96, height=54)

    # 54 rows x 96 px x 4 spp = 20736 rays in one tile -> compaction active.
    big = Renderer(cs, rows_per_tile=54).render_all()
    # 8 rows x 96 x 4 = 3072 rays per tile -> compaction disabled.
    small = Renderer(cs, rows_per_tile=8).render_all()
    np.testing.assert_allclose(big, small, atol=2e-5)
    assert np.isfinite(big).all()


def test_compaction_with_lights():
    sf = SceneFile.load_json(reference_asset("cornell-box.json"))
    sf.render.samples_per_pixel = 4
    sf.render.sample_batches = 1
    sf.render.max_ray_depth = 8
    cs = compile_scene(sf, width=80, height=80)
    big = Renderer(cs, rows_per_tile=80).render_all()   # 25600 rays
    small = Renderer(cs, rows_per_tile=10).render_all() # 3200 rays
    np.testing.assert_allclose(big, small, atol=2e-5)
