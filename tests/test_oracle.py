"""Engine vs independent oracle (tests/oracle_tracer.py).

The oracle is a standalone numpy/f64 path tracer implementing the
reference's estimator spec with no code shared with raytrace_tpu — this
is the stand-in for "pixel RMSE < 1e-3 vs the reference render"
(BASELINE.md) while the Vulkan renderer can't run here: systematic
whole-pipeline bias would show up as a channel-mean disagreement far
above Monte-Carlo noise.

Tolerances: the channel-mean standard error at these sample counts is
~1e-3 (measured); bounds are ~3 sigma.  Per-pixel RMSE is dominated by
MC noise of BOTH renderers and only guards against gross structural
disagreement (wrong geometry/normals/camera)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from conftest import reference_asset
from oracle_tracer import render_oracle

from raytrace_tpu.engine import Renderer
from raytrace_tpu.models import compile_scene
from raytrace_tpu.scene_file import SceneFile


def _engine_render(name, w, h, spp, batches, depth):
    sf = SceneFile.load_json(reference_asset(name))
    sf.render.samples_per_pixel = spp
    sf.render.sample_batches = batches
    sf.render.max_ray_depth = depth
    cs = compile_scene(sf, width=w, height=h)
    return Renderer(cs).render_all()


CASES = [
    # name, W, H, oracle_spp, engine (spp, batches), depth, mean_tol, rmse_tol
    # quads is the fast-set case (cheapest oracle); the sphere and NEE
    # cases run in the slow sweep (`pytest -m ""`).
    pytest.param("diffuse-spheres.json", 48, 27, 384, (16, 24), 10, 4e-3,
                 0.02, marks=pytest.mark.slow),
    ("quads.json", 32, 32, 384, (16, 16), 6, 4e-3, 0.03),
    pytest.param("cornell-box.json", 32, 32, 512, (64, 8), 8, 6e-3, 0.12,
                 marks=pytest.mark.slow),
]


@pytest.mark.parametrize("name,w,h,ospp,espp,depth,mean_tol,rmse_tol", CASES)
def test_oracle_agreement(name, w, h, ospp, espp, depth, mean_tol, rmse_tol):
    oi = render_oracle(reference_asset(name), w, h, spp=ospp,
                       max_depth=depth)
    ei = _engine_render(name, w, h, espp[0], espp[1], depth)
    assert np.isfinite(oi).all() and np.isfinite(ei).all()
    mean_diff = np.abs(oi.mean(axis=(0, 1)) - ei.mean(axis=(0, 1)))
    assert mean_diff.max() < mean_tol, (
        f"channel-mean bias {mean_diff} vs oracle — systematic error?")
    rmse = float(np.sqrt(((oi - ei) ** 2).mean()))
    assert rmse < rmse_tol, f"structural disagreement: rmse {rmse}"
