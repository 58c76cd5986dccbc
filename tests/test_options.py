"""KernelOptions — the public kernel-strategy surface (options.py).

Round-2 verdict weak #6: kernel strategy lived in MEGA_* env vars.  These
tests pin the constructor surface, the env-override precedence, and that
a Renderer built with explicit options renders identically to the
default (strategies are perf knobs, not semantics)."""

import dataclasses

import numpy as np
import pytest

from conftest import reference_asset

from raytrace_tpu.engine import Renderer
from raytrace_tpu.models import compile_scene
from raytrace_tpu.options import SWEEPS, KernelOptions
from raytrace_tpu.scene_file import SceneFile


def test_defaults_and_validation():
    o = KernelOptions()
    assert o.sweep == "auto" and o.q_pix is None
    assert o.resolved_q() == 32
    assert KernelOptions(sweep="selective").resolved_q() == 1
    assert KernelOptions(q_pix=8, sweep="selective").resolved_q() == 8
    with pytest.raises(ValueError):
        KernelOptions(sweep="bogus")
    with pytest.raises(ValueError):
        KernelOptions(q_pix=0)
    # hashable: part of the jit static cache key
    assert hash(KernelOptions(q_pix=8)) != hash(KernelOptions(q_pix=4))
    # schedule suffix is validated at construction, not deep in tracing
    KernelOptions(schedule="blockfori:4")
    KernelOptions(schedule="blockwhile")
    for bad in ("blockfori:x", "blockfori:0", "blockwhile:-2",
                "blockfori:", "bogus"):
        with pytest.raises(ValueError):
            KernelOptions(schedule=bad)


def test_env_overrides_win(monkeypatch):
    monkeypatch.setenv("MEGA_Q", "4")
    monkeypatch.setenv("MEGA_G", "8")
    monkeypatch.setenv("MEGA_SIEVE", "1")
    o = KernelOptions(q_pix=16, sweep="gather").with_env_overrides()
    assert o.q_pix == 4 and o.cluster_g == 8 and o.sweep == "sieve"
    monkeypatch.delenv("MEGA_SIEVE")
    monkeypatch.setenv("MEGA_GATHER", "0")
    o = KernelOptions().with_env_overrides()
    assert o.sweep == "mxu"
    monkeypatch.setenv("MEGA_MXU", "0")
    o = KernelOptions().with_env_overrides()
    assert o.sweep == "scalar" and o.allow_mxu is False


def test_make_config_strategy_mapping():
    """KernelOptions.sweep maps onto the MegaConfig strategy bits."""
    from raytrace_tpu.engine.arrays import upload_scene
    from raytrace_tpu.ops.megakernel import make_config

    sf = SceneFile.load_json(reference_asset("final-one-weekend.json"))
    sf.render.samples_per_pixel = 4
    cs = compile_scene(sf, width=64)
    scene, static = upload_scene(cs)
    assert static.sph_prefix > 0

    def cfg(**kw):
        st = dataclasses.replace(static, kernel_options=KernelOptions(**kw))
        return make_config(st, scene, use_dof=False)

    c = cfg(sweep="auto")
    assert c.use_gather and not c.use_sieve and not c.use_mxu_sweep
    c = cfg(sweep="sieve")
    assert c.use_sieve and not c.use_gather
    c = cfg(sweep="mxu")
    assert c.use_mxu_sweep and not c.use_gather
    c = cfg(sweep="scalar")
    assert not (c.use_gather or c.use_sieve or c.use_mxu_sweep or c.use_sel)
    c = cfg(sweep="selective")
    assert c.use_sel
    c = cfg(sweep="auto", cluster_g=8, rounds_unroll=4, ablate="nofetch")
    assert c.clu_g == 8 and c.rounds_unroll == 4 and c.ablate == "nofetch"


def test_renderer_with_options_matches_default():
    """Strategies are perf knobs: a Renderer with explicit non-default
    options produces the same image as the default construction."""
    sf = SceneFile.load_json(reference_asset("diffuse-spheres.json"))
    sf.render.samples_per_pixel = 4
    sf.render.sample_batches = 2
    sf.render.max_ray_depth = 6
    cs = compile_scene(sf, width=48)

    r0 = Renderer(cs, use_pallas_sweep=True)
    assert r0.kernel_options == KernelOptions()
    assert r0.static.kernel_options == r0.kernel_options
    img0 = np.asarray(r0.render_all())

    r1 = Renderer(cs, use_pallas_sweep=True,
                  kernel_options=KernelOptions(q_pix=4))
    assert r1._mega_q == 4
    img1 = np.asarray(r1.render_all())
    np.testing.assert_array_equal(img0, img1)


def test_sweeps_list_is_exhaustive():
    assert set(SWEEPS) == {"auto", "gather", "sieve", "selective", "mxu",
                           "scalar"}
