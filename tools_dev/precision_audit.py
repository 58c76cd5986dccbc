"""On-chip precision audit (VERDICT r2 weak #8 / ask #9).

For one scene per feature family, render the SAME full shipped config
twice on the TPU — once through the fused megakernel (split-precision
MXU fetches, deferred texels, in-kernel Perlin/trig) and once through
the XLA wavefront (exact-f32 gather fetches) — and report per-pixel
difference statistics.  The wavefront is the reference semantics
(bit-parity-tested against the CPU oracle), so this isolates the
kernel's precision trades: the bf16-input one-hot shading fetch
(megakernel.py _fetch_rows), the MXU sphere sweep's accumulation order,
and the polynomial atan2/acos in the deferred-image UV quantization.

  AUDIT_SCENES=cornell-box.json python tools_dev/precision_audit.py

Writes per-scene rows to PRECISION.json and prints a markdown table for
PARITY.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# scene -> (width, batches) override: both paths render the IDENTICAL
# config (shared RNG streams -> per-pixel comparability); where the XLA
# wavefront reference is 100-1000x slower than the kernel, the batch
# count / resolution shrinks — kernel precision error is config-
# independent.  None = shipped config.
DEFAULT_SCENES = {
    "triangle.json": None,            # triangles + checker + gradient sky
    "perlin-spheres.json": (512, 1),  # in-kernel Perlin (wavefront ~0.1 Mrays/s)
    "cornell-box.json": (512, 4),     # emissives + NEE/MIS, black sky
    "earth.json": (512, 4),           # image texture (deferred texel + poly trig)
    "final-one-weekend.json": (None, 4),  # 488 spheres, MXU/gather sweep, DOF
}


def render(path, use_kernel: bool, cfg):
    import jax
    from raytrace_tpu.engine import Renderer
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.scene_file import SceneFile

    sf = SceneFile.load_json(path)
    kw = {}
    if cfg is not None:
        w, batches = cfg
        if batches:
            sf.render.sample_batches = min(sf.render.sample_batches, batches)
        if w:
            kw = dict(width=w, height=int(w / (sf.render.aspect_ratio or 1.0)))
    cs = compile_scene(sf, **kw)
    r = Renderer(cs, use_pallas_sweep=use_kernel)
    t0 = time.time()
    img = r.render_all()
    dt = time.time() - t0
    return np.asarray(img, np.float64), dt


def main():
    names = os.environ.get("AUDIT_SCENES", "")
    scenes = ({n: DEFAULT_SCENES.get(n) for n in names.split(",")}
              if names else DEFAULT_SCENES)
    rows = []
    for name, cfg in scenes.items():
        path = f"/root/reference/assets/{name}"
        ref, t_ref = render(path, use_kernel=False, cfg=cfg)
        got, t_got = render(path, use_kernel=True, cfg=cfg)
        d = np.abs(got - ref)
        denom = np.maximum(np.abs(ref), 1e-3)
        rel = d / denom
        row = {
            "scene": name,
            "shape": list(ref.shape),
            "rmse": float(np.sqrt(np.mean((got - ref) ** 2))),
            "max_abs": float(d.max()),
            "p99_abs": float(np.percentile(d, 99)),
            "max_rel": float(rel.max()),
            "p99_rel": float(np.percentile(rel, 99)),
            "mean_ref": [float(x) for x in ref.mean(axis=(0, 1))],
            "mean_got": [float(x) for x in got.mean(axis=(0, 1))],
            "wavefront_s": round(t_ref, 2),
            "kernel_s": round(t_got, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PRECISION.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("\n| scene | RMSE | max abs | p99 abs | max rel |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['scene']} | {r['rmse']:.2e} | {r['max_abs']:.2e} "
              f"| {r['p99_abs']:.2e} | {r['max_rel']:.2e} |")


if __name__ == "__main__":
    main()
