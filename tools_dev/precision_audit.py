"""On-chip precision audit vs the RMSE north star (BASELINE.md: RMSE<1e-3).

Renders one scene per feature family at a fixed reduced config on the
current backend and diffs per-pixel against the CPU/XLA wavefront render
of the SAME sample set — quantifying everything the bitwise CPU parity
tests cannot see on real hardware: the bf16-input shading-row matmul
(ops/megakernel._fetch_rows), MXU accumulation order in the sphere
sweeps, and TPU FMA contraction choices.

Usage (two processes — the chip and the CPU reference must not share):
    python tools_dev/precision_audit.py tpu      # writes /tmp/audit_tpu.npz
    python tools_dev/precision_audit.py cpu      # writes /tmp/audit_cpu.npz
    python tools_dev/precision_audit.py report   # prints the PARITY.md table

Config: 320x180 (16:9) or aspect-matched, spp/batches/depth fixed below —
small enough for the CPU wavefront, big enough for meaningful per-pixel
statistics (57.6k pixels/scene).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# scene -> (spp, batches, depth). One per feature family (SURVEY §2.2).
SCENES = {
    "diffuse-spheres.json": (16, 2, 50),     # lambertian + gradient sky
    "metal-spheres.json": (16, 2, 50),       # metal (chaotic pixels)
    "dielectric-spheres.json": (16, 2, 50),  # dielectric (chaotic pixels)
    "checkered-spheres.json": (16, 2, 50),   # checker indirection
    "perlin-spheres.json": (16, 2, 50),      # in-kernel cnoise marble
    "earth.json": (16, 2, 50),               # deferred image texel path
    "cornell-box.json": (16, 2, 50),         # quads + NEE + emissive
    "final-one-weekend.json": (4, 4, 50),    # 488-sphere gather sweep + DoF
    "final-one-weekend-motion-blur.json": (4, 4, 50),  # animated tables
}
WIDTH = 320


def _render(name, use_pallas):
    from raytrace_tpu.engine import Renderer
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.scene_file import SceneFile

    spp, batches, depth = SCENES[name]
    sf = SceneFile.load_json(f"/root/reference/assets/{name}")
    sf.render.samples_per_pixel = spp
    sf.render.sample_batches = batches
    sf.render.max_ray_depth = depth
    cs = compile_scene(sf, width=WIDTH)
    r = Renderer(cs, use_pallas_sweep=use_pallas)
    img = r.render_all()
    return np.asarray(img, np.float32), bool(r.static.use_megakernel)


def cmd_tpu():
    import jax

    assert jax.default_backend() != "cpu", "run this phase on the TPU"
    out = {}
    for name in SCENES:
        img, mega = _render(name, use_pallas=True)
        out[name] = img
        out[name + "@mega"] = np.array([mega])
        print(name, "megakernel" if mega else "wavefront", flush=True)
    np.savez("/tmp/audit_tpu.npz", **out)
    print("wrote /tmp/audit_tpu.npz")


def cmd_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    out = {}
    for name in SCENES:
        img, _ = _render(name, use_pallas=False)
        out[name] = img
        print(name, "cpu-wavefront done", flush=True)
    np.savez("/tmp/audit_cpu.npz", **out)
    print("wrote /tmp/audit_cpu.npz")


def cmd_report():
    tpu = np.load("/tmp/audit_tpu.npz")
    cpu = np.load("/tmp/audit_cpu.npz")
    rows = []
    for name in SCENES:
        a, b = tpu[name], cpu[name]
        d = np.abs(a - b).max(axis=2)
        rmse = float(np.sqrt(np.mean((a - b) ** 2)))
        rows.append({
            "scene": name,
            "path": "megakernel" if bool(tpu[name + "@mega"][0]) else "wavefront",
            "rmse": rmse,
            "p50": float(np.percentile(d, 50)),
            "p99": float(np.percentile(d, 99)),
            "p999": float(np.percentile(d, 99.9)),
            "max": float(d.max()),
            "frac_gt_1e3": float((d > 1e-3).mean()),
        })
        print(json.dumps(rows[-1]))
    print()
    print("| scene | path | RMSE | p50 | p99 | p99.9 | max | >1e-3 |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['scene']} | {r['path']} | {r['rmse']:.2e} | "
              f"{r['p50']:.1e} | {r['p99']:.1e} | {r['p999']:.1e} | "
              f"{r['max']:.1e} | {r['frac_gt_1e3']*100:.2f}% |")
    with open("/tmp/audit_report.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    {"tpu": cmd_tpu, "cpu": cmd_cpu, "report": cmd_report}[sys.argv[1]]()
