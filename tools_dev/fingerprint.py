"""Deterministic on-chip kernel fingerprint (round-4 verdict weak #5).

Hardware megakernel-vs-wavefront parity is statistical (Mosaic one-ulp
transcendental deltas steer MC paths), so sub-1e-5 kernel regressions
can hide behind the MC-noise gates.  This closes that hole: render tiny
fixed-seed scenes on the CURRENT backend and sha256 the EXACT f32
accumulation bytes.  Any bit drift — a changed op order, a different
fusion, a table layout bug — flips the hash.

    python tools_dev/fingerprint.py            # check vs FINGERPRINT.json
    python tools_dev/fingerprint.py --record   # (re)record

Fingerprints are keyed by backend (tpu/cpu); a drift is an ERROR unless
explicitly re-recorded (an intentional kernel change re-records and says
so in the commit).  bench_scenes.py refuses to write BENCH_SCENES.json
rows when the fingerprint drifts, so perf rows can never paper over a
silent numeric change.

Cases cover the three kernel regimes: the gather-sweep flagship, the
NEE/MIS cornell path, and the fused-anim lerp path.
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FINGERPRINT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "FINGERPRINT.json")

# (name, width, spp, batches, depth) — small enough to render in ~a
# second warm, big enough to touch every kernel stage.
CASES = [
    ("final-one-weekend.json", 128, 4, 1, 8),
    ("cornell-box.json", 64, 8, 1, 8),
    ("final-one-weekend-motion-blur.json", 128, 4, 2, 8),
]


def _render_case(name, width, spp, batches, depth):
    from raytrace_tpu.engine import Renderer
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.scene_file import SceneFile

    sf = SceneFile.load_json(f"/root/reference/assets/{name}")
    sf.render.samples_per_pixel = spp
    sf.render.sample_batches = batches
    sf.render.max_ray_depth = depth
    cs = compile_scene(sf, width=width)
    r = Renderer(cs)
    img = r.render_all()
    return np.asarray(img, np.float32), r.static.use_megakernel


def compute_fingerprints():
    """{case_key: {sha256, mean_rgb, path}} for the current backend."""
    out = {}
    for name, width, spp, batches, depth in CASES:
        img, mega = _render_case(name, width, spp, batches, depth)
        key = f"{name}@{width}x{spp}x{batches}"
        out[key] = {
            "sha256": hashlib.sha256(img.tobytes()).hexdigest(),
            "mean_rgb": [round(float(v), 7) for v in img.mean(axis=(0, 1))],
            "path": "megakernel" if mega else "wavefront",
        }
    return out


def check(verbose=True):
    """Returns (ok, messages).  ok=True when no stored fingerprint exists
    for this backend (nothing to compare) or all hashes match."""
    import jax

    backend = jax.default_backend()
    if not os.path.exists(FINGERPRINT_PATH):
        return True, [f"no {FINGERPRINT_PATH}; run --record first"]
    with open(FINGERPRINT_PATH) as f:
        stored = json.load(f)
    if backend not in stored:
        return True, [f"no stored fingerprint for backend {backend}"]
    got = compute_fingerprints()
    msgs, ok = [], True
    for key, rec in stored[backend]["cases"].items():
        if key not in got:
            msgs.append(f"MISSING case {key} (CASES changed?)")
            ok = False
            continue
        if got[key]["sha256"] != rec["sha256"]:
            ok = False
            msgs.append(
                f"DRIFT {key}: {rec['sha256'][:12]} -> "
                f"{got[key]['sha256'][:12]} "
                f"(mean {rec['mean_rgb']} -> {got[key]['mean_rgb']})")
        else:
            msgs.append(f"ok {key}")
    if verbose:
        for m in msgs:
            print(m)
    return ok, msgs


def record():
    import datetime

    import jax

    backend = jax.default_backend()
    stored = {}
    if os.path.exists(FINGERPRINT_PATH):
        with open(FINGERPRINT_PATH) as f:
            stored = json.load(f)
    stored[backend] = {
        "recorded": datetime.date.today().isoformat(),
        "jax": jax.__version__,
        "cases": compute_fingerprints(),
    }
    with open(FINGERPRINT_PATH, "w") as f:
        json.dump(stored, f, indent=2)
    print(f"recorded {len(stored[backend]['cases'])} cases for {backend}")


if __name__ == "__main__":
    if "--record" in sys.argv:
        record()
    else:
        ok, _ = check()
        sys.exit(0 if ok else 1)
