"""Offline study: would per-lane cluster traversal beat the dense sweep?

Collects real bounce-ray distributions (origin, direction, closest-hit t)
for final-one-weekend with an oracle-style numpy tracer, then evaluates
candidate culling schemes the way the megakernel would execute them:
a CELL of 1024 lanes pays the MAX round count over its lanes per
iteration, so the statistic that matters is the cell-max of
per-ray visited-cluster counts under the real (cost-sorted = image-
globally mixed) lane grouping — NOT the mean.

Schemes evaluated per bounce-ray:
  plaus   — clusters whose AABB slab test passes vs the ray's final bt
            (what the round-2 selective sweep visited: its measured
            ~24 cell-max rounds should reproduce here);
  nearfirst — visit plausible clusters in t_entry order, updating bt with
            the best hit inside each visited cluster and stopping when
            the next cluster's t_entry exceeds bt (the 2-level BVH-style
            traversal being considered).

Usage: python tools_dev/cull_study.py [n_pixels_sample]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np

from raytrace_tpu.models import compile_scene
from raytrace_tpu.scene_file import SceneFile


def main():
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    sf = SceneFile.load_json("/root/reference/assets/final-one-weekend.json")
    cs = compile_scene(sf, width=1200, height=675)
    n = cs.num_spheres
    prefix = cs.sph_prefix
    G = 8

    # world-space spheres at t=0.5 (compile order = prefix + Morton)
    from raytrace_tpu.ops.spheres import world_sphere_tables

    tab = np.asarray(world_sphere_tables(cs, np.array([0.5], np.float32))[0])
    c = tab[:n, 0:3].astype(np.float64)
    r = np.abs(tab[:n, 3]).astype(np.float64)

    nloc = n - prefix
    C = -(-nloc // G)
    pad = C * G - nloc
    cl_c = np.concatenate([c[prefix:], np.zeros((pad, 3))])
    cl_r = np.concatenate([r[prefix:], np.full(pad, -1.0)])
    lo = (cl_c - cl_r[:, None]).reshape(C, G, 3)
    hi = (cl_c + cl_r[:, None]).reshape(C, G, 3)
    valid = (cl_r > 0).reshape(C, G)
    box_lo = np.where(valid[..., None], lo, np.inf).min(axis=1)
    box_hi = np.where(valid[..., None], hi, -np.inf).max(axis=1)

    # ---- trace rays with a simple lambertian-ish bouncer (materials only
    # shape the direction distribution; exact BRDFs don't matter here).
    rng = np.random.default_rng(3)
    cam = cs.cameras[cs.render.camera]
    from oracle_tracer import _look_at_rh, _perspective_rh

    eye = np.asarray(cam.eye, np.float64)
    view = _look_at_rh(eye, np.asarray(cam.look_at, np.float64),
                       np.asarray(cam.up, np.float64))
    proj = _perspective_rh(np.deg2rad(cam.fov_y_deg), 1200 / 675, cam.z_near,
                           cam.z_far)
    iv, ip = np.linalg.inv(view), np.linalg.inv(proj)
    u = rng.random(n_sample) * 2 - 1
    v = rng.random(n_sample) * 2 - 1
    ndc = np.stack([u, v, np.ones(n_sample), np.ones(n_sample)], -1)
    t3 = (ndc @ ip.T)[:, :3]
    t3 /= np.linalg.norm(t3, axis=-1, keepdims=True)
    d = (np.concatenate([t3, np.zeros((n_sample, 1))], -1) @ iv.T)[:, :3]
    o = np.broadcast_to(eye, (n_sample, 3)).copy()

    def closest(o, d):
        best = np.full(o.shape[0], 1e4)
        bid = np.full(o.shape[0], -1)
        for i in range(n):
            oc = o - c[i]
            a = (d * d).sum(-1)
            h = (d * oc).sum(-1)
            cc = (oc * oc).sum(-1) - r[i] ** 2
            disc = h * h - a * cc
            sq = np.sqrt(np.maximum(disc, 0))
            t1 = (-h - sq) / a
            t2 = (-h + sq) / a
            ok = disc >= 0
            t = np.where(ok & (t1 > 1e-3) & (t1 < 1e4), t1,
                         np.where(ok & (t2 > 1e-3) & (t2 < 1e4), t2, 1e4))
            m = t < best
            best[m] = t[m]
            bid[m] = i
        return best, bid

    rays = []   # (o, d, bt) per bounce level
    for depth in range(6):
        bt, bid = closest(o, d)
        rays.append((o.copy(), d.copy(), bt.copy()))
        hit = bid >= 0
        if depth >= 5 or not hit.any():
            break
        hp = o + bt[:, None] * d
        nrm = np.zeros_like(hp)
        for i in range(n):
            m = bid == i
            if m.any():
                nrm[m] = (hp[m] - c[i]) / r[i]
        flip = (d * nrm).sum(-1) > 0
        nrm[flip] = -nrm[flip]
        # cosine bounce
        a2 = np.where(np.abs(nrm[:, 0:1]) > 0.9, [0, 1, 0.], [1, 0, 0.])
        t1v = np.cross(nrm, a2)
        t1v /= np.linalg.norm(t1v, axis=-1, keepdims=True)
        t2v = np.cross(nrm, t1v)
        r1, r2 = rng.random(len(o)), rng.random(len(o))
        phi = 2 * np.pi * r1
        nd = (np.cos(phi)[:, None] * np.sqrt(r2)[:, None] * t1v
              + np.sin(phi)[:, None] * np.sqrt(r2)[:, None] * t2v
              + np.sqrt(1 - r2)[:, None] * nrm)
        o, d = hp[hit], nd[hit]

    # ---- evaluate culling schemes on each bounce level
    def sphere_t(o, d, ids):
        """closest-hit t per (ray, sphere id)"""
        m = len(o)
        out = np.full((m, len(ids)), 1e4)
        for j, i in enumerate(ids):
            oc = o - c[i]
            aa = (d * d).sum(-1)
            h = (d * oc).sum(-1)
            cc = (oc * oc).sum(-1) - r[i] ** 2
            disc = h * h - aa * cc
            sq = np.sqrt(np.maximum(disc, 0))
            t1 = (-h - sq) / aa
            t2 = (-h + sq) / aa
            ok = disc >= 0
            out[:, j] = np.where(
                ok & (t1 > 1e-3) & (t1 < 1e4), t1,
                np.where(ok & (t2 > 1e-3) & (t2 < 1e4), t2, 1e4))
        return out

    for lvl, (o, d, bt) in enumerate(rays):
        m = len(o)
        # realistic running bt at pretest time: best over the dense
        # PREFIX (ground + heroes), which the kernel sweeps first.
        bt_pre = sphere_t(o, d, range(prefix)).min(axis=1)

        # per-sphere candidates: line hits sphere & not behind, no
        # t-vs-bt pruning (what a disc-sign sieve sees)...
        aa = (d * d).sum(-1)
        cand = np.zeros(m, int)
        cand_bt = np.zeros(m, int)
        for i in range(prefix, n):
            oc = o - c[i]
            h = (d * oc).sum(-1)
            cc = (oc * oc).sum(-1) - r[i] ** 2
            disc = h * h - aa * cc
            sel = (disc >= 0) & ((h < 0) | (cc < 0))
            cand += sel
            # ...and with a t1-vs-running-bt prune added (needs sqrt in
            # the sieve — 2 more passes):
            sq = np.sqrt(np.maximum(disc, 0))
            t1 = (-h - sq) / aa
            cand_bt += sel & (t1 < bt_pre)
        eps = 1e-12
        ivd = 1.0 / np.where(np.abs(d) < eps, np.where(d < 0, -eps, eps), d)
        a0 = (box_lo[None] - o[:, None]) * ivd[:, None]   # [m, C, 3]
        a1 = (box_hi[None] - o[:, None]) * ivd[:, None]
        te = np.minimum(a0, a1).max(-1)
        tx = np.maximum(a0, a1).min(-1)
        plaus = (te <= tx) & (tx > 1e-3) & (te < bt_pre[:, None])
        n_plaus = plaus.sum(1)

        # near-first with early exit: simulate with per-cluster best-hit
        # precomputed (sphere tests inside a visited cluster refine bt).
        order = np.argsort(np.where(plaus, te, np.inf), axis=1)
        te_sorted = np.take_along_axis(np.where(plaus, te, np.inf),
                                       order, 1)
        # best hit per (ray, cluster): min over the cluster's spheres
        # (recompute vectorized per cluster)
        best_in = np.full((m, C), 1e4)
        for k in range(C):
            ids = np.arange(prefix + k * G, min(prefix + (k + 1) * G, n))
            bb = np.full(m, 1e4)
            for i in ids:
                oc = o - c[i]
                aa = (d * d).sum(-1)
                h = (d * oc).sum(-1)
                cc = (oc * oc).sum(-1) - r[i] ** 2
                disc = h * h - aa * cc
                sq = np.sqrt(np.maximum(disc, 0))
                t1 = (-h - sq) / aa
                t2 = (-h + sq) / aa
                ok = disc >= 0
                t = np.where(ok & (t1 > 1e-3) & (t1 < 1e4), t1,
                             np.where(ok & (t2 > 1e-3) & (t2 < 1e4), t2,
                                      1e4))
                bb = np.minimum(bb, t)
            best_in[:, k] = bb
        best_sorted = np.take_along_axis(best_in, order, 1)
        run_bt = bt_pre.copy()
        visited = np.zeros(m, int)
        done = np.zeros(m, bool)
        for j in range(C):
            tj = te_sorted[:, j]
            act = ~done & np.isfinite(tj) & (tj < run_bt)
            visited += act
            run_bt = np.where(act, np.minimum(run_bt, best_sorted[:, j]),
                              run_bt)
            done |= ~act & np.isfinite(tj) | ~np.isfinite(tj)

        def cellmax(x):
            k = len(x) // 1024 * 1024
            if k == 0:
                return float(x.max())
            xs = np.asarray(x[:k]).reshape(-1, 1024)
            return float(xs.max(1).mean())

        print(f"bounce {lvl}: rays {m:6d} | sphere-cand mean"
              f" {cand.mean():5.2f} cellmax {cellmax(cand):5.1f} |"
              f" +btprune mean {cand_bt.mean():5.2f}"
              f" cellmax {cellmax(cand_bt):5.1f} | cluster-plaus mean"
              f" {n_plaus.mean():5.2f} cellmax {cellmax(n_plaus):5.1f} |"
              f" nearfirst mean {visited.mean():5.2f}"
              f" cellmax {cellmax(visited):5.1f}")


if __name__ == "__main__":
    main()
