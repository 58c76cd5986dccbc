"""Offline study for the round-3 sweep redesign: per-CELL candidate-cluster
UNION sizes under SPATIALLY TILED lane->pixel assignment.

The round-2 sieve lost because a cell paid its worst LANE's candidate count
per bounce and the image-global cost-sorted assignment destroyed spatial
coherence (VERDICT round 2, weak #1).  The round-3 design visits the UNION
of the cell's candidate clusters with per-cell SCALAR table reads (cheap;
~60ns/cluster vs ~266ns for a per-lane one-hot fetch round), which works
iff the union stays small when a cell's rays come from one image tile.

This script traces real bounce distributions for final-one-weekend (same
simplified lambertian bouncer as cull_study.py), keeps the pixel->tile
association, then simulates steady-state cells: 1024 rays drawn from one
tile's ray pool at mixed bounce depths, reporting
  union   — |union over lanes of slab-plausible clusters|  (rounds the
            union sweep pays)
  lanemax — cell-max per-lane candidate count              (rounds a
            per-lane gather sweep would pay)
for tile sizes matching q=32 (240x135) and q=8 (120x68) cells, plus the
image-global mixing baseline (what round 2 measured).

Usage: python tools_dev/union_study.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np

from raytrace_tpu.models import compile_scene
from raytrace_tpu.scene_file import SceneFile

W, H = 1200, 675


def main():
    sf = SceneFile.load_json("/root/reference/assets/final-one-weekend.json")
    cs = compile_scene(sf, width=W, height=H)
    n = cs.num_spheres
    prefix = cs.sph_prefix
    G = 8

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
    print(f"S={n} prefix={prefix} C={C} clusters of G={G}")

    # ---- camera rays for every pixel of a few representative tiles
    cam = cs.cameras[cs.render.camera]
    from oracle_tracer import _look_at_rh, _perspective_rh

    eye = np.asarray(cam.eye, np.float64)
    view = _look_at_rh(eye, np.asarray(cam.look_at, np.float64),
                       np.asarray(cam.up, np.float64))
    proj = _perspective_rh(np.deg2rad(cam.fov_y_deg), W / H, cam.z_near,
                           cam.z_far)
    iv, ip = np.linalg.inv(view), np.linalg.inv(proj)

    # q=32 tiles: 5x5 grid of 240x135 over 1200x675.  Study 3 tiles:
    # center (hero spheres), mid-left (grid spheres), top-left (sky-heavy).
    tiles = {"center": (480, 270), "midleft": (0, 270), "topleft": (0, 0)}
    TW, TH = 240, 135

    rng = np.random.default_rng(7)

    def closest(o, d):
        best = np.full(o.shape[0], 1e4)
        bid = np.full(o.shape[0], -1)
        aa = (d * d).sum(-1)
        for i in range(n):
            oc = o - c[i]
            h = (d * oc).sum(-1)
            cc = (oc * oc).sum(-1) - r[i] ** 2
            disc = h * h - aa * cc
            sq = np.sqrt(np.maximum(disc, 0))
            t1 = (-h - sq) / aa
            t2 = (-h + sq) / aa
            ok = disc >= 0
            t = np.where(ok & (t1 > 1e-3) & (t1 < 1e4), t1,
                         np.where(ok & (t2 > 1e-3) & (t2 < 1e4), t2, 1e4))
            m = t < best
            best[m] = t[m]
            bid[m] = i
        return best, bid

    def prefix_bt(o, d):
        best = np.full(o.shape[0], 1e4)
        aa = (d * d).sum(-1)
        for i in range(prefix):
            oc = o - c[i]
            h = (d * oc).sum(-1)
            cc = (oc * oc).sum(-1) - r[i] ** 2
            disc = h * h - aa * cc
            sq = np.sqrt(np.maximum(disc, 0))
            t1 = (-h - sq) / aa
            t2 = (-h + sq) / aa
            ok = disc >= 0
            t = np.where(ok & (t1 > 1e-3) & (t1 < 1e4), t1,
                         np.where(ok & (t2 > 1e-3) & (t2 < 1e4), t2, 1e4))
            best = np.minimum(best, t)
        return best

    def plaus_clusters(o, d, btp):
        eps = 1e-12
        ivd = 1.0 / np.where(np.abs(d) < eps, np.where(d < 0, -eps, eps), d)
        a0 = (box_lo[None] - o[:, None]) * ivd[:, None]     # [m, C, 3]
        a1 = (box_hi[None] - o[:, None]) * ivd[:, None]
        te = np.minimum(a0, a1).max(-1)
        tx = np.maximum(a0, a1).min(-1)
        return (te <= tx) & (tx > 1e-3) & (te < btp[:, None])  # [m, C]

    all_pools = {}
    for name, (x0, y0) in tiles.items():
        xs = np.arange(x0, x0 + TW)
        ys = np.arange(y0, y0 + TH)
        xx, yy = np.meshgrid(xs, ys, indexing="xy")
        px = (xx.ravel() + 0.5) / W * 2 - 1
        py = (yy.ravel() + 0.5) / H * 2 - 1
        m0 = len(px)
        ndc = np.stack([px, py, np.ones(m0), np.ones(m0)], -1)
        t3 = (ndc @ ip.T)[:, :3]
        t3 /= np.linalg.norm(t3, axis=-1, keepdims=True)
        d = (np.concatenate([t3, np.zeros((m0, 1))], -1) @ iv.T)[:, :3]
        o = np.broadcast_to(eye, (m0, 3)).copy()
        pix = np.stack([xx.ravel(), yy.ravel()], -1)

        pool = []   # (o, d, pix_xy, level)
        for depth in range(6):
            bt, bid = closest(o, d)
            pool.append((o.copy(), d.copy(), pix.copy(),
                         np.full(len(o), depth)))
            hit = bid >= 0
            if depth >= 5 or not hit.any():
                break
            hp = o + bt[:, None] * d
            nrm = np.zeros_like(hp)
            for i in np.unique(bid[hit]):
                m = bid == i
                nrm[m] = (hp[m] - c[i]) / r[i]
            flip = (d * nrm).sum(-1) > 0
            nrm[flip] = -nrm[flip]
            a2 = np.where(np.abs(nrm[:, 0:1]) > 0.9, [0, 1, 0.], [1, 0, 0.])
            t1v = np.cross(nrm, a2)
            t1v /= np.linalg.norm(t1v, axis=-1, keepdims=True) + 1e-30
            t2v = np.cross(nrm, t1v)
            r1, r2 = rng.random(len(o)), rng.random(len(o))
            phi = 2 * np.pi * r1
            nd = (np.cos(phi)[:, None] * np.sqrt(r2)[:, None] * t1v
                  + np.sin(phi)[:, None] * np.sqrt(r2)[:, None] * t2v
                  + np.sqrt(1 - r2)[:, None] * nrm)
            o, d, pix = hp[hit], nd[hit], pix[hit]
        all_pools[name] = pool

    def cell_stats(o, d, pix, x0, y0, tw, th, n_draw=30):
        """Union + lane-max stats for 1024-ray cells drawn from the rays
        whose pixel lies in [x0,x0+tw) x [y0,y0+th)."""
        sel = ((pix[:, 0] >= x0) & (pix[:, 0] < x0 + tw)
               & (pix[:, 1] >= y0) & (pix[:, 1] < y0 + th))
        o, d = o[sel], d[sel]
        m = len(o)
        if m < 1024:
            return None
        btp = prefix_bt(o, d)
        pl = plaus_clusters(o, d, btp)                      # [m, C]
        cnt = pl.sum(1)
        unions, lanemaxs = [], []
        for _ in range(n_draw):
            idx = rng.choice(m, 1024, replace=False)
            unions.append(int(pl[idx].any(axis=0).sum()))
            lanemaxs.append(int(cnt[idx].max()))
        return (np.mean(unions), np.max(unions), np.mean(lanemaxs),
                float(cnt.mean()))

    for name, (x0, y0) in tiles.items():
        pool = all_pools[name]
        O = np.concatenate([p[0] for p in pool])
        D = np.concatenate([p[1] for p in pool])
        PX = np.concatenate([p[2] for p in pool])
        print(f"\ntile {name} ({x0},{y0}) rays={len(O)}")
        st = cell_stats(O, D, PX, x0, y0, TW, TH)
        if st:
            print(f"  q=32 tile 240x135: union mean {st[0]:6.1f} max {st[1]:3d}"
                  f" | lanemax mean {st[2]:5.1f} | cand/ray {st[3]:5.2f}")
        st = cell_stats(O, D, PX, x0, y0, TW // 2, TH // 2)
        if st:
            print(f"  q=8  tile 120x68 : union mean {st[0]:6.1f} max {st[1]:3d}"
                  f" | lanemax mean {st[2]:5.1f} | cand/ray {st[3]:5.2f}")
        st = cell_stats(O, D, PX, x0, y0, TW // 4, TH // 4)
        if st:
            print(f"  q=2  tile 60x34  : union mean {st[0]:6.1f} max {st[1]:3d}"
                  f" | lanemax mean {st[2]:5.1f} | cand/ray {st[3]:5.2f}")

    # image-global mixing baseline (what the round-2 snake assignment does)
    O = np.concatenate([p[0] for nm in tiles for p in all_pools[nm]])
    D = np.concatenate([p[1] for nm in tiles for p in all_pools[nm]])
    btp = prefix_bt(O, D)
    pl = plaus_clusters(O, D, btp)
    cnt = pl.sum(1)
    unions, lanemaxs = [], []
    for _ in range(30):
        idx = rng.choice(len(O), 1024, replace=False)
        unions.append(int(pl[idx].any(axis=0).sum()))
        lanemaxs.append(int(cnt[idx].max()))
    print(f"\nglobal-mix baseline: union mean {np.mean(unions):6.1f} max"
          f" {np.max(unions):3d} | lanemax mean {np.mean(lanemaxs):5.1f}"
          f" | cand/ray {cnt.mean():5.2f}")


if __name__ == "__main__":
    main()
