"""Offline study: expected gather-round counts under lane-balancing schemes.

A megakernel cell of 1024 lanes pays max-over-lanes candidate rounds per
iteration.  This sim reproduces the sieve's EXACT cluster pretest
(_sweep_sieve: bounding-sphere quadratic, disc >= -margin, exit in front,
entry before the running prefix bt) on real bounce-ray populations of
final-one-weekend, then evaluates, per simulated cell of 1024 randomly
grouped rays (the snake cost permutation mixes strata, ~random):

  none   — max(c_i)                       (shipped baseline)
  idle   — +64 pairing, adopt only when own count == 0, partner >= 4
           (KernelOptions balance="idle")
  pair   — ceil((c_i + c_j) / 2) per pair (balance="pair")
  quad   — ceil(sum_4 / 4) per 4-lane group (hypothetical 4-way split)
  ideal  — ceil(sum_1024 / 1024)           (perfect redistribution)

anti-* columns pair SORTED counts k with 1023-k (resp. quad ranks
k, 511-k, 512+k, 1023-k) — the best case for the snake layout's
anti-pair within-cell remap, which pairs by historical cost rank.

Measured conclusion (40k rays, box pretest): rand-pair 10.1 rounds,
anti-pair 8.1, anti-quad 5.8, ideal 3.2.  A 4-way in-kernel split was
REJECTED on this: quad doubles the packed mask words the round loop
scans (16 vs 8 at Cp=128) and turns every ray/accumulator select into a
4-way chain, ~+50% round cost against the -28% round count — net loss.

Usage: python tools_dev/balance_sim.py [n_pixels_sample] [scene.json]
(scene defaults to final-one-weekend; pass /tmp/stress-4x.json from
gen_stress.py for the S=1940 scaling prediction)

Round-3 layout study (pixel-identity-tracking variant of this sim):
COST-STRATIFIED cells (group similar-predicted-cost pixels per cell so
max ~= stratum mean) LOSE to anti-pair mixing at every prediction
quality — oracle predictor 3.69 vs 2.81 expected rounds, bounce-0-count
predictor 10.2 vs 6.0, random 12.5 vs 7.3.  Pairing exploits the
complementary tails it is given; stratification concentrates them.  The
shipped snake + anti-pair layout stands; with hist-quality prediction
expect ~6 rounds/cell on final-one-weekend (box pretest, G=4).
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
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    scene = (sys.argv[2] if len(sys.argv) > 2
             else "/root/reference/assets/final-one-weekend.json")
    sf = SceneFile.load_json(scene)
    cs = compile_scene(sf, width=1200, height=675)
    n = cs.num_spheres
    prefix = cs.sph_prefix
    from raytrace_tpu.models.sphere_order import effective_cluster_g

    # default to the G the kernel actually uses at this scene size (the
    # grouping is built for it — slicing kd-16 leaves into 4s is NOT what
    # the kernel does and reads ~2-3x worse than reality)
    G = int(os.environ.get("SIM_G", 0)) or effective_cluster_g(n - prefix)
    print(f"sim G = {G}")

    from raytrace_tpu.ops.spheres import world_sphere_tables

    tab = np.asarray(world_sphere_tables(cs, np.array([0.5], np.float32))[0])
    c = tab[:n, 0:3].astype(np.float64)
    r = np.abs(tab[:n, 3]).astype(np.float64)

    # cluster bounding spheres exactly as build_mega_tables builds them
    nloc = n - prefix
    C = -(-nloc // G)
    pad = C * G - nloc
    cl_c = np.concatenate([c[prefix:], np.zeros((pad, 3))]).reshape(C, G, 3)
    cl_r = np.concatenate([r[prefix:], np.full(pad, -1.0)]).reshape(C, G)
    valid = cl_r > 0
    mn = np.where(valid[..., None], cl_c - cl_r[..., None], 1e38).min(1)
    mx = np.where(valid[..., None], cl_c + cl_r[..., None], -1e38).max(1)
    bc = 0.5 * (mn + mx)
    dist = np.linalg.norm(cl_c - bc[:, None, :], axis=-1)
    br = np.where(valid, dist + cl_r, 0.0).max(1) * 1.0001 + 1e-5
    kc = (bc * bc).sum(1) - br * br

    # ---- bounce-ray populations (same bouncer as cull_study)
    rng = np.random.default_rng(3)
    cam = cs.cameras[cs.render.camera]
    from oracle_tracer import _look_at_rh, _perspective_rh

    eye = np.asarray(cam.eye, np.float64)
    view = _look_at_rh(eye, np.asarray(cam.look_at, np.float64),
                       np.asarray(cam.up, np.float64))
    proj = _perspective_rh(np.deg2rad(cam.fov_y_deg), 1200 / 675,
                           cam.z_near, cam.z_far)
    iv, ip = np.linalg.inv(view), np.linalg.inv(proj)
    u = rng.random(n_sample) * 2 - 1
    v = rng.random(n_sample) * 2 - 1
    ndc = np.stack([u, v, np.ones(n_sample), np.ones(n_sample)], -1)
    t3 = (ndc @ ip.T)[:, :3]
    t3 /= np.linalg.norm(t3, axis=-1, keepdims=True)
    d = (np.concatenate([t3, np.zeros((n_sample, 1))], -1) @ iv.T)[:, :3]
    o = np.broadcast_to(eye, (n_sample, 3)).copy()

    def closest(o, d, ids):
        best = np.full(o.shape[0], 1e4)
        bid = np.full(o.shape[0], -1)
        for i in ids:
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

    levels = []
    for depth in range(6):
        bt, bid = closest(o, d, range(n))
        levels.append((o.copy(), d.copy()))
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

    # ---- sieve pretest counts + balancing sims per level
    tot_w = 0.0
    agg = dict(none=0.0, idle=0.0, pair=0.0, quad=0.0, anti_pair=0.0,
               anti_quad=0.0, ideal=0.0)
    for lvl, (o, d) in enumerate(levels):
        m = len(o)
        a = (d * d).sum(-1)
        bt_pre, _ = closest(o, d, range(prefix))
        ddo = (d * o).sum(-1)
        osq = (o * o).sum(-1)
        cd = d @ bc.T                                  # [m, C]
        co2 = o @ bc.T
        h = ddo[:, None] - cd
        c2 = osq[:, None] - 2.0 * co2 + kc[None, :]
        hh = h * h
        ac2 = a[:, None] * c2
        disc = hh - ac2
        margin = 1e-4 * (hh + np.abs(ac2)) + 1e-8
        sq = np.sqrt(np.maximum(disc, 0.0))
        t1 = (-h - sq) / a[:, None]
        t2 = (-h + sq) / a[:, None]
        sel = (disc >= -margin) & (t2 > 1e-3) & (t1 < bt_pre[:, None]
                                                 * 1.0001 + 1e-4)
        cnt = sel.sum(1)

        # AABB slab pretest alternative (tighter than bounding spheres
        # for Morton runs of spheres; costs ~2x the VPU passes)
        eps = 1e-12
        ivd = 1.0 / np.where(np.abs(d) < eps,
                             np.where(d < 0, -eps, eps), d)
        a0 = (mn[None] - o[:, None]) * ivd[:, None]     # [m, C, 3]
        a1 = (mx[None] - o[:, None]) * ivd[:, None]
        te = np.minimum(a0, a1).max(-1)
        tx = np.maximum(a0, a1).min(-1)
        sel_box = (te <= tx) & (tx > 1e-3) & (te < bt_pre[:, None])
        cnt_box = sel_box.sum(1)
        # both tests AND-ed (sphere test is nearly free once the matmul
        # ran; the box test could run only on sphere-pass candidates)
        cnt_and = (sel & sel_box).sum(1)

        k = m // 1024 * 1024
        if k == 0:
            continue
        x = rng.permutation(cnt)[:k].reshape(-1, 1024).astype(np.int64)
        xs = np.sort(x, axis=1)  # perfect cost-rank correlation proxy
        anti_pair = (-(-(xs[:, :512] + xs[:, 512:][:, ::-1]) // 2)).max(1)
        anti_quad = (-(-(xs[:, :256] + xs[:, 256:512][:, ::-1]
                         + xs[:, 512:768] + xs[:, 768:][:, ::-1]) // 4)).max(1)
        rounds = {}
        rounds["none"] = x.max(1)
        ci, cj = x[:, :512], x[:, 512:]
        give = (ci == 0) & (cj >= 4)
        take = (cj == 0) & (ci >= 4)
        pi = np.where(give, (cj + 1) // 2, np.where(take, ci // 2, ci))
        pj = np.where(give, cj // 2, np.where(take, (ci + 1) // 2, cj))
        rounds["idle"] = np.maximum(pi, pj).max(1)
        rounds["pair"] = (-(-(ci + cj) // 2)).max(1)
        q = x.reshape(-1, 256, 4).sum(2)
        rounds["quad"] = (-(-q // 4)).max(1)
        rounds["anti_pair"] = anti_pair
        rounds["anti_quad"] = anti_quad
        rounds["ideal"] = -(-x.sum(1) // 1024)
        w = float(m)
        tot_w += w
        xb = rng.permutation(cnt_and)[:k].reshape(-1, 1024).astype(np.int64)
        bi, bj = xb[:, :512], xb[:, 512:]
        line = (f"bounce {lvl}: rays {m:6d} mean {cnt.mean():5.2f}"
                f" box {cnt_box.mean():5.2f} and {cnt_and.mean():5.2f}"
                f" | box-none {xb.max(1).mean():5.1f}"
                f" box-pair {(-(-(bi + bj) // 2)).max(1).mean():5.1f}"
                f" box-quad "
                f"{(-(-xb.reshape(-1, 256, 4).sum(2) // 4)).max(1).mean():5.1f}"
                f" box-ideal {float((-(-xb.sum(1) // 1024)).mean()):4.1f}")
        for kname in agg:
            mu = float(rounds[kname].mean())
            agg[kname] += w * mu
            line += f" | {kname} {mu:5.1f}"
        print(line)
    print("\nray-weighted expected cell rounds:")
    for kname, v in agg.items():
        print(f"  {kname:6s} {v / tot_w:6.2f}")


if __name__ == "__main__":
    main()
