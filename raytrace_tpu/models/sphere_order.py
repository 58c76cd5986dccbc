"""Spatial sphere ordering for the cluster-selective sweep.

The megakernel's sub-linear sphere path (ops/megakernel._sweep_selective)
sweeps a small "global" prefix densely, then traverses tight fixed-size
clusters of the remaining spheres per lane, nearest-first.  Cluster
tightness is what makes the pruning work, so compile_scene reorders the
sphere block:

  [ global prefix: spheres too large to cluster, original order ]
  [ local spheres in greedy nearest-neighbour groups of G, groups  ]
  [ emitted in isotropic-Morton order of their centroids           ]

The role matches the reference's driver-built BVH over sphere BLASes
(acceleration.rs:37-80) — proximity in the table replaces proximity in a
tree.  The permutation is image-invariant: sphere ids are internal, every
per-sphere array (tables, shading rows, instance ids) is permuted
consistently.
"""

from __future__ import annotations

import os

import numpy as np


def _morton3(q: np.ndarray) -> np.ndarray:
    """[N,3] uint32 coords (10 bits each) -> interleaved Morton codes."""

    def spread(x):
        x = x.astype(np.uint64) & np.uint64(0x3FF)
        x = (x | (x << np.uint64(16))) & np.uint64(0x30000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x30C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x9249249)
        return x

    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def sphere_cluster_order(centers, radii, insts, inst_t0, inst_t1,
                         num_spheres: int, big_factor: float = 3.0):
    """Permutation + prefix split for the sphere block.

    centers/radii/insts: unpadded [n] object-space sphere data.
    Returns (perm [n] int array over the REAL spheres, n_prefix) or
    (None, 0) when ordering can't help (few spheres).
    """
    n = num_spheres
    if n < 96:
        return None, 0

    from .bvh_build import _instance_matrix_at

    mats = _instance_matrix_at(inst_t0, inst_t1, 0.5)     # [I,3,4] f64
    m = mats[np.asarray(insts[:n])]
    rot = m[:, :, :3]
    scale = np.linalg.norm(rot, axis=1)                    # [n,3] column norms
    c_w = np.einsum("sij,sj->si", rot, np.asarray(centers[:n], np.float64))
    c_w = c_w + m[:, :, 3]
    r_w = scale.max(axis=1) * np.asarray(radii[:n], np.float64)

    med = np.median(r_w)
    big = r_w > big_factor * max(med, 1e-30)
    if (~big).sum() < 64:
        return None, 0

    local = np.where(~big)[0]
    # Group at the G the sweep will use.  MEGA_G (the KernelOptions env
    # override, options.py) is honored here because grouping happens at
    # compile time: a constructor-level cluster_g override after compile
    # keeps the default-G grouping (clusters then merge/split greedy
    # groups — correct, just less tight).
    g0 = int(os.environ.get("MEGA_G", _GROUP) or _GROUP)
    if g0 <= 0:
        g0 = _GROUP
    order = local[_group_order(c_w[local],
                               effective_cluster_g(len(local), g0))]

    perm = np.concatenate([np.where(big)[0], order]).astype(np.int32)
    return perm, int(big.sum())


#: default spheres per greedy group (KernelOptions.cluster_g's default)
_GROUP = 4


def effective_cluster_g(n_local: int, g0: int = _GROUP) -> int:
    """The G the gather sweep will actually use: megakernel.make_config
    doubles cluster_g until the cluster count fits the 128-wide gather
    table.  The greedy grouping below groups at this size directly —
    measured half-surface-area 3135 vs 6656 at S=1940 (G=16) compared to
    merging four greedy-4 groups."""
    G = g0
    while -(-n_local // G) > 128 and G < 64:
        G *= 2
    return G


def _iso_morton_codes(pts: np.ndarray) -> np.ndarray:
    """Morton codes with ISOTROPIC quantization (one scale for all axes).

    Per-axis spans stretch a thin axis (e.g. the one-weekend grid's
    y-jitter) across the full 10-bit range, so its noise dominates the
    interleave and clusters group by jitter instead of x/z proximity —
    measured 2.63 vs 2.09 mean box-pretest candidates per bounce ray."""
    q = pts - pts.min(axis=0)
    q = np.clip(q / max(float(q.max()), 1e-12) * 1023.0, 0.0, 1023.0)
    return _morton3(q.astype(np.uint32))


def _group_order(c_w: np.ndarray, group: int = _GROUP) -> np.ndarray:
    """Greedy nearest-neighbour grouping of world centers.

    Seeds sweep ascending x; each group takes the seed plus its group-1
    nearest unused centers, and groups are emitted in Morton order of
    their centroids.  Cluster AABBs from these groups carry ~3x less
    half-surface-area than consecutive-Morton-run clusters (574 vs 1795
    on final-one-weekend), which the box pretest turns into 2.63 -> 1.17
    mean candidate clusters per bounce ray — a direct cut to the
    candidate-round count that dominates the sweep.  O(n^2/G) distance
    passes; above the guard size, fall back to plain isotropic Morton."""
    n = len(c_w)
    if n > 20000:
        return np.argsort(_iso_morton_codes(c_w), kind="stable")
    used = np.zeros(n, bool)
    groups = []
    for s in np.argsort(c_w[:, 0], kind="stable"):
        if used[s]:
            continue
        used[s] = True
        grp = [s]
        k = min(group - 1, int((~used).sum()))
        if k > 0:
            dd = np.linalg.norm(c_w - c_w[s], axis=1)
            dd[used] = np.inf
            nn = np.argpartition(dd, k - 1)[:k]
            nn = nn[np.argsort(dd[nn], kind="stable")]
            for j in nn:
                used[j] = True
                grp.append(j)
        groups.append(grp)
    # The (at most one) partial group must stay LAST: clusters are
    # consecutive runs of G in the emitted order, so a short group
    # anywhere else shifts every later group off its cluster boundary
    # and re-inflates the AABBs this grouping exists to shrink.
    partial = [g for g in groups if len(g) < group]
    groups = [g for g in groups if len(g) == group]
    gc = np.array([c_w[g].mean(axis=0) for g in groups])
    go = np.argsort(_iso_morton_codes(gc), kind="stable")
    return np.concatenate(
        [np.asarray(groups[gi]) for gi in go]
        + [np.asarray(g) for g in partial])


def apply_sphere_order(cs) -> None:
    """Reorder the sphere block of a CompiledScene in place (pre-shade_rows).

    Sets cs.sph_prefix; a no-op (prefix 0) for scenes the selective sweep
    won't take.
    """
    perm, n_prefix = sphere_cluster_order(
        cs.sph_center, cs.sph_radius, cs.sph_inst, cs.inst_t0, cs.inst_t1,
        cs.num_spheres,
    )
    if perm is None:
        cs.sph_prefix = 0
        return
    n = cs.num_spheres
    for name in ("sph_center", "sph_radius", "sph_inst",
                 "sph_mat_type", "sph_mat_index"):
        a = getattr(cs, name)
        a[:n] = a[:n][perm]
    if cs.shade_rows is not None:
        cs.shade_rows[:n] = cs.shade_rows[:n][perm]
    cs.sph_prefix = n_prefix
