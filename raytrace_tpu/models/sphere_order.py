"""Spatial sphere ordering for the cluster-selective sweep.

The megakernel's sub-linear sphere path (ops/megakernel._sweep_selective)
sweeps a small "global" prefix densely, then traverses tight fixed-size
clusters of the remaining spheres per lane, nearest-first.  Cluster
tightness is what makes the pruning work, so compile_scene reorders the
sphere block:

  [ global prefix: spheres too large to cluster, original order ]
  [ local spheres in Morton order of their world-space centers  ]

The role matches the reference's driver-built BVH over sphere BLASes
(acceleration.rs:37-80) — proximity in the table replaces proximity in a
tree.  The permutation is image-invariant: sphere ids are internal, every
per-sphere array (tables, shading rows, instance ids) is permuted
consistently.
"""

from __future__ import annotations

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
    lo = c_w[local].min(axis=0)
    hi = c_w[local].max(axis=0)
    span = np.maximum(hi - lo, 1e-12)
    q = np.clip(((c_w[local] - lo) / span) * 1023.0, 0.0, 1023.0)
    codes = _morton3(q.astype(np.uint32))
    order = local[np.argsort(codes, kind="stable")]

    perm = np.concatenate([np.where(big)[0], order]).astype(np.int32)
    return perm, int(big.sum())


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
