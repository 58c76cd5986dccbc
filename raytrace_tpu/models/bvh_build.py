"""Host-side BVH construction (numpy).

The TPU-native replacement for the driver-built BLAS/TLAS of the reference
(raytracer/src/acceleration.rs): a single flat BVH over the *instance-
flattened world-space* triangle soup with

- Morton-ordered fixed-size leaves (L triangles each, contiguous after a
  global permutation of the soup → leaf reads are dense row gathers),
- an implicit complete binary tree (heap layout: children of i are 2i+1 and
  2i+2) whose internal nodes store BOTH children's AABBs, so one traversal
  step costs a single 16-float row gather,
- AABBs that conservatively bound the full shutter interval [0,1] for
  animated instances (sampled + epsilon-inflated), so motion blur needs NO
  per-batch refit at all: the device re-transforms vertices each batch
  (ops/transforms.py) while the tree topology and bounds stay frozen.

Build is fully vectorized numpy; a native C++ builder
(native/bvh_builder.cc) provides the same output faster for large scenes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .compile import CompiledScene
from .transform import quat_to_mat3, quat_slerp

BIG = np.float32(3.0e38)


@dataclass
class BVHData:
    """Host-built BVH.  `order` maps sorted-soup position → original soup row
    (apply it to every per-triangle array before upload).

    Two layouts share the [N, 16] node-row format:
    - mode "implicit": Morton-ordered complete binary tree; children of heap
      node i are 2i+1 / 2i+2, leaves are fixed runs of `leaf_size` rows.
    - mode "sah": binned-SAH tree from the native builder; rows carry
      explicit child links bitcast into float slots 12/13 (negative link =
      leaf encoding -(1 + (first << 5 | count)), count <= leaf_size).
    """

    order: np.ndarray        # [T_padded] int32 permutation (incl. padding rows)
    child_boxes: np.ndarray  # [N, 16]
    num_leaves: int          # K (power of two; implicit mode only)
    leaf_size: int           # L / leaf_max
    depth: int               # tree depth (root=0); stack bound for traversal
    mode: str = "implicit"
    root: int = 0            # sah root link


def _expand_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(np.uint64) & np.uint64(0x3FF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x030000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x0300F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x030C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x09249249)
    return v


def morton3(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """30-bit Morton code from [0,1]^3 coordinates."""
    q = lambda c: np.clip(c * 1024.0, 0, 1023).astype(np.uint64)
    return (_expand_bits(q(x)) << np.uint64(2)) | (_expand_bits(q(y)) << np.uint64(1)) | _expand_bits(q(z))


def _instance_matrix_at(inst_t0: np.ndarray, inst_t1: np.ndarray, t: float) -> np.ndarray:
    """[I,10] TRS pairs → [I,3,4] object-to-world at time t (host mirror of
    ops/transforms.interpolate_instances)."""
    I = inst_t0.shape[0]
    out = np.zeros((I, 3, 4), np.float64)
    for i in range(I):
        tr = (1 - t) * inst_t0[i, 0:3] + t * inst_t1[i, 0:3]
        q = quat_slerp(inst_t0[i, 3:7], inst_t1[i, 3:7], t)
        sc = (1 - t) * inst_t0[i, 7:10] + t * inst_t1[i, 7:10]
        m = quat_to_mat3(q) * sc[None, :]
        out[i, :, :3] = m
        out[i, :, 3] = tr
    return out


def world_triangle_bounds(cs: CompiledScene, time_samples: int = 9,
                          inflate: float = 1e-4):
    """Per-soup-row world AABBs, conservative over the shutter interval.

    Static scenes use a single sample.  Padding rows get EMPTY boxes
    (min=+BIG, max=-BIG) so traversal never descends into them.
    """
    T = cs.tri_p.shape[0]
    mn = np.full((T, 3), BIG, np.float32)
    mx = np.full((T, 3), -BIG, np.float32)

    times = np.linspace(0.0, 1.0, time_samples) if cs.any_animated else [0.0]
    n = cs.num_triangles
    tp = cs.tri_p[:n].astype(np.float64)          # [n,3,3] object space
    inst = cs.tri_inst[:n]

    for t in times:
        mats = _instance_matrix_at(cs.inst_t0, cs.inst_t1, float(t))  # [I,3,4]
        m = mats[inst]                              # [n,3,4]
        wp = np.einsum("tij,tvj->tvi", m[:, :, :3], tp) + m[:, None, :, 3]
        mn[:n] = np.minimum(mn[:n], wp.min(axis=1).astype(np.float32))
        mx[:n] = np.maximum(mx[:n], wp.max(axis=1).astype(np.float32))

    if cs.any_animated and len(times) > 1:
        # Guard against inter-sample bulge (slerp paths are not piecewise
        # linear): inflate by a fraction of the box diagonal + epsilon.
        diag = (mx[:n] - mn[:n])
        pad = inflate * np.maximum(diag, 1e-3)
        mn[:n] -= pad
        mx[:n] += pad
    return mn, mx


def build_bvh(cs: CompiledScene, leaf_size: int = 4,
              time_samples: int = 9) -> BVHData:
    mn, mx = world_triangle_bounds(cs, time_samples=time_samples)
    n = cs.num_triangles
    T = mn.shape[0]

    # Morton order over real triangles; padding rows stay at the tail.
    c = 0.5 * (mn[:n] + mx[:n])
    lo = c.min(axis=0)
    hi = c.max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)
    codes = morton3(*((c - lo) / ext).T)
    order_real = np.argsort(codes, kind="stable").astype(np.int64)

    L = leaf_size
    K_needed = -(-n // L)
    K = 1 << max(0, (K_needed - 1).bit_length())  # next power of two, >= 1
    total = K * L

    # Padding slots are marked -1; permute_soup materializes them as
    # all-zero (degenerate, never-hit) triangles.
    order = np.full(total, -1, np.int64)
    order[:n] = order_real

    smn = np.concatenate([mn[order_real], np.full((total - n, 3), BIG, np.float32)])
    smx = np.concatenate([mx[order_real], np.full((total - n, 3), -BIG, np.float32)])

    # Leaf AABBs.
    leaf_mn = smn.reshape(K, L, 3).min(axis=1)
    leaf_mx = smx.reshape(K, L, 3).max(axis=1)

    # Bottom-up union over the implicit tree: boxes[i], i in [0, 2K-1).
    node_mn = np.full((2 * K - 1, 3), BIG, np.float32)
    node_mx = np.full((2 * K - 1, 3), -BIG, np.float32)
    node_mn[K - 1:] = leaf_mn
    node_mx[K - 1:] = leaf_mx
    level_start = K - 1
    while level_start > 0:
        parent_start = (level_start - 1) // 2
        n_parents = level_start - parent_start
        c0 = np.arange(n_parents) * 2 + level_start
        node_mn[parent_start:level_start] = np.minimum(node_mn[c0], node_mn[c0 + 1])
        node_mx[parent_start:level_start] = np.maximum(node_mx[c0], node_mx[c0 + 1])
        level_start = parent_start

    # Internal nodes store both children's boxes: [K-1, 16].
    if K > 1:
        i = np.arange(K - 1)
        child_boxes = np.zeros((K - 1, 16), np.float32)
        child_boxes[:, 0:3] = node_mn[2 * i + 1]
        child_boxes[:, 3:6] = node_mx[2 * i + 1]
        child_boxes[:, 6:9] = node_mn[2 * i + 2]
        child_boxes[:, 9:12] = node_mx[2 * i + 2]
    else:
        child_boxes = np.zeros((0, 16), np.float32)

    return BVHData(
        order=order.astype(np.int32),
        child_boxes=child_boxes,
        num_leaves=K,
        leaf_size=L,
        depth=int(np.log2(K)) if K > 1 else 0,
    )


def build_bvh_sah(cs: CompiledScene, leaf_max: int = 8,
                  time_samples: int = 9) -> Optional[BVHData]:
    """Binned-SAH BVH via the native builder (native/bvh_builder.cc) over
    shutter-conservative world AABBs.  Returns None when the native library
    is unavailable (callers fall back to the Morton/implicit builder)."""
    import sys
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    try:
        from native import build_sah_bvh
    except ImportError:
        return None

    mn, mx = world_triangle_bounds(cs, time_samples=time_samples)
    n = cs.num_triangles
    out = build_sah_bvh(mn[:n], mx[:n], leaf_max=leaf_max)
    if out is None:
        return None
    rows, order_real, root, depth = out
    if rows.shape[0] == 0:  # single-leaf scene: no internal nodes
        rows = np.zeros((1, 16), np.float32)

    # Order padded with -1 rows to a multiple of 256 (degenerate padding).
    total = max(256, -(-n // 256) * 256)
    order = np.full(total, -1, np.int64)
    order[:n] = order_real
    return BVHData(
        order=order,
        child_boxes=rows,
        num_leaves=0,
        leaf_size=leaf_max,
        depth=depth,
        mode="sah",
        root=root,
    )


def permute_soup(cs: CompiledScene, bvh: BVHData) -> CompiledScene:
    """Reorder every per-triangle array into BVH leaf order.  The returned
    scene's soup has exactly num_leaves*leaf_size rows; padding slots
    (order == -1) become all-zero degenerate triangles."""
    import copy

    o = bvh.order
    pad = o < 0
    oc = np.clip(o, 0, cs.tri_p.shape[0] - 1)

    def take(a):
        out = a[oc]
        out[pad] = 0
        return out

    out = copy.copy(cs)
    out.tri_p = take(cs.tri_p)
    out.tri_n = take(cs.tri_n)
    out.tri_uv = take(cs.tri_uv)
    out.tri_inst = take(cs.tri_inst)
    out.tri_mat_type = take(cs.tri_mat_type)
    out.tri_mat_index = take(cs.tri_mat_index)
    if getattr(cs, "shade_rows", None) is not None:
        s_pad = cs.sph_center.shape[0]
        tri_rows = cs.shade_rows[s_pad:]
        new_tri_rows = tri_rows[np.clip(o, 0, tri_rows.shape[0] - 1)]
        new_tri_rows[pad] = 0
        out.shade_rows = np.concatenate([cs.shade_rows[:s_pad], new_tri_rows])
    return out
