"""Device BVH traversal: vectorized stack-based closest-hit over the
implicit binary tree built by models/bvh_build.py.

SIMT-style wavefront traversal: every ray advances one traversal step per
`lax.while_loop` iteration (internal-node step or leaf step, mask-selected);
finished rays idle until the whole wavefront converges.  One internal step
costs a single [16]-float row gather (both children's AABBs); one leaf step
costs an L-triangle dense gather (leaf triangles are contiguous after the
build permutation).

Node id encoding: internal nodes are heap ids 0..K-2; ids >= K-1 are leaves
(leaf index = id - (K-1)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .intersect import Hit, T_MAX, T_MIN, moller_trumbore

SENTINEL = jnp.int32(-1)


class BVHArrays(NamedTuple):
    child_boxes: jnp.ndarray  # [K-1, 16]
    # world-space leaf triangle data, [K*L, 3] each (rebuilt per batch):
    v0: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray


def pack_world_tris(world_p):
    """[T,3,3] world vertices → (v0, e1, e2) rows for leaf tests."""
    v0 = world_p[:, 0, :]
    e1 = world_p[:, 1, :] - v0
    e2 = world_p[:, 2, :] - v0
    return v0, e1, e2


def _slab_test(o, inv_d, box_mn, box_mx, t_best):
    """Ray-AABB slab test.  Returns (hit, t_near)."""
    t0 = (box_mn - o) * inv_d
    t1 = (box_mx - o) * inv_d
    tmn = jnp.minimum(t0, t1)
    tmx = jnp.maximum(t0, t1)
    t_enter = jnp.maximum(jnp.max(tmn, axis=-1), T_MIN)
    t_exit = jnp.min(tmx, axis=-1)
    hit = (t_enter <= t_exit) & (t_enter <= t_best)
    return hit, t_enter


def traverse(bvh: BVHArrays, num_leaves: int, leaf_size: int, stack_depth: int,
             o, d, active=None, t_min=T_MIN, t_max=T_MAX) -> Hit:
    """Closest-hit traversal for rays o, d: [R,3].  Returns Hit with `tri`
    indices into the PERMUTED soup."""
    R = o.shape[0]
    K = num_leaves
    L = leaf_size

    inv_d = jnp.where(d == 0.0, jnp.float32(1e30), 1.0 / jnp.where(d == 0.0, 1.0, d))

    if K == 1:
        # Single leaf: brute-force the L triangles.
        t, u, v, valid = moller_trumbore(
            o[:, None, :], d[:, None, :],
            bvh.v0[None, :, :], bvh.e1[None, :, :], bvh.e2[None, :, :],
            t_min, t_max,
        )
        t = jnp.where(valid, t, t_max)
        arg = jnp.argmin(t, axis=1)
        rows = jnp.arange(R)
        tc = t[rows, arg]
        hit_any = tc < t_max
        out = Hit(
            t=tc,
            tri=jnp.where(hit_any, arg.astype(jnp.int32), -1),
            u=u[rows, arg],
            v=v[rows, arg],
        )
        if active is not None:
            out = Hit(
                t=jnp.where(active, out.t, t_max),
                tri=jnp.where(active, out.tri, -1),
                u=out.u, v=out.v,
            )
        return out

    class TState(NamedTuple):
        node: jnp.ndarray    # [R] current node id (or SENTINEL when done)
        stack: jnp.ndarray   # [R, S]
        sp: jnp.ndarray      # [R]
        t: jnp.ndarray
        tri: jnp.ndarray
        u: jnp.ndarray
        v: jnp.ndarray

    if active is None:
        start = jnp.zeros((R,), jnp.int32)
    else:
        start = jnp.where(active, 0, SENTINEL).astype(jnp.int32)

    init = TState(
        node=start,
        stack=jnp.zeros((R, stack_depth), jnp.int32),
        sp=jnp.zeros((R,), jnp.int32),
        t=jnp.full((R,), t_max, jnp.float32),
        tri=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
    )

    leaf_offsets = jnp.arange(L, dtype=jnp.int32)

    def cond(s: TState):
        return jnp.any(s.node != SENTINEL)

    def body(s: TState) -> TState:
        running = s.node != SENTINEL
        is_leaf = running & (s.node >= K - 1)
        is_internal = running & ~is_leaf

        # ---------------- internal step: test both children
        ni = jnp.clip(s.node, 0, K - 2)
        cb = bvh.child_boxes[ni]                      # [R,16]
        hit0, t0 = _slab_test(o, inv_d, cb[:, 0:3], cb[:, 3:6], s.t)
        hit1, t1 = _slab_test(o, inv_d, cb[:, 6:9], cb[:, 9:12], s.t)
        c0 = 2 * s.node + 1
        c1 = 2 * s.node + 2
        near_is_0 = t0 <= t1
        near = jnp.where(near_is_0, c0, c1)
        far = jnp.where(near_is_0, c1, c0)
        both = hit0 & hit1
        one_hit = hit0 ^ hit1
        only = jnp.where(hit0, c0, c1)

        next_internal = jnp.where(both, near, jnp.where(one_hit, only, SENTINEL))
        do_push = is_internal & both
        stack = jnp.where(
            (jnp.arange(init.stack.shape[1])[None, :] == s.sp[:, None]) & do_push[:, None],
            far[:, None],
            s.stack,
        )
        sp_after_push = s.sp + do_push.astype(jnp.int32)

        # ---------------- leaf step: test L contiguous triangles
        leaf = jnp.clip(s.node - (K - 1), 0, K - 1)
        rows = leaf[:, None] * L + leaf_offsets[None, :]      # [R,L]
        lv0 = bvh.v0[rows]                                     # [R,L,3]
        le1 = bvh.e1[rows]
        le2 = bvh.e2[rows]
        lt, lu, lv, lvalid = moller_trumbore(
            o[:, None, :], d[:, None, :], lv0, le1, le2, t_min, t_max
        )
        lt = jnp.where(lvalid & (lt < s.t[:, None]), lt, t_max)
        larg = jnp.argmin(lt, axis=1)
        r_idx = jnp.arange(R)
        lt_best = lt[r_idx, larg]
        better = is_leaf & (lt_best < s.t)
        new_t = jnp.where(better, lt_best, s.t)
        new_tri = jnp.where(better, rows[r_idx, larg], s.tri)
        new_u = jnp.where(better, lu[r_idx, larg], s.u)
        new_v = jnp.where(better, lv[r_idx, larg], s.v)

        # ---------------- advance: leaves (and dead-end internals) pop
        needs_pop = is_leaf | (is_internal & (next_internal == SENTINEL))
        can_pop = needs_pop & (sp_after_push > 0)
        sp_new = sp_after_push - can_pop.astype(jnp.int32)
        popped = jnp.take_along_axis(
            stack, jnp.clip(sp_new, 0, stack_depth - 1)[:, None], axis=1
        )[:, 0]

        node_new = jnp.where(
            is_internal & (next_internal != SENTINEL),
            next_internal,
            jnp.where(can_pop, popped, SENTINEL),
        )
        node_new = jnp.where(running, node_new, SENTINEL)

        return TState(
            node=node_new, stack=stack, sp=sp_new,
            t=new_t, tri=new_tri, u=new_u, v=new_v,
        )

    final = jax.lax.while_loop(cond, body, init)
    return Hit(t=final.t, tri=final.tri, u=final.u, v=final.v)


def traverse_sah(bvh: BVHArrays, root: int, leaf_max: int, stack_depth: int,
                 o, d, active=None, t_min=T_MIN, t_max=T_MAX) -> Hit:
    """Closest-hit traversal of the explicit-link SAH tree
    (native/bvh_builder.cc layout).

    Node row: [c0.min, c0.max, c1.min, c1.max, bits(link0), bits(link1),
    pad, pad]; link < 0 encodes a leaf as -(1 + (first << 5 | count)).
    One [16]-float row gather per internal step; leaves test up to
    `leaf_max` contiguous triangles.
    """
    R = o.shape[0]
    N = bvh.child_boxes.shape[0]

    inv_d = jnp.where(d == 0.0, jnp.float32(1e30),
                      1.0 / jnp.where(d == 0.0, 1.0, d))

    class TState(NamedTuple):
        link: jnp.ndarray    # [R] current link (SENTINEL_DONE when finished)
        stack: jnp.ndarray   # [R, S]
        sp: jnp.ndarray      # [R]
        t: jnp.ndarray
        tri: jnp.ndarray
        u: jnp.ndarray
        v: jnp.ndarray

    DONE = jnp.int32(-2147483647)  # distinct from any leaf encoding

    if active is None:
        start = jnp.full((R,), root, jnp.int32)
    else:
        start = jnp.where(active, jnp.int32(root), DONE)

    init = TState(
        link=start,
        stack=jnp.zeros((R, stack_depth), jnp.int32),
        sp=jnp.zeros((R,), jnp.int32),
        t=jnp.full((R,), t_max, jnp.float32),
        tri=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
    )

    leaf_offsets = jnp.arange(leaf_max, dtype=jnp.int32)
    r_idx = jnp.arange(R)

    def cond(s: TState):
        return jnp.any(s.link != DONE)

    def body(s: TState) -> TState:
        running = s.link != DONE
        is_leaf = running & (s.link < 0)
        is_internal = running & (s.link >= 0)

        # ---- internal: one row gather, both child slabs
        ni = jnp.clip(s.link, 0, N - 1)
        row = bvh.child_boxes[ni]                       # [R,16]
        hit0, t0 = _slab_test(o, inv_d, row[:, 0:3], row[:, 3:6], s.t)
        hit1, t1 = _slab_test(o, inv_d, row[:, 6:9], row[:, 9:12], s.t)
        links = jax.lax.bitcast_convert_type(row[:, 12:14], jnp.int32)  # [R,2]
        c0, c1 = links[:, 0], links[:, 1]
        near_is_0 = t0 <= t1
        near = jnp.where(near_is_0, c0, c1)
        far = jnp.where(near_is_0, c1, c0)
        both = hit0 & hit1
        one_hit = hit0 ^ hit1
        only = jnp.where(hit0, c0, c1)
        nxt = jnp.where(both, near, jnp.where(one_hit, only, DONE))
        do_push = is_internal & both
        stack = jnp.where(
            (jnp.arange(stack_depth)[None, :] == s.sp[:, None]) & do_push[:, None],
            far[:, None],
            s.stack,
        )
        sp_after = s.sp + do_push.astype(jnp.int32)

        # ---- leaf: decode range, test count triangles
        enc = -(s.link + 1)
        first = jnp.where(is_leaf, enc >> 5, 0)
        count = jnp.where(is_leaf, enc & 31, 0)
        rows_t = first[:, None] + leaf_offsets[None, :]  # [R,L]
        rows_t = jnp.clip(rows_t, 0, bvh.v0.shape[0] - 1)
        lt, lu, lv, lvalid = moller_trumbore(
            o[:, None, :], d[:, None, :],
            bvh.v0[rows_t], bvh.e1[rows_t], bvh.e2[rows_t], t_min, t_max,
        )
        in_range = leaf_offsets[None, :] < count[:, None]
        lt = jnp.where(lvalid & in_range & (lt < s.t[:, None]), lt, t_max)
        larg = jnp.argmin(lt, axis=1)
        lt_best = lt[r_idx, larg]
        better = is_leaf & (lt_best < s.t)
        new_t = jnp.where(better, lt_best, s.t)
        new_tri = jnp.where(better, rows_t[r_idx, larg], s.tri)
        new_u = jnp.where(better, lu[r_idx, larg], s.u)
        new_v = jnp.where(better, lv[r_idx, larg], s.v)

        # ---- advance
        needs_pop = is_leaf | (is_internal & (nxt == DONE))
        can_pop = needs_pop & (sp_after > 0)
        sp_new = sp_after - can_pop.astype(jnp.int32)
        popped = jnp.take_along_axis(
            stack, jnp.clip(sp_new, 0, stack_depth - 1)[:, None], axis=1
        )[:, 0]
        link_new = jnp.where(
            is_internal & (nxt != DONE), nxt,
            jnp.where(can_pop, popped, DONE),
        )
        link_new = jnp.where(running, link_new, DONE)

        return TState(link=link_new, stack=stack, sp=sp_new,
                      t=new_t, tri=new_tri, u=new_u, v=new_v)

    final = jax.lax.while_loop(cond, body, init)
    return Hit(t=final.t, tri=final.tri, u=final.u, v=final.v)


def make_bvh_trace_fn(child_boxes, num_leaves: int, leaf_size: int,
                      stack_depth: int, world_p):
    """Build a trace function over per-batch world-space leaf triangles."""
    v0, e1, e2 = pack_world_tris(world_p)
    arrays = BVHArrays(child_boxes=child_boxes, v0=v0, e1=e1, e2=e2)

    def trace(o, d, alive):
        return traverse(
            arrays, num_leaves, leaf_size, stack_depth, o, d, active=alive
        )

    return trace
