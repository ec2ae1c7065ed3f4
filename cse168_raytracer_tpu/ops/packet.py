"""Packet BVH traversal — LEGACY XLA formulation, kept for A/B.

Superseded as the TPU default by the Pallas kernels (ops/pallas_bvh:
pallas_sah4 / pallas_hbm — see PERF.md's lever ledger; this tile-packet
XLA scan lost its A/B because a lax.while_loop advances EVERY tile each
iteration, so all tiles pay the worst straggler). Retained as a
working alternative formulation and comparison baseline
(attach_accel(kind="packet")).

The reference traverses its SAH BVH per ray with SSE 4-triangle leaf
packets (BVH.cpp:438-658). A literal per-ray tree walk is hostile to
TPU: every node visit is a per-ray gather, and XLA's gather costs
~10 ns/row — measured 2.6 ms for a 262k-row gather on v5e, ~60x the
cost of the same bytes streamed. ops/bvh.py implements that walk anyway
(it is the exact-counter / validation path); this module implements the
TPU-native form:

  * rays are grouped into TILES of T rays (camera tiles are spatially
    coherent — the same coherence the reference's packets exploit);
  * each TILE owns ONE traversal stack; a node is visited when ANY ray
    in the tile can hit it closer than the tile's worst current best-t
    (conservative tile-level early-out);
  * all per-iteration memory traffic is per-tile, not per-ray: one
    12-float cbox row and one leaf row per tile per step — gathers of
    #tiles rows (cheap) instead of #rays rows (ruinous);
  * leaf packets hold K triangles in the Pluecker matmul layout
    (models/geometry.py TrianglePack docstring), so a leaf visit is a
    (T, 6) @ (6, 3K) MXU matmul per tile — the reference's SSE leaf
    cache idea (BVH.cpp:91-166) at systolic-array width.

The tree itself is the same implicit complete binary tree over
Morton-ordered leaf blocks as ops/bvh.py (see build notes there), just
with larger leaves.

Tuning knobs: tile T (default 128 = one VREG of rays) and leaf K
(default 32). Larger K trades tree depth for MXU work; larger T trades
tile coherence for fewer tiles.

Traversal inputs are gradient-stopped (ops/intersect.py detach_tri_hit
rationale): hit selection is discrete, surface math is recomputed
differentiably downstream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cse168_raytracer_tpu.config import EPSILON, MIRO_TMAX
from cse168_raytracer_tpu.models.geometry import TrianglePack
from cse168_raytracer_tpu.ops.bvh import (_FAR, TraversalStats,
                                          _build_cbox, _leaf_boxes)
from cse168_raytracer_tpu.ops.intersect import (_BIG, _DEN_TINY, PRIM_NONE,
                                                PRIM_TRI, Hit, _ray4, _ray6)


class PacketAccel(NamedTuple):
    """Implicit BVH with MXU-shaped leaf packets."""
    cbox: jax.Array      # (max(P-1,1), 12) f32 [lo_L, hi_L, lo_R, hi_R]
    leaf_w6: jax.Array   # (L, 6, 3K) f32 Pluecker numerator operand
    leaf_w4: jax.Array   # (L, 4, K) f32 t-numerator operand
    n_internal: int
    n_leaves: int
    leaf_size: int
    stack_depth: int
    tile: int            # rays per traversal tile


def _packet_flatten(b: PacketAccel):
    return (b.cbox, b.leaf_w6, b.leaf_w4), (
        b.n_internal, b.n_leaves, b.leaf_size, b.stack_depth, b.tile)


def _packet_unflatten(aux, children):
    return PacketAccel(*children, *aux)


jax.tree_util.register_pytree_node(PacketAccel, _packet_flatten,
                                   _packet_unflatten)


def build_packet_accel(pack: TrianglePack, leaf_size: int = 32,
                       tile: int = 128) -> PacketAccel:
    """Build for a Morton-ORDERED pack (see ops/accel.attach_accel)."""
    leaf_lo, leaf_hi, n_leaves = _leaf_boxes(pack, leaf_size)
    cbox, n_internal, stack_depth = _build_cbox(leaf_lo, leaf_hi)
    # leaf matmul operands, sliced straight out of the pack layout
    w6 = np.asarray(pack.w6)                     # (6, T, 3)
    w4 = np.asarray(pack.w4)                     # (4, T)
    k = leaf_size
    leaf_w6 = (w6.reshape(6, n_leaves, k * 3)
               .transpose(1, 0, 2))              # (L, 6, 3K)
    leaf_w4 = (w4.reshape(4, n_leaves, k)
               .transpose(1, 0, 2))              # (L, 4, K)
    return PacketAccel(cbox=jnp.asarray(cbox, jnp.float32),
                       leaf_w6=jnp.asarray(leaf_w6, jnp.float32),
                       leaf_w4=jnp.asarray(leaf_w4, jnp.float32),
                       n_internal=int(n_internal), n_leaves=int(n_leaves),
                       leaf_size=int(leaf_size), stack_depth=int(stack_depth),
                       tile=int(tile))


def _slab2_tiles(o, d_rcp, cb, tmin, tmax):
    """Slab both children per tile. o/d_rcp: (NT, T, 3); cb: (NT, 12);
    tmin/tmax: (NT, T). Returns per-tile (t_enter_min, any_hit) x2."""
    def one(lo, hi):
        t0 = (lo[:, None, :] - o) * d_rcp
        t1 = (hi[:, None, :] - o) * d_rcp
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        tn = jnp.where(jnp.isnan(tn), -jnp.inf, tn)
        tf = jnp.where(jnp.isnan(tf), jnp.inf, tf)
        enter = jnp.maximum(jnp.max(tn, axis=-1), tmin)    # (NT, T)
        exit_ = jnp.minimum(jnp.min(tf, axis=-1), tmax)
        hit = enter <= exit_                                # (NT, T)
        enter_min = jnp.min(jnp.where(hit, enter, jnp.inf), axis=-1)
        return enter_min, jnp.any(hit, axis=-1)
    tl, hl = one(cb[:, 0:3], cb[:, 3:6])
    tr, hr = one(cb[:, 6:9], cb[:, 9:12])
    return tl, hl, tr, hr


def packet_closest_hit_triangles(accel: PacketAccel, o: jax.Array,
                                 d: jax.Array, tmin, tmax,
                                 collect_stats: bool = False,
                                 any_hit: bool = False):
    """Tile-packet traversal. o, d: (N, 3); rays are split into tiles of
    accel.tile consecutive rays (callers provide coherent ray order).

    Returns Hit over all N rays (prim_id = Morton pack row); with
    collect_stats also TraversalStats where tri_tests counts K per ray
    per visited leaf (each ray in the tile is really tested against the
    whole packet — the honest number for this traversal)."""
    accel, o, d, tmin, tmax = jax.lax.stop_gradient(
        (accel, o, d, tmin, tmax))
    n = o.shape[0]
    t = accel.tile
    k = accel.leaf_size
    ni = accel.n_internal
    nl = accel.n_leaves
    s = accel.stack_depth

    tmin = jnp.broadcast_to(jnp.asarray(tmin, o.dtype), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, o.dtype), (n,))

    nt = -(-n // t)
    n_pad = nt * t

    def pad(x, fill):
        if n_pad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)])

    o_t = pad(o, 0.0).reshape(nt, t, 3)
    d_t = pad(d, 1.0).reshape(nt, t, 3)
    tmin_t = pad(tmin, 0.0).reshape(nt, t)
    tmax_t = pad(tmax, -1.0).reshape(nt, t)   # pad rays: empty interval

    d_rcp = 1.0 / d_t
    r6 = _ray6(o_t, d_t)                       # (NT, T, 6)
    r4 = _ray4(o_t)                            # (NT, T, 4)

    stack_i0 = jnp.zeros((nt, s), jnp.int32)
    stack_t0 = jnp.zeros((nt, s), jnp.float32)
    live_tile = jnp.any(tmax_t >= tmin_t, axis=-1)
    sp0 = live_tile.astype(jnp.int32)
    best_t0 = jnp.full((nt, t), _BIG)
    best_id0 = jnp.zeros((nt, t), jnp.int32)
    col = jnp.arange(s)[None, :]

    def cond(state):
        _si, _st, sp, _bt, _bi, _nv, _tt = state
        return jnp.any(sp > 0)

    def body(state):
        stack_i, stack_t, sp, best_t, best_id, nv, tt = state
        active = sp > 0
        spm = jnp.maximum(sp - 1, 0)
        node = jnp.take_along_axis(stack_i, spm[:, None], axis=1)[:, 0]
        ten = jnp.take_along_axis(stack_t, spm[:, None], axis=1)[:, 0]
        sp = spm

        cur_tmax = jnp.minimum(tmax_t, best_t)             # (NT, T)
        tile_far = jnp.max(cur_tmax, axis=-1)              # (NT,)
        process = active & (ten <= tile_far)
        is_leaf = node >= ni
        do_int = process & ~is_leaf
        do_leaf = process & is_leaf

        # ---- internal ----
        ci = jnp.clip(node, 0, max(ni - 1, 0))
        cb = accel.cbox[ci]                                # (NT, 12)
        tl, hl, tr, hr = _slab2_tiles(o_t, d_rcp, cb, tmin_t, cur_tmax)
        hl = hl & do_int
        hr = hr & do_int
        l_near = tl <= tr
        near_i = jnp.where(l_near, 2 * node + 1, 2 * node + 2)
        far_i = jnp.where(l_near, 2 * node + 2, 2 * node + 1)
        near_t = jnp.where(l_near, tl, tr)
        far_t = jnp.where(l_near, tr, tl)
        near_h = jnp.where(l_near, hl, hr)
        far_h = jnp.where(l_near, hr, hl)

        def push(si, st, sp, idx, tv, mask):
            # iota-mask write (measured ~100x cheaper than scatter)
            at = (col == jnp.where(mask, sp, -1)[:, None])
            si = jnp.where(at, idx[:, None], si)
            st = jnp.where(at, tv[:, None].astype(st.dtype), st)
            return si, st, sp + mask.astype(jnp.int32)

        stack_i, stack_t, sp = push(stack_i, stack_t, sp,
                                    far_i, far_t, far_h)
        stack_i, stack_t, sp = push(stack_i, stack_t, sp,
                                    near_i, near_t, near_h)

        # ---- leaf: (T,6)@(6,3K) + (T,4)@(4,K) per tile ----
        leaf = jnp.clip(node - ni, 0, max(nl - 1, 0))
        w6b = accel.leaf_w6[leaf]                          # (NT, 6, 3K)
        w4b = accel.leaf_w4[leaf]                          # (NT, 4, K)
        nums = jax.lax.dot_general(
            r6, w6b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (NT, T, 3K)
        nums = nums.reshape(nt, t, k, 3)
        t_num = jax.lax.dot_general(
            r4, w4b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (NT, T, K)
        den = nums[..., 2]
        safe_den = jnp.where(jnp.abs(den) < _DEN_TINY, 1.0, den)
        inv_den = 1.0 / safe_den
        beta = nums[..., 0] * inv_den
        gamma = nums[..., 1] * inv_den
        tt_hit = t_num * inv_den
        ok = ((beta >= -EPSILON) & (gamma >= -EPSILON)
              & (beta + gamma <= 1.0 + EPSILON)
              & (tt_hit >= tmin_t[..., None])
              & (tt_hit <= cur_tmax[..., None])
              & (jnp.abs(den) >= _DEN_TINY))
        tm = jnp.where(ok, tt_hit, _BIG)
        lt = jnp.min(tm, axis=-1)                          # (NT, T)
        lj = jnp.argmin(tm, axis=-1).astype(jnp.int32)
        better = do_leaf[:, None] & (lt < best_t)
        best_t = jnp.where(better, lt, best_t)
        best_id = jnp.where(better, leaf[:, None] * k + lj, best_id)
        if any_hit:
            # a tile stops once every live ray is occluded
            occ_or_dead = (best_t < _BIG) | (tmax_t < tmin_t)
            sp = jnp.where(jnp.all(occ_or_dead, axis=-1), 0, sp)

        if collect_stats:
            nv = nv + jnp.sum(do_int.astype(jnp.int32))
            # every ray in the tile is tested against the K-packet
            tt = tt + jnp.sum(do_leaf.astype(jnp.int32)) * k * t
        return stack_i, stack_t, sp, best_t, best_id, nv, tt

    zero = jnp.int32(0)
    state = (stack_i0, stack_t0, sp0, best_t0, best_id0, zero, zero)
    state = jax.lax.while_loop(cond, body, state)
    _si, _st, _sp, best_t, best_id, nv, tt = state

    best_t = best_t.reshape(n_pad)[:n]
    best_id = best_id.reshape(n_pad)[:n]
    hit = best_t < _BIG
    h = Hit(t=best_t, prim_type=jnp.where(hit, PRIM_TRI, PRIM_NONE),
            prim_id=best_id, hit=hit)
    if collect_stats:
        return h, TraversalStats(node_visits=nv, tri_tests=tt)
    return h


def packet_closest_hit(accel: PacketAccel, tris, spheres, planes, o, d,
                       tmin=0.0, tmax=MIRO_TMAX, blpatches=None) -> Hit:
    """Scene::trace with the packet accelerator (Scene.cpp:214-231)."""
    from cse168_raytracer_tpu.ops.intersect import (_merge,
                                                    intersect_blpatches,
                                                    intersect_planes,
                                                    intersect_spheres)
    h = packet_closest_hit_triangles(accel, o, d, tmin, tmax)
    h = _merge(h, intersect_spheres(spheres, o, d, tmin, tmax))
    h = _merge(h, intersect_planes(planes, o, d, tmin, tmax))
    if blpatches is not None:
        h = _merge(h, intersect_blpatches(blpatches, o, d, tmin, tmax))
    return h


def packet_any_hit(accel: PacketAccel, tris, spheres, planes, o, d,
                   tmin=0.0, tmax=MIRO_TMAX, blpatches=None):
    """Boolean shadow occlusion (gradient-stopped)."""
    from cse168_raytracer_tpu.ops.intersect import (intersect_blpatches,
                                                    intersect_planes,
                                                    intersect_spheres)
    (accel, tris, spheres, planes, o, d, tmin, tmax, blpatches) = \
        jax.lax.stop_gradient((accel, tris, spheres, planes, o, d,
                               tmin, tmax, blpatches))
    h = packet_closest_hit_triangles(accel, o, d, tmin, tmax, any_hit=True)
    occ = h.hit
    occ = occ | intersect_spheres(spheres, o, d, tmin, tmax).hit
    occ = occ | intersect_planes(planes, o, d, tmin, tmax).hit
    if blpatches is not None:
        occ = occ | intersect_blpatches(blpatches, o, d, tmin, tmax).hit
    return occ
