"""Pallas BVH traversal kernels — the speed-of-light accelerators on
TPU (BVH.cpp:438-658 semantics; PERF.md carries the measurements).

Three accelerator shapes share two kernels:
  * PallasBVH   — binary SAH tree, whole tree + leaf tables VMEM-
                  resident (A/B baseline, kind="pallas_sah");
  * PallasBVH4  — the same tree collapsed two levels at a time into
                  4-wide nodes: the TPU default up to ~300k tris;
  * PallasBVHHBM — one whole-scene 4-wide tree with inner nodes in
                  VMEM and leaf tables left in HBM, DMA'd per leaf
                  visit (~8 KB each): the default past the VMEM cap.
                  (PallasBVHForest — Morton-chunked VMEM sub-trees —
                  predates it and is kept for A/B.)

Why not XLA formulations (ops/packet.py): a lax.while_loop advances
EVERY ray tile each iteration (all tiles pay the worst straggler), and
XLA gathers cost ~10 ns/row. Here each T-ray subtile is walked by a
private scalar while-loop inside a grid program; node/leaf fetches are
dynamic VMEM slices or explicit DMA.

Kernel anatomy (per T-ray subtile walk; GSUB subtiles per grid
program, Mosaic wants >= 8-sublane output blocks):
  * ray operands arrive HOST-TRANSPOSED (components on sublanes, rays
    on lanes — _stage_rays): r8T (8, T) rows [o(3) 1/d(3) tmin tmax]
    feed the slab tests as (12, T) VPU rows; rmatT (16, T) rows
    [d(3) m(3) o(3) 1 tmin tmax 0(4)] is the leaf-matmul operand.
  * internal visit (BVH4): plane-grouped cbox rows (lo_x(4) lo_y(4)
    lo_z(4) hi... — _collapse_to_bvh4) slab-test all 4 slots as
    aligned (4, T) groups; the four hit bits leave the VPU in ONE
    lane-reduce + weighted-sum bitmask; pushes decode it with scalar
    shifts (the reference's 2-box SSE trick, BVH.cpp:513-584, at
    128-lane width and 4-way branching).
  * leaf visit: dot_general contracts leafW (16, 4K) with rmatT
    (16, T) on the 16-axis -> (4K, T) planar sublane groups
    [beta|gamma|den|t] with rays still on lanes, so acceptance +
    running-min (Triangle.cpp:152-158 semantics, operands identical to
    ops/intersect.py) never crosses lanes and sublanes. On the HBM
    variant the leaf block is make_async_copy'd into VMEM scratch
    first.
  * the traversal stack lives in SMEM scalars; pushes are unsorted
    (ordered descent and entry-t pruning lost their A/Bs at tile
    width — the pruning the kernel keeps is best-t shrinking curmax).

Traversal inputs are gradient-stopped (ops/intersect.py detach_tri_hit
rationale).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cse168_raytracer_tpu.config import EPSILON, MIRO_TMAX
from cse168_raytracer_tpu.models.geometry import TrianglePack
from cse168_raytracer_tpu.ops.bvh import _FAR, _build_cbox, _leaf_boxes
from cse168_raytracer_tpu.ops.intersect import (_BIG, _DEN_TINY, PRIM_NONE,
                                                PRIM_TRI, Hit)

import os as _os_t
# triangles per leaf: the leaf operand block is (16, 4K) — beta/gamma/
# den/t planar groups of K lanes each; bytes/tri are constant in K, so
# bigger leaves trade wasted tri tests (free, on the MXU) for fewer
# leaf visits (the per-visit overhead and, on the HBM path, the DMA).
# TPU A/B, fwd+bwd ms/step (r05, with in-kernel attr extraction):
#   bunny1  64: 9.88  128: 9.84      bunny20  64: 59.9  128: 59.2
# (r04 pre-attr numbers: bunny1 32: 13.8 64: 12.9 128: 13.0;
#  bunny20 32: 85.8 64: 76.6 128: 75.2)
K = int(_os_t.environ.get("CSE168_LEAF_K", "128"))
# rays per subtile walk. TPU A/B on bunny1 512^2 (closest / shadow ms):
# 128: 9.2/12.1   256: 6.7/8.0   512: 6.1/7.9   1024: 7.2/9.8
# — wider tiles amortize the per-visit scalar overhead across more rays
# until wasted leaf tests win; 256 ~ties 512 and keeps the VMEM ray
# blocks half the size (matters next to the forest's 80 MB leaf tables)
T = int(_os_t.environ.get("CSE168_TILE_T", "256"))
GSUB = 8        # tiles per grid program (Mosaic wants >=8-sublane blocks)
_BIGF = 3.0e37  # python-float mirror of intersect._BIG (kernels cannot
                # capture traced constants)
# A/B flag: feed the kernel cbox as (N4, 32, 1) so the internal-visit
# node fetch lands directly in sublane layout (no (1,32)->(32,1)
# relayout per visit) at the cost of 128x lane-padded VMEM (16 KB/node)
_CBOX_BCAST = _os_t.environ.get("CSE168_CBOX_BCAST", "0") == "1"
# HBM-tier leaf-DMA ring depth (power of 2): a leaf's copies get
# R-1 leaf pops of cover before they are waited on. Measured bunny20
# step fwd+bwd: 2: 47.2  4: 49.2  8: 52.5 — deeper rings DEFER best-t
# tightening and the culling loss (visits 43.3k -> 48.8k) outweighs
# the extra DMA cover (ns/visit was already flat, i.e. latency hidden)
_DMA_RING = int(_os_t.environ.get("CSE168_DMA_RING", "2"))
assert _DMA_RING & (_DMA_RING - 1) == 0, "ring depth must be 2^n"
# A/B flag: near-first ordered pushes in the 4-wide internal visit
# (see the rank-coded push in _traverse4_one.do_internal)
_ORDERED_PUSH = _os_t.environ.get("CSE168_ORDERED_PUSH", "0") == "1"
# slots per wide node (4 or 8): box tests are near-free VPU rows, so
# wider nodes amortize the per-visit scalar overhead (cond + sync +
# stack traffic) over more of them; see _collapse_wide. Measured on
# the chip (fwd+bwd step): bunny1 (VMEM tier) 4: 9.73  8: 10.12;
# bunny20 (HBM tier) 4: 60.8  8: 55.6 — wider wins where internal
# visits dominate, so the tiers default differently (CSE168_NODE_W
# forces both). The kernel reads the width off cbox.shape[1] // 8.
_W_ENV = _os_t.environ.get("CSE168_NODE_W")
W_VMEM = int(_W_ENV or "4")
W_HBM = int(_W_ENV or "8")
if _ORDERED_PUSH and (W_VMEM != 4 or W_HBM != 4):
    raise ValueError("CSE168_ORDERED_PUSH supports W=4 only")

# leaf-matmul precision knob (set before import; used for TPU A/Bs —
# HIGHEST won: golden parity at <=2/255 needs exact f32 Pluecker sums)
import os as _os
_prec = _os.environ.get("CSE168_LEAF_PRECISION", "highest")
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
if _prec not in _PRECISIONS:
    raise ValueError(
        f"CSE168_LEAF_PRECISION={_prec!r}: expected one of "
        f"{sorted(_PRECISIONS)}")
_LEAF_PRECISION = _PRECISIONS[_prec]
# HBM-tier leaf matmul: hand-rolled bf16x2 (split both operands into
# bf16 hi + bf16 residual; 3 one-pass DEFAULT dots whi@rhi + whi@rlo +
# wlo@rhi) instead of HIGHEST's 6 passes. ~1.5e-5 relative error on
# the Pluecker sums — invisible at render scale, but NOT bit-exact, so
# the VMEM tier (every golden-parity scene) keeps exact HIGHEST.
# Mosaic exposes no 3-pass HIGH inside kernels; plain DEFAULT (one
# bf16 pass, ~1e-2 relative) corrupts best-t enough that bunny20
# traversal visits nearly double. Set CSE168_LEAF_BF16X2=0 to force
# HIGHEST everywhere.
_LEAF_BF16X2_HBM = _os.environ.get("CSE168_LEAF_BF16X2", "1") == "1"
# A/B flag: pop and process TWO stack entries per while_loop iteration
# (the second under a sp>0 cond). Halves the loop's own per-iteration
# bookkeeping (condition eval, backedge, state carry) at the cost of
# one extra scalar cond per pair — isolates how much of the ~460-700
# ns/visit is while_loop overhead vs the visit bodies themselves.
_TWO_POP = _os.environ.get("CSE168_TWO_POP", "0") == "1"


class PallasBVH(NamedTuple):
    cbox: jax.Array    # (Nn, 16) f32 [loL hiL loR hiR childL childR pad2]
    leafW: jax.Array   # (L, 16, 4K) f32 matmul operand, planar columns
    n_nodes: int
    n_leaves: int
    stack_depth: int


def _pb_flatten(b: PallasBVH):
    return (b.cbox, b.leafW), (b.n_nodes, b.n_leaves, b.stack_depth)


def _pb_unflatten(aux, children):
    return PallasBVH(*children, *aux)


jax.tree_util.register_pytree_node(PallasBVH, _pb_flatten, _pb_unflatten)


def _leafW_from_pack(pack: TrianglePack, n_leaves: int) -> np.ndarray:
    """Leaf matmul operands with planar output columns
    [beta(K) | gamma(K) | den(K) | t(K)] from a LEAF-ORDERED pack.

    The first three K-groups are one transpose: viewing leafW's
    [0:6, 0:3K] block as (L, 6, 3, K), it equals w6 (6, L, K, 3)
    transposed (1, 0, 3, 2). Writing groups separately with
    .transpose(1, 0, 2) per plane made numpy walk 514 MB with
    pathological strides — 40 s at bunny20 scale vs ~3 s for the
    single-copy form."""
    w6 = np.asarray(pack.w6)                    # (6, T, 3) [b, g, d] cols
    w4 = np.asarray(pack.w4)                    # (4, T)
    leafW = np.zeros((n_leaves, 16, 4 * K), np.float32)
    w6l = w6.reshape(6, n_leaves, K, 3)
    # full-array reshape is a VIEW (a reshape of a slice would silently
    # copy and drop the writes); lane dim viewed as (group, K)
    leafW4 = leafW.reshape(n_leaves, 16, 4, K)
    leafW4[:, 0:6, 0:3, :] = w6l.transpose(1, 0, 3, 2)
    leafW4[:, 6:10, 3, :] = (w4.reshape(4, n_leaves, K)
                             .transpose(1, 0, 2))              # t num
    return leafW


def _attrA_from_pack(pack: TrianglePack, n_leaves: int) -> np.ndarray:
    """Per-leaf shading-attribute blocks (L, 32, K): rows = the 29
    ops/surface.pack_attr_rows columns (padded to 32 sublanes), lanes =
    the leaf's K triangles. The traversal kernel extracts the winning
    ray's attribute column via a one-hot MXU contraction at each
    best-t improvement (see _traverse4_one), which replaces the
    per-ray random row gather in make_surface — measured ~42 ns/row
    latency-bound on HBM (~11 ms for a 512^2 wavefront at bunny20
    scale) with work that rides the leaf visit's already-resident
    block."""
    cols = [np.asarray(pack.v0), np.asarray(pack.e1), np.asarray(pack.e2),
            np.asarray(pack.n_geo),
            np.asarray(pack.n0), np.asarray(pack.n1), np.asarray(pack.n2),
            np.asarray(pack.t0), np.asarray(pack.t1), np.asarray(pack.t2),
            np.asarray(pack.has_uv)[:, None].astype(np.float32),
            np.asarray(pack.material_id)[:, None].astype(np.float32)]
    attr = np.zeros((n_leaves * K, 32), np.float32)
    attr[:, :29] = np.concatenate(cols, axis=1)
    a32 = attr.reshape(n_leaves, K, 32).transpose(0, 2, 1)  # (L, 32, K)
    # stored as (L, 16, 2K): attribute rows 16..31 ride in lanes K..2K
    # so the per-leaf HBM->VMEM DMA slice has a 128-aligned lane dim
    # (2K = 128 at the default K=64; Mosaic rejects 64-lane slices)
    return np.ascontiguousarray(
        np.concatenate([a32[:, :16, :], a32[:, 16:, :]], axis=2))


def build_pallas_bvh_sah(pack: TrianglePack):
    """SAH build (csrc/bvh_builder.cpp): returns (leaf-ordered pack,
    PallasBVH). This is the default accelerator construction — the SAH
    tree does ~2-4x fewer node visits than the Morton-implicit tree."""
    from cse168_raytracer_tpu.ops.sah import sah_build_and_reorder
    new_pack, nodes14, n_leaves, depth = sah_build_and_reorder(
        pack, K, upload_plucker=False)
    cbox = np.zeros((nodes14.shape[0], 16), np.float32)
    cbox[:, :14] = nodes14
    accel = PallasBVH(cbox=jnp.asarray(cbox),
                      leafW=jnp.asarray(_leafW_from_pack(new_pack,
                                                         n_leaves)),
                      n_nodes=int(nodes14.shape[0]),
                      n_leaves=int(n_leaves),
                      stack_depth=int(max(4, depth + 3)))
    # w6/w4 live on in leafW only; don't ship ~450 MB of dead operands
    # to the device (see build_pack_from_arrays)
    return new_pack._replace(w6=None, w4=None), accel


def build_pallas_bvh(pack: TrianglePack) -> PallasBVH:
    """Implicit-LBVH build for a Morton-ORDERED pack (A/B baseline for
    the SAH tree; same kernel, links synthesized from the complete-tree
    indexing)."""
    leaf_lo, leaf_hi, n_leaves = _leaf_boxes(pack, K)
    cbox12, n_internal, stack_depth = _build_cbox(leaf_lo, leaf_hi)
    nn = cbox12.shape[0]
    cbox = np.zeros((nn, 16), np.float32)
    cbox[:, :12] = cbox12
    ii = np.arange(nn)
    for col, child in ((12, 2 * ii + 1), (13, 2 * ii + 2)):
        is_leaf = child >= n_internal
        link = np.where(is_leaf, ~(child - n_internal), child)
        cbox[:, col] = link.astype(np.float32)
    if n_internal == 0:
        # degenerate single-leaf tree: root row points at leaf 0 twice
        cbox[0, 12] = cbox[0, 13] = float(~0)
    return PallasBVH(cbox=jnp.asarray(cbox),
                     leafW=jnp.asarray(_leafW_from_pack(pack, n_leaves)),
                     n_nodes=int(nn), n_leaves=int(n_leaves),
                     stack_depth=int(stack_depth))


def _traverse_kernel(r8_ref, rmat_ref, cbox_ref, leafW_ref,
                     out_t_ref, out_id_ref, *rest,
                     any_hit: bool, with_stats: bool):
    """One program = GSUB sub-tiles of 128 rays, each walked with a
    private SMEM stack (Mosaic requires >= 8 sublanes per output block,
    so tiles are grouped 8 per grid step)."""
    if with_stats:
        out_nv_ref, out_lv_ref, stack_i, stack_t = rest
        stats_refs = (out_nv_ref, out_lv_ref)
    else:
        stack_i, stack_t = rest
        stats_refs = None

    def sub_tile(t_idx, _):
        _traverse_one(r8_ref, rmat_ref, cbox_ref, leafW_ref,
                      out_t_ref, out_id_ref, stack_i, stack_t,
                      t_idx, any_hit=any_hit, stats_refs=stats_refs)
        return 0

    jax.lax.fori_loop(0, GSUB, sub_tile, 0)


def _traverse_one(r8_ref, rmat_ref, cbox_ref, leafW_ref,
                  out_t_ref, out_id_ref, stack_i, stack_t, t_idx,
                  *, any_hit: bool, stats_refs=None):
    r8 = r8_ref[0, t_idx]                # (8, T): host-staged transposed
    rmatT = rmat_ref[0, t_idx]           # (16, T)
    o3 = r8[0:3, :]
    rcp3 = r8[3:6, :]
    tmin_r = r8[6:7, :]                  # (1, T)
    tmax_r = r8[7:8, :]
    ob12 = jnp.concatenate([o3, o3, o3, o3], axis=0)       # (12, T)
    rcp12 = jnp.concatenate([rcp3, rcp3, rcp3, rcp3], axis=0)

    out_t_ref[0, t_idx, :] = jnp.full((T,), _BIGF, jnp.float32)
    out_id_ref[0, t_idx, :] = jnp.zeros((T,), jnp.int32)
    if stats_refs is not None:
        # -DSTATS counters (Stats.h, BVH.cpp:63-65,486-497): every ray
        # in a tile pays every test its tile executes, so the per-ray
        # count is the per-tile visit count (broadcast across lanes)
        stats_refs[0][0, t_idx, :] = jnp.zeros((T,), jnp.int32)
        stats_refs[1][0, t_idx, :] = jnp.zeros((T,), jnp.int32)
    stack_i[0] = 0
    stack_t[0] = 0.0
    sp0 = jnp.where(jnp.any(tmax_r >= tmin_r), 1, 0)

    def body(sp):
        sp = sp - 1
        node = stack_i[sp]
        ten = stack_t[sp]
        best = out_t_ref[0, t_idx, :].reshape(1, T)
        if any_hit:
            # an occluded ray is DONE: exclude it from every further
            # box/leaf test instead of letting its tmax drive descent
            curmax = jnp.where(best < _BIGF, -1.0, tmax_r)
        else:
            curmax = jnp.minimum(tmax_r, best)             # (1, T)
        live = ten <= jnp.max(curmax)

        def do_internal(sp):
            if stats_refs is not None:
                stats_refs[0][0, t_idx, :] = stats_refs[0][0, t_idx, :] + 1
            cb = cbox_ref[node, :].reshape(16, 1)          # column
            cl = cbox_ref[node, 12].astype(jnp.int32)      # child links
            cr = cbox_ref[node, 13].astype(jnp.int32)
            cb12 = jnp.broadcast_to(cb[0:12], (12, T))
            t_all = (cb12 - ob12) * rcp12
            # 0*inf -> NaN: that axis must not constrain the interval
            lo_t = jnp.where(jnp.isnan(t_all), -jnp.inf, t_all)
            hi_t = jnp.where(jnp.isnan(t_all), jnp.inf, t_all)
            tnL = jnp.minimum(lo_t[0:3], lo_t[3:6])
            tfL = jnp.maximum(hi_t[0:3], hi_t[3:6])
            tnR = jnp.minimum(lo_t[6:9], lo_t[9:12])
            tfR = jnp.maximum(hi_t[6:9], hi_t[9:12])
            entL = jnp.maximum(jnp.max(tnL, axis=0, keepdims=True), tmin_r)
            extL = jnp.minimum(jnp.min(tfL, axis=0, keepdims=True), curmax)
            entR = jnp.maximum(jnp.max(tnR, axis=0, keepdims=True), tmin_r)
            extR = jnp.minimum(jnp.min(tfR, axis=0, keepdims=True), curmax)
            okL = entL <= extL
            okR = entR <= extR
            hL = jnp.any(okL)
            hR = jnp.any(okR)
            tL = jnp.min(jnp.where(okL, entL, jnp.inf))
            tR = jnp.min(jnp.where(okR, entR, jnp.inf))
            l_near = tL <= tR
            near_i = jnp.where(l_near, cl, cr)
            far_i = jnp.where(l_near, cr, cl)
            near_t = jnp.where(l_near, tL, tR)
            far_t = jnp.where(l_near, tR, tL)
            near_h = jnp.where(l_near, hL, hR)
            far_h = jnp.where(l_near, hR, hL)

            # predicated push: write unconditionally at sp, advance sp
            # only on a hit (a dead write is overwritten by the next
            # push or never popped) — saves 2 lax.cond branches/visit
            def push(sp, idx, tv, h):
                stack_i[sp] = idx
                stack_t[sp] = tv
                return sp + jnp.where(h, 1, 0)

            sp = push(sp, far_i, far_t, far_h)
            sp = push(sp, near_i, near_t, near_h)
            return sp

        def do_leaf(sp):
            if stats_refs is not None:
                stats_refs[1][0, t_idx, :] = stats_refs[1][0, t_idx, :] + 1
            leaf = -node - 1                               # link = ~leaf
            w = leafW_ref[leaf]                            # (16, 128)
            # transposed contraction: planar groups on sublanes, rays
            # stay on LANES (out_t's natural row layout — no per-leaf
            # lane<->sublane transposes; see _traverse4_one)
            nums = jax.lax.dot_general(
                w, rmatT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_LEAF_PRECISION)                 # (128, T)
            b_n = nums[0:K]
            g_n = nums[K:2 * K]
            den = nums[2 * K:3 * K]
            t_n = nums[3 * K:4 * K]
            safe = jnp.where(jnp.abs(den) < _DEN_TINY, 1.0, den)
            inv = 1.0 / safe
            beta = b_n * inv
            gamma = g_n * inv
            tt = t_n * inv
            best = out_t_ref[0, t_idx, :].reshape(1, T)
            if any_hit:
                curmax_c = jnp.where(best < _BIGF, -1.0, tmax_r)
            else:
                curmax_c = jnp.minimum(tmax_r, best)
            ok = ((beta >= -EPSILON) & (gamma >= -EPSILON)
                  & (beta + gamma <= 1.0 + EPSILON)
                  & (tt >= tmin_r) & (tt <= curmax_c)
                  & (jnp.abs(den) >= _DEN_TINY))
            tm = jnp.where(ok, tt, _BIGF)
            lt = jnp.min(tm, axis=0, keepdims=True)        # (1, T)
            lj = jnp.argmin(tm, axis=0).astype(jnp.int32).reshape(1, T)
            better = lt < best
            out_t_ref[0, t_idx, :] = jnp.where(better, lt, best)[0]
            old_id = out_id_ref[0, t_idx, :].reshape(1, T)
            out_id_ref[0, t_idx, :] = jnp.where(better, leaf * K + lj,
                                                old_id)[0]
            if any_hit:
                occ_or_dead = ((out_t_ref[0, t_idx, :].reshape(1, T)
                                < _BIGF) | (tmax_r < tmin_r))
                sp = jnp.where(jnp.all(occ_or_dead), 0, sp)
            return sp

        def visit(sp):
            return jax.lax.cond(node >= 0, do_internal, do_leaf, sp)

        return jax.lax.cond(live, visit, lambda s: s, sp)

    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)


def _stage_rays(o, d, tmin, tmax, n: int):
    """Pad + build the kernels' two transposed ray operands:
    r8T (ng, GSUB, 8, T) rows [o(3) 1/d(3) tmin tmax] and
    rmatT (ng, GSUB, 16, T) rows [d(3) oxd(3) o(3) 1 tmin tmax 0(4)].
    Component-on-sublane / ray-on-lane is the layout every kernel op
    wants (slab tests as (12, T) rows; the leaf matmul contracts the
    16-row operand directly) — staged HERE so kernels do no per-walk
    transposes and the VMEM blocks don't lane-pad (a (T, 8) block pads
    its 8-lane minor dim to 128: 16x the footprint and DMA)."""
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    ng = max(1, -(-n // (GSUB * T)))
    n_pad = ng * GSUB * T

    def pad(x, fill):
        if n_pad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)])

    o_p = pad(o, 0.0)
    d_p = pad(d, 1.0)
    tmin_p = pad(tmin, 0.0)
    tmax_p = pad(tmax, -1.0)
    m_p = jnp.cross(o_p, d_p)
    rcp_p = 1.0 / d_p

    def to_t(cols, width):
        # (n_pad, width) -> (ng, GSUB, width, T): one fused transpose
        cat = jnp.concatenate(cols, axis=1)
        return cat.reshape(ng, GSUB, T, width).swapaxes(2, 3)

    r8 = to_t([o_p, rcp_p, tmin_p[:, None], tmax_p[:, None]], 8)
    ones = jnp.ones((n_pad, 1), jnp.float32)
    zeros = jnp.zeros((n_pad, 4), jnp.float32)
    rmat = to_t([d_p, m_p, o_p, ones, tmin_p[:, None], tmax_p[:, None],
                 zeros], 16)
    return r8, rmat, ng, n_pad


def pallas_bvh_closest_hit_triangles(accel: PallasBVH, o: jax.Array,
                                     d: jax.Array, tmin, tmax,
                                     any_hit: bool = False,
                                     interpret: bool | None = None,
                                     with_stats: bool = False,
                                     with_attr: bool = False):
    """Closest hit (or first-hit occlusion) of N rays against the
    VMEM-resident BVH. prim_id indexes the Morton-ordered pack.

    with_stats=True additionally returns the -DSTATS traversal counters
    measured INSIDE the actual traversal (not a separate approximating
    pass): (Hit, box_tests (N,), tri_tests (N,)) per-ray i32 counts,
    with the reference's accounting (2 child slab tests per internal
    visit, BVH.cpp:513-584; K triangle tests per leaf visit,
    BVH.cpp:478-510).

    with_attr=True (4-wide accels, closest-hit) additionally returns
    the winning triangle's (N, 32) attribute rows (pack_attr_rows
    layout, zero where no triangle was hit), extracted in-kernel from
    the accel's baked attrA blocks — see _attrA_from_pack. Appended
    LAST in the return tuple."""
    accel, o, d, tmin, tmax = jax.lax.stop_gradient(
        (accel, o, d, tmin, tmax))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = o.shape[0]
    r8, rmat, ng, n_pad = _stage_rays(o, d, tmin, tmax, n)

    hbm = isinstance(accel, PallasBVHHBM)
    is4 = isinstance(accel, (PallasBVH4, PallasBVHHBM))
    if with_attr and (not is4 or any_hit):
        raise ValueError("with_attr needs a 4-wide accel closest-hit")
    if is4 and _CBOX_BCAST:
        accel = accel._replace(cbox=accel.cbox.reshape(
            accel.cbox.shape[0], accel.cbox.shape[1], 1))
    kern_fn = _traverse4_kernel if is4 else _traverse_kernel
    wv = accel.cbox.shape[-2 if _CBOX_BCAST else -1] // 8 if is4 else 0
    kern = functools.partial(kern_fn, any_hit=any_hit,
                             with_stats=with_stats,
                             **({"leaf_hbm": True} if hbm else {}),
                             **({"with_attr": True} if with_attr else {}),
                             **({"width": wv} if is4 else {}))
    s = accel.stack_depth
    ray_specs = [
        pl.BlockSpec((1, GSUB, 8, T), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, GSUB, 16, T), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    leafW_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm
                  else pl.BlockSpec(accel.leafW.shape, lambda i: (0, 0, 0),
                                    memory_space=pltpu.VMEM))
    rt_spec = pl.BlockSpec((1, GSUB, T), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    rt_shape = (ng, GSUB, T)
    links_specs = ([pl.BlockSpec(accel.links.shape, lambda i: (0,),
                                 memory_space=pltpu.SMEM)]
                   if is4 else [])
    links_args = (accel.links,) if is4 else ()
    attr_in_specs, attr_args = [], ()
    attr_out_specs, attr_out_shapes = [], []
    if with_attr:
        attr_in_specs = [pl.BlockSpec(memory_space=pl.ANY) if hbm
                         else pl.BlockSpec(accel.attrA.shape,
                                           lambda i: (0, 0, 0),
                                           memory_space=pltpu.VMEM)]
        attr_args = (accel.attrA,)
        attr_out_specs = [pl.BlockSpec((1, GSUB, 32, T),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)]
        attr_out_shapes = [jax.ShapeDtypeStruct((ng, GSUB, 32, T),
                                                jnp.float32)]
    outs = pl.pallas_call(
        kern,
        grid=(ng,),
        in_specs=ray_specs + [
            pl.BlockSpec(accel.cbox.shape,
                         lambda i: (0,) * accel.cbox.ndim,
                         memory_space=pltpu.VMEM),
        ] + links_specs + [
            leafW_spec,
        ] + attr_in_specs,
        out_specs=[rt_spec] * 2 + attr_out_specs
        + [rt_spec] * (2 if with_stats else 0),
        out_shape=[
            jax.ShapeDtypeStruct(rt_shape, jnp.float32),
            jax.ShapeDtypeStruct(rt_shape, jnp.int32),
        ] + attr_out_shapes
        + ([jax.ShapeDtypeStruct(rt_shape, jnp.int32)] * 2
           if with_stats else []),
        scratch_shapes=[
            pltpu.SMEM((s,), jnp.int32),
            pltpu.SMEM((s,), jnp.float32),
        ] + ([
            # R-slot leaf DMA ring: landing pads + per-slot semaphores
            # + SMEM ring of pending leaf ids (see _traverse4_one)
            pltpu.VMEM((_DMA_RING, 16, 4 * K), jnp.float32),
            pltpu.SemaphoreType.DMA((_DMA_RING,)),
        ] if hbm else []) + ([
            pltpu.VMEM((_DMA_RING, 16, 2 * K), jnp.float32),
            pltpu.SemaphoreType.DMA((_DMA_RING,)),
        ] if (hbm and with_attr) else []) + ([
            pltpu.SMEM((_DMA_RING,), jnp.int32),
        ] if hbm else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(r8, rmat, accel.cbox, *links_args, accel.leafW, *attr_args)
    outs = list(outs)
    best_t = outs.pop(0).reshape(n_pad)[:n]
    best_id = outs.pop(0).reshape(n_pad)[:n]
    attr_rows = None
    if with_attr:
        # (ng, GSUB, 32, T) -> (n, 32): one fused transpose
        attr_rows = outs.pop(0).swapaxes(2, 3).reshape(n_pad, 32)[:n]
    hit = best_t < _BIG
    h = Hit(t=best_t, prim_type=jnp.where(hit, PRIM_TRI, PRIM_NONE),
            prim_id=best_id, hit=hit)
    ret = (h,)
    if with_stats:
        # internal visits test 2 (wide: W) child boxes; leaf visits
        # test K triangles
        box_tests = (wv if is4 else 2) * outs.pop(0).reshape(n_pad)[:n]
        tri_tests = K * outs.pop(0).reshape(n_pad)[:n]
        ret = ret + (box_tests, tri_tests)
    if with_attr:
        ret = ret + (attr_rows,)
    return ret if len(ret) > 1 else h


def pallas_bvh_closest_hit(accel: PallasBVH, tris, spheres, planes, o, d,
                           tmin=0.0, tmax=MIRO_TMAX, blpatches=None) -> Hit:
    """Scene::trace with the Pallas BVH (Scene.cpp:214-231)."""
    from cse168_raytracer_tpu.ops.intersect import (_merge,
                                                    intersect_blpatches,
                                                    intersect_planes,
                                                    intersect_spheres)
    h = pallas_bvh_closest_hit_triangles(accel, o, d, tmin, tmax)
    h = _merge(h, intersect_spheres(spheres, o, d, tmin, tmax))
    h = _merge(h, intersect_planes(planes, o, d, tmin, tmax))
    if blpatches is not None:
        h = _merge(h, intersect_blpatches(blpatches, o, d, tmin, tmax))
    return h


def pallas_bvh_any_hit(accel: PallasBVH, tris, spheres, planes, o, d,
                       tmin=0.0, tmax=MIRO_TMAX, blpatches=None):
    """Boolean shadow occlusion (gradient-stopped)."""
    from cse168_raytracer_tpu.ops.intersect import (intersect_blpatches,
                                                    intersect_planes,
                                                    intersect_spheres)
    (accel, tris, spheres, planes, o, d, tmin, tmax, blpatches) = \
        jax.lax.stop_gradient((accel, tris, spheres, planes, o, d,
                               tmin, tmax, blpatches))
    h = pallas_bvh_closest_hit_triangles(accel, o, d, tmin, tmax,
                                         any_hit=True)
    occ = h.hit
    occ = occ | intersect_spheres(spheres, o, d, tmin, tmax).hit
    occ = occ | intersect_planes(planes, o, d, tmin, tmax).hit
    if blpatches is not None:
        occ = occ | intersect_blpatches(blpatches, o, d, tmin, tmax).hit
    return occ


# ---------------------------------------------------------------------------
# Forest: scenes past the VMEM cap (bunny20-scale, SURVEY.md #11/12 at
# 1.39 M tris). The leaf table costs 8 KB per 32-tri leaf, so one tree
# caps at ~380k triangles of VMEM residency. Bigger scenes become a
# FOREST of spatially-partitioned sub-trees (contiguous Morton ranges
# -> compact chunk bounds): rays traverse chunk k with tmax shrunk to
# their running best t from chunks 0..k-1, so later chunks are culled
# at their root for most rays (ordered-descent semantics ACROSS trees,
# BVH.cpp:586-651 at forest granularity). Each chunk's tables are
# swapped into VMEM per pallas_call — HBM->VMEM streaming at chunk
# granularity instead of per-leaf DMA.
# ---------------------------------------------------------------------------


class PallasBVHForest(NamedTuple):
    chunks: tuple            # of PallasBVH
    starts: tuple            # static int leaf-row offsets into the pack


def _forest_flatten(f: PallasBVHForest):
    return (f.chunks,), (f.starts,)


def _forest_unflatten(aux, children):
    return PallasBVHForest(chunks=children[0], starts=aux[0])


jax.tree_util.register_pytree_node(PallasBVHForest, _forest_flatten,
                                   _forest_unflatten)


# VMEM budget for one chunk's leaf table: 8 KB per 32-tri leaf against
# the 120 MB compiler limit, leaving room for rays/outputs/cbox
# 80 MB of VMEM-resident leafW (16 * 4K * 4 bytes per leaf)
MAX_LEAVES_PER_CHUNK = (80 * 1024 * 1024) // (16 * 4 * K * 4)


def build_pallas_bvh_forest(pack: TrianglePack,
                            chunk_tris: int = 262_144):
    """Split `pack` into Morton-contiguous chunks, SAH-build each, and
    concatenate the leaf-ordered chunk packs into one scene pack
    (chunk c's prim ids live at rows [starts[c], ...)).

    SAH leaves run ~50-70% full, so a chunk's VMEM footprint is only
    known after its build: chunks whose tree exceeds
    MAX_LEAVES_PER_CHUNK leaves are bisected and rebuilt.

    Returns (new_pack, PallasBVHForest).
    """
    from cse168_raytracer_tpu.ops.accel import morton_order
    from cse168_raytracer_tpu.models.geometry import build_pack_from_arrays

    valid = np.asarray(pack.valid)
    perm = morton_order(np.asarray(pack.v0), np.asarray(pack.e1),
                        np.asarray(pack.e2), valid)
    perm = perm[valid[perm]]                       # valid rows, Morton order
    n = perm.shape[0]
    n_chunks = max(1, -(-n // chunk_tris))
    per = -(-n // n_chunks)

    def rows(a, idx):
        return np.asarray(a)[idx]

    def build_chunk(idx):
        sub = build_pack_from_arrays(
            rows(pack.v0, idx), rows(pack.e1, idx), rows(pack.e2, idx),
            rows(pack.n0, idx), rows(pack.n1, idx), rows(pack.n2, idx),
            rows(pack.t0, idx), rows(pack.t1, idx), rows(pack.t2, idx),
            rows(pack.has_uv, idx), rows(pack.material_id, idx),
            np.ones(idx.shape[0], bool))
        sub_pack, accel = build_pallas_bvh4_sah(sub)
        if accel.n_leaves > MAX_LEAVES_PER_CHUNK and idx.shape[0] > K:
            mid = idx.shape[0] // 2
            return build_chunk(idx[:mid]) + build_chunk(idx[mid:])
        return [(sub_pack, accel)]

    chunk_packs, accels, starts = [], [], []
    row0 = 0
    for c in range(n_chunks):
        for sub_pack, accel in build_chunk(perm[c * per:(c + 1) * per]):
            chunk_packs.append(sub_pack)
            accels.append(accel)
            starts.append(row0)
            row0 += sub_pack.v0.shape[0]

    cat = lambda f: np.concatenate([np.asarray(f(p)) for p in chunk_packs])
    new_pack = build_pack_from_arrays(
        cat(lambda p: p.v0), cat(lambda p: p.e1), cat(lambda p: p.e2),
        cat(lambda p: p.n0), cat(lambda p: p.n1), cat(lambda p: p.n2),
        cat(lambda p: p.t0), cat(lambda p: p.t1), cat(lambda p: p.t2),
        cat(lambda p: p.has_uv), cat(lambda p: p.material_id),
        cat(lambda p: p.valid), upload_plucker=False)
    # w6/w4 live on in the chunk leafW tables only
    return (new_pack._replace(w6=None, w4=None),
            PallasBVHForest(chunks=tuple(accels), starts=tuple(starts)))


def forest_closest_hit_triangles(forest: PallasBVHForest, o, d, tmin,
                                 tmax, any_hit: bool = False,
                                 interpret: bool | None = None) -> Hit:
    """Closest hit across the forest with cross-chunk tmax shrinking."""
    n = o.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    best_t = jnp.full((n,), _BIG, jnp.float32)
    best_id = jnp.zeros((n,), jnp.int32)
    for accel, start in zip(forest.chunks, forest.starts):
        cur_tmax = jnp.minimum(tmax, best_t)
        if any_hit:
            # occluded rays are done: poison tmax so every program whose
            # rays all resolved culls at the root slab test
            cur_tmax = jnp.where(best_t < _BIG, -1.0, tmax)
        h = pallas_bvh_closest_hit_triangles(accel, o, d, tmin, cur_tmax,
                                             any_hit=any_hit,
                                             interpret=interpret)
        better = h.hit & (h.t < best_t)
        best_t = jnp.where(better, h.t, best_t)
        best_id = jnp.where(better, h.prim_id + start, best_id)
    hit = best_t < _BIG
    return Hit(t=best_t, prim_type=jnp.where(hit, PRIM_TRI, PRIM_NONE),
               prim_id=best_id, hit=hit)


def forest_closest_hit(forest: PallasBVHForest, tris, spheres, planes,
                       o, d, tmin=0.0, tmax=MIRO_TMAX, blpatches=None) -> Hit:
    from cse168_raytracer_tpu.ops.intersect import (_merge,
                                                    intersect_blpatches,
                                                    intersect_planes,
                                                    intersect_spheres)
    h = forest_closest_hit_triangles(forest, o, d, tmin, tmax)
    h = _merge(h, intersect_spheres(spheres, o, d, tmin, tmax))
    h = _merge(h, intersect_planes(planes, o, d, tmin, tmax))
    if blpatches is not None:
        h = _merge(h, intersect_blpatches(blpatches, o, d, tmin, tmax))
    return h


def forest_any_hit(forest: PallasBVHForest, tris, spheres, planes, o, d,
                   tmin=0.0, tmax=MIRO_TMAX, blpatches=None):
    from cse168_raytracer_tpu.ops.intersect import (intersect_blpatches,
                                                    intersect_planes,
                                                    intersect_spheres)
    (forest, tris, spheres, planes, o, d, tmin, tmax, blpatches) = \
        jax.lax.stop_gradient((forest, tris, spheres, planes, o, d,
                               tmin, tmax, blpatches))
    h = forest_closest_hit_triangles(forest, o, d, tmin, tmax, any_hit=True)
    occ = h.hit
    occ = occ | intersect_spheres(spheres, o, d, tmin, tmax).hit
    occ = occ | intersect_planes(planes, o, d, tmin, tmax).hit
    if blpatches is not None:
        occ = occ | intersect_blpatches(blpatches, o, d, tmin, tmax).hit
    return occ


# ---------------------------------------------------------------------------
# 4-wide BVH: the scalar while-loop overhead per node visit (stack ops,
# branch on node kind, loop bookkeeping) dominates the traversal, not
# the (12, W) VPU slab math. Collapsing the binary SAH tree two levels
# at a time (each BVH4 node's slots are its grandchildren) halves the
# internal-visit count; a visit slab-tests 4 boxes as (24, W) rows —
# the vector work doubles where it is nearly free and the scalar work
# halves where it is the bottleneck. Slot pushes go far-to-near through
# a 5-comparator sorting network on scalars (ordered descent,
# BVH.cpp:586-651 semantics, at 4-way branching).
# ---------------------------------------------------------------------------


class PallasBVH4(NamedTuple):
    cbox: jax.Array    # (N4, 32) f32 [lo0 hi0 lo1 hi1 lo2 hi2 lo3 hi3
    #                                  link0..3 pad4] (plane-grouped)
    links: jax.Array   # (N4*4,) i32 child links, flat (2-D SMEM
    #                  windows lane-pad the minor dim 32x and v5e SMEM
    #                  is 1 MB total), SMEM-resident in the
    #                  kernel: the scalar core reads them directly, vs
    #                  4 scalar VMEM loads (each a vector load + lane
    #                  extract + vector->scalar sync) per internal visit
    leafW: jax.Array   # (L, 16, 4K) — same leaf table as PallasBVH
    attrA: jax.Array   # (L, 16, 2K) shading-attribute blocks
    #                  (_attrA_from_pack) for in-kernel winner
    #                  extraction; VMEM-resident on this tier
    n_nodes: int
    n_leaves: int
    stack_depth: int


def _pb4_flatten(b: PallasBVH4):
    return (b.cbox, b.links, b.leafW, b.attrA), (b.n_nodes, b.n_leaves,
                                                 b.stack_depth)


def _pb4_unflatten(aux, children):
    return PallasBVH4(*children, *aux)


jax.tree_util.register_pytree_node(PallasBVH4, _pb4_flatten, _pb4_unflatten)


def _collapse_wide(nodes14: np.ndarray, W: int):
    """Collapse a binary child-box tree (sah.py layout) into W-wide
    nodes (W=4 default, W=8 via CSE168_NODE_W). Returns
    (cbox (N, 8W) f32, links (N, W) i32, depth).

    Row layout is PLANE-GROUPED for the kernel's slot-parallel slab
    test: cols [lo_x(slot0..W-1) lo_y(W) lo_z(W) | hi_x(W) hi_y(W)
    hi_z(W) | pad(2W)] — the kernel's (3W, T) lo/hi plane blocks slice
    into aligned (W, T) per-axis groups whose row i is slot i, and all
    W slots reduce together. Links live in a separate flat i32 array
    (SMEM-resident in the kernel).

    The binary->W-ary contraction is a DP that MINIMIZES the wide-node
    count (the per-visit scalar overhead — cond, vector->scalar sync,
    stack traffic — is width-independent, and box tests are near-free
    VPU rows, so fewer/fuller nodes is strictly better):
      g(v, s) = min wide-nodes to present v's subtree as s slots
      g(v, s>=2) = min over sa+sb=s of g(a, sa) + g(b, sb)
      g(v, 1)    = 1 + min over 2<=s<=W of g(v, s)
    A greedy top-down expansion was measured leaving ~2/3 of the nodes
    with just 2 occupied slots (leaf-pair leftovers); the DP emits
    near-full nodes (bunny1 W=8: 353 greedy -> 118 DP nodes)."""
    n_bin = nodes14.shape[0]
    ch = nodes14[:, 12:14].astype(np.int64)
    INF = np.int64(1) << 40
    g = np.full((n_bin, W + 1), INF, np.int64)      # cols 1..W used
    split = np.zeros((n_bin, W + 1), np.int64)
    leaf_row = np.full(W + 1, INF, np.int64)
    leaf_row[1] = 0
    order = []
    stack = [0]
    while stack:
        v = stack.pop()
        order.append(v)
        for c in ch[v]:
            if c >= 0:
                stack.append(int(c))
    for v in reversed(order):
        a, b = int(ch[v][0]), int(ch[v][1])
        ga = leaf_row if a < 0 else g[a]
        gb = leaf_row if b < 0 else g[b]
        for s in range(2, W + 1):
            costs = ga[1:s] + gb[s - 1:0:-1]        # sa = 1..s-1
            sa = int(np.argmin(costs)) + 1
            g[v, s] = costs[sa - 1]
            split[v, s] = sa
        s_best = int(np.argmin(g[v, 2:W + 1])) + 2
        g[v, 1] = 1 + g[v, s_best]
        split[v, 1] = s_best

    rows, linkrows = [], []
    new_id = {}

    def collect(v, s):
        """v's subtree as s slot entries [(lo, hi, raw_link)]."""
        r = nodes14[v]
        a, b = int(ch[v][0]), int(ch[v][1])
        if s == 1:
            return None     # unreachable: callers split s >= 2
        sa = int(split[v, s])
        out = []
        for c, box, sc in ((a, r[0:6], sa), (b, r[6:12], s - sa)):
            if sc == 1:
                out.append((box[0:3], box[3:6], c))
            else:
                out.extend(collect(c, sc))
        return out

    def emit(v):
        if v in new_id:
            return new_id[v]
        my = len(rows)
        new_id[v] = my
        rows.append(None)
        linkrows.append(None)
        slots = collect(v, int(split[v, 1]))
        row = np.empty(6 * W, np.float32)
        lrow = np.empty(W, np.int64)
        for i in range(W):
            if i < len(slots):
                lo, hi, link = slots[i]
                for a in range(3):
                    row[a * W + i] = lo[a]
                    row[3 * W + a * W + i] = hi[a]
                # internal slot: emit the child wide node (recursion
                # depth = wide-tree depth, ~log_W leaves)
                lrow[i] = emit(link) if link >= 0 else link
            else:
                # empty slot: a DEGENERATE POINT at +infinity (lo == hi
                # == _FAR): for almost any ray the per-axis entry t's
                # differ (or overflow to +inf on at most two axes), so
                # ent > ext and the slot never pushes. An INVERTED box
                # (hi < lo) would be wrong here — per-axis tn=min/
                # tf=max of the two plane t's spans (-inf, inf) for
                # straddling planes, so an inverted box ACCEPTS every
                # ray. The measure-zero escape (a ray aimed exactly at
                # the degenerate point makes ent == ext pass) is made
                # TERMINATING by linking the slot to leaf 0 (~0): a
                # spurious leaf visit tests real triangles against the
                # usual acceptance rules — redundant work, never a
                # wrong hit, never a loop (an internal link 0 would
                # re-push the root forever).
                for a in range(3):
                    row[a * W + i] = _FAR
                    row[3 * W + a * W + i] = _FAR
                lrow[i] = ~0
        rows[my] = row
        linkrows[my] = lrow
        return my

    import sys as _sys
    old_lim = _sys.getrecursionlimit()
    _sys.setrecursionlimit(max(old_lim, 100_000))
    try:
        emit(0)
    finally:
        _sys.setrecursionlimit(old_lim)
    n = len(rows)
    cbox = np.zeros((n, 8 * W), np.float32)
    cbox[:, :6 * W] = np.stack(rows)
    links = np.stack(linkrows).astype(np.int32)
    # depth of the collapsed tree (for stack sizing): BFS
    depth = 1
    frontier = {0}
    seen = set()
    while frontier:
        nxt = set()
        for j in frontier:
            seen.add(j)
            for i in range(W):
                link = int(links[j, i])
                if cbox[j, i] < _FAR and link >= 0 and link not in seen:
                    nxt.add(link)
        frontier = nxt
        if frontier:
            depth += 1
    assert len(seen) == n <= max(1, nodes14.shape[0])
    return cbox, links, depth


def build_pallas_bvh4_sah(pack: TrianglePack, width: int | None = None):
    """SAH build collapsed to `width`-wide nodes (leaf table identical
    to the 2-wide build; only the inner-node topology changes).
    width=None uses the VMEM-tier default W_VMEM."""
    from cse168_raytracer_tpu.ops.sah import sah_build_and_reorder
    new_pack, nodes14, n_leaves, _depth = sah_build_and_reorder(
        pack, K, upload_plucker=False)
    wv = W_VMEM if width is None else width
    cboxw, linksw, depthw = _collapse_wide(nodes14.astype(np.float32), wv)
    accel = PallasBVH4(cbox=jnp.asarray(cboxw),
                       links=jnp.asarray(linksw.reshape(-1)),
                       leafW=jnp.asarray(_leafW_from_pack(new_pack,
                                                          n_leaves)),
                       attrA=jnp.asarray(_attrA_from_pack(new_pack,
                                                          n_leaves)),
                       n_nodes=int(cboxw.shape[0]),
                       n_leaves=int(n_leaves),
                       stack_depth=int((wv - 1) * depthw + 8))
    # w6/w4 live on in leafW only (see build_pack_from_arrays)
    return new_pack._replace(w6=None, w4=None), accel


class PallasBVHHBM(NamedTuple):
    """One SAH BVH4 over the WHOLE scene with inner nodes VMEM-resident
    and leaf tables in HBM, DMA'd per leaf visit.

    The VMEM-resident PallasBVH4 caps at ~380k triangles (8 KB of leaf
    operands per 32-tri leaf against ~100 MB of usable VMEM). The first
    past-VMEM design was a forest of VMEM-sized sub-trees — correct,
    but every chunk re-ran the FULL per-walk setup for every ray block
    (bunny20: 12 chunks x ~1900 walks x 2 passes of mostly root-culled
    walks dominated the frame). Here the tree stays whole: cbox for
    1.39M tris is only ~6 MB (VMEM), and a leaf visit async-copies its
    (16, 128) operand block HBM->VMEM scratch (~8 KB, ~1 us) right
    before the MXU contraction — the reference's "fits in RAM" model
    (BVH.cpp:91-166 leaf caches) mapped onto the TPU memory hierarchy.
    """
    cbox: jax.Array    # (N4, 32) f32, plane-grouped (see _collapse_to_bvh4)
    links: jax.Array   # (N4*4,) i32, SMEM-resident (see PallasBVH4)
    leafW: jax.Array   # (L, 16, 4K) f32, stays in HBM
    attrA: jax.Array   # (L, 16, 2K) f32, stays in HBM; DMA'd per leaf
    #                  visit alongside leafW (see PallasBVH4.attrA)
    n_nodes: int
    n_leaves: int
    stack_depth: int


def _pbh_flatten(b: PallasBVHHBM):
    return (b.cbox, b.links, b.leafW, b.attrA), (b.n_nodes, b.n_leaves,
                                                 b.stack_depth)


def _pbh_unflatten(aux, children):
    return PallasBVHHBM(*children, *aux)


jax.tree_util.register_pytree_node(PallasBVHHBM, _pbh_flatten,
                                   _pbh_unflatten)


def build_pallas_bvh4_hbm(pack: TrianglePack, width: int | None = None):
    """SAH wide BVH over the whole pack with HBM-resident leaf tables
    (width=None uses the HBM-tier default W_HBM: internal visits
    dominate at this scale, and wider nodes amortize their scalar
    overhead — see the W constants)."""
    new_pack, a4 = build_pallas_bvh4_sah(
        pack, width=W_HBM if width is None else width)
    return new_pack, PallasBVHHBM(*a4)


def _traverse4_kernel(r8_ref, rmat_ref, cbox_ref, links_ref, leafW_ref,
                      *rest, any_hit: bool, with_stats: bool,
                      with_attr: bool = False, leaf_hbm: bool = False,
                      width: int = 4):
    """Narrow 4-wide variant: each T-ray sub-tile walks the BVH4 with
    a private stack (the narrow/wide trade measured on TPU: narrow
    tiles do ~8x fewer wasted leaf tests; wide tiles amortize scalar
    visit overhead — with 4-wide nodes the visit count halves, tipping
    the balance back to narrow).

    Positional refs after the five fixed inputs, in pallas_call order:
    [attrA] out_t out_id [out_attr] [nv lv] stack_i stack_t
    [lw_scratch lw_sem [aw_scratch aw_sem]]."""
    rest = list(rest)
    attrA_ref = rest.pop(0) if with_attr else None
    out_t_ref, out_id_ref = rest.pop(0), rest.pop(0)
    out_attr_ref = rest.pop(0) if with_attr else None
    stats_refs = (rest.pop(0), rest.pop(0)) if with_stats else None
    stack_i, stack_t = rest.pop(0), rest.pop(0)
    leaf_dma = None
    if leaf_hbm:
        lw_scratch, lw_sem = rest.pop(0), rest.pop(0)
        aw = (rest.pop(0), rest.pop(0)) if with_attr else (None, None)
        leaf_dma = (lw_scratch, lw_sem) + aw + (rest.pop(0),)

    def sub_tile(t_idx, _):
        _traverse4_one(r8_ref, rmat_ref, cbox_ref, links_ref, leafW_ref,
                       attrA_ref, out_t_ref, out_id_ref, out_attr_ref,
                       stack_i, stack_t,
                       t_idx, any_hit=any_hit, stats_refs=stats_refs,
                       leaf_dma=leaf_dma, width=width)
        return 0

    jax.lax.fori_loop(0, GSUB, sub_tile, 0)


def _traverse4_one(r8_ref, rmat_ref, cbox_ref, links_ref, leafW_ref,
                   attrA_ref, out_t_ref, out_id_ref, out_attr_ref,
                   stack_i, stack_t, t_idx,
                   *, any_hit: bool, stats_refs=None, leaf_dma=None,
                   width: int = 4):
    W = width
    bf16x2 = _LEAF_BF16X2_HBM and leaf_dma is not None
    """One 128-ray subtile walk, engineered for minimum per-visit
    overhead (measured r03: 709 ns/visit — ~670 cycles for ~30 cycles
    of vector math; the loop was all scalar sync and layout churn):

      * outer `live` lax.cond REMOVED: with unsorted pushes every
        stacked entry passed its slab test when pushed, and the any-hit
        early-out is handled in the leaf branch — the check was a
        cross-lane max + vector->scalar sync + branch per visit that
        could never fire for closest-hit (best <= tmax always keeps
        max(curmax) >= 0 = the pushed entry key).
      * internal visit: plane-grouped cbox rows (see _collapse_to_bvh4)
        slab-test ALL 4 slots as (4, T) rows in ~10 VPU ops; the four
        hit bits leave the vector unit in ONE transfer (lane-reduce to
        (4,1), weighted sum to a scalar bitmask) instead of four
        jnp.any syncs; pushes decode the bitmask with scalar shifts.
      * leaf visit: the Pluecker matmul is computed TRANSPOSED —
        dot_general contracts leafW (16,128) with rmatT (16,T) on the
        16-axis giving (128, T): planar groups land on sublane blocks
        [0:K]=beta [K:2K]=gamma [2K:3K]=den [3K:4K]=t and rays stay on
        LANES, so the best-t compare/update is pure lane math against
        out_t's natural row layout. The old (T,16)@(16,128) layout put
        rays on sublanes and paid two 128-wide lane<->sublane
        transposes per leaf visit.
    """
    r8 = r8_ref[0, t_idx]                # (8, T): host-staged transposed
    rmatT = rmat_ref[0, t_idx]           # (16, T)
    o3 = r8[0:3, :]
    rcp3 = r8[3:6, :]
    tmin_r = r8[6:7, :]
    tmax_r = r8[7:8, :]
    o12 = jnp.repeat(o3, W, axis=0)      # (3W, T) [x*W y*W z*W]
    rcp12 = jnp.repeat(rcp3, W, axis=0)  # matches plane-grouped cbox

    out_t_ref[0, t_idx, :] = jnp.full((T,), _BIGF, jnp.float32)
    out_id_ref[0, t_idx, :] = jnp.zeros((T,), jnp.int32)
    if out_attr_ref is not None:
        out_attr_ref[0, t_idx] = jnp.zeros((32, T), jnp.float32)
    if stats_refs is not None:
        stats_refs[0][0, t_idx, :] = jnp.zeros((T,), jnp.int32)
        stats_refs[1][0, t_idx, :] = jnp.zeros((T,), jnp.int32)
    stack_i[0] = 0
    sp0 = jnp.where(jnp.any(tmax_r >= tmin_r), 1, 0)
    # [1, 2, 4, ...] bit weights (iota-built: kernels cannot capture
    # jnp.array constants; tpu.iota must be integer -> shift then cast)
    bitw = (1 << jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
            ).astype(jnp.float32)

    def do_internal(node, sp):
            if stats_refs is not None:
                stats_refs[0][0, t_idx, :] = stats_refs[0][0, t_idx, :] + 1
            best = out_t_ref[0, t_idx, :].reshape(1, T)
            if any_hit:
                curmax = jnp.where(best < _BIGF, -1.0, tmax_r)
            else:
                curmax = jnp.minimum(tmax_r, best)
            cb = (cbox_ref[node] if _CBOX_BCAST
                  else cbox_ref[node, :].reshape(8 * W, 1))
            cbL = jnp.broadcast_to(cb[0:3 * W], (3 * W, T))
            cbH = jnp.broadcast_to(cb[3 * W:6 * W], (3 * W, T))
            tA = (cbL - o12) * rcp12
            tB = (cbH - o12) * rcp12
            # 0*inf -> NaN: that axis must not constrain the interval
            tnA = jnp.where(jnp.isnan(tA), -jnp.inf, tA)
            tnB = jnp.where(jnp.isnan(tB), -jnp.inf, tB)
            tfA = jnp.where(jnp.isnan(tA), jnp.inf, tA)
            tfB = jnp.where(jnp.isnan(tB), jnp.inf, tB)
            tn = jnp.minimum(tnA, tnB)          # (3W, T)
            tf = jnp.maximum(tfA, tfB)
            # row i of each (W, T) axis-group is slot i
            ent4 = jnp.maximum(
                jnp.maximum(tn[0:W], tn[W:2 * W]),
                jnp.maximum(tn[2 * W:3 * W],
                            jnp.broadcast_to(tmin_r, (W, T))))
            ext4 = jnp.minimum(
                jnp.minimum(tf[0:W], tf[W:2 * W]),
                jnp.minimum(tf[2 * W:3 * W],
                            jnp.broadcast_to(curmax, (W, T))))
            ok4 = (ent4 <= ext4).astype(jnp.float32)   # (W, T)
            if not _ORDERED_PUSH:
                # ONE vector->scalar sync: per-slot any() as a bitmask
                pres = jnp.max(ok4, axis=1, keepdims=True)  # (W, 1)
                code = jnp.sum(pres * bitw)
                if any_hit:
                    # fold the all-rays-retired exit into the SAME
                    # scalar transfer (bit 4): the leaf visit then
                    # carries no sync at all (it used to jnp.all per
                    # visit); retirement fires at most one internal
                    # visit later
                    alive = jnp.max(jnp.where(curmax >= tmin_r,
                                              float(1 << W), 0.0))
                    code = code + alive
                mask = code.astype(jnp.int32)
                for i in range(W):
                    # links live in SMEM: plain scalar-core reads,
                    # where a cbox_ref[node, 24+i] VMEM read costs a
                    # vector load + lane extract + vector->scalar sync
                    # EACH (measured: bunny1 closest-hit 6.15 -> 5.51
                    # ms, shadow 7.11 -> 5.89; bunny20 step 76.5 ->
                    # 71.6)
                    stack_i[sp] = links_ref[node * W + i]
                    sp = sp + ((mask >> i) & 1)
                if any_hit:
                    sp = jnp.where((mask >> W) > 0, sp, 0)
                return sp
            # ORDERED pushes: rank the present slots by the tile's
            # minimum entry distance and push FAR-first (LIFO pops
            # near-first), all encoded in ONE octal-digit scalar so
            # the vector->scalar sync count stays 1:
            #   code = sum_i present_i * (i+1) * 8^rank_i
            # (4 digits, < 4096, exact in f32). Near-first descent
            # tightens best-t sooner (closest-hit culling) and finds
            # occluders sooner (any-hit retirement) — the reference's
            # ordered descent (BVH.cpp:586-651) at tile granularity.
            entm = jnp.min(jnp.where(ok4 > 0, ent4, jnp.inf),
                           axis=1, keepdims=True)            # (4, 1)
            entmT = entm.reshape(1, 4)
            ii = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
            eI = jnp.broadcast_to(entm, (4, 4))              # [i,j]=e_i
            eJ = jnp.broadcast_to(entmT, (4, 4))             # [i,j]=e_j
            less = (eJ < eI) | ((eJ == eI) & (jj < ii))
            rank = jnp.sum(less.astype(jnp.float32), axis=1,
                           keepdims=True)                    # (4, 1)
            pow8 = jnp.where(rank < 1, 1.0,
                             jnp.where(rank < 2, 8.0,
                                       jnp.where(rank < 3, 64.0, 512.0)))
            present = (entm < jnp.inf).astype(jnp.float32)
            slotw = (1.0 + jax.lax.broadcasted_iota(
                jnp.int32, (4, 1), 0).astype(jnp.float32))
            codef = jnp.sum(present * slotw * pow8)
            if any_hit:
                codef = codef + jnp.max(
                    jnp.where(curmax >= tmin_r, 4096.0, 0.0))
            code = codef.astype(jnp.int32)
            for r in (3, 2, 1, 0):
                dig = (code >> (3 * r)) & 7
                has = jnp.where(dig > 0, 1, 0)
                stack_i[sp] = links_ref[node * 4 + dig - has]
                sp = sp + has
            if any_hit:
                sp = jnp.where((code >> 12) > 0, sp, 0)
            return sp

    if bf16x2:
        rhi = rmatT.astype(jnp.bfloat16).astype(jnp.float32)
        rlo = rmatT - rhi

    def shade_leaf(leaf, w, aw, sp):
            """Acceptance + best-t update for leaf's operand block w;
            aw is the leaf's (32, K) attribute block (or None) for
            in-kernel winner-attribute extraction."""
            if bf16x2:
                whi = w.astype(jnp.bfloat16).astype(jnp.float32)
                wlo = w - whi
                dot = lambda x, y: jax.lax.dot_general(
                    x, y, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                nums = dot(whi, rhi) + dot(whi, rlo) + dot(wlo, rhi)
            else:
                nums = jax.lax.dot_general(
                    w, rmatT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_LEAF_PRECISION)             # (4K, T)
            b_n = nums[0:K]                                # (K, T) each
            g_n = nums[K:2 * K]
            den = nums[2 * K:3 * K]
            t_n = nums[3 * K:4 * K]
            safe = jnp.where(jnp.abs(den) < _DEN_TINY, 1.0, den)
            inv = 1.0 / safe
            beta = b_n * inv
            gamma = g_n * inv
            tt = t_n * inv
            best = out_t_ref[0, t_idx, :].reshape(1, T)
            if any_hit:
                curmax_c = jnp.where(best < _BIGF, -1.0, tmax_r)
            else:
                curmax_c = jnp.minimum(tmax_r, best)
            ok = ((beta >= -EPSILON) & (gamma >= -EPSILON)
                  & (beta + gamma <= 1.0 + EPSILON)
                  & (tt >= tmin_r) & (tt <= curmax_c)
                  & (jnp.abs(den) >= _DEN_TINY))
            tm = jnp.where(ok, tt, _BIGF)
            if any_hit:
                # occlusion only needs existence: skip the argmin /
                # id bookkeeping and the per-leaf all-retired sync
                # (the internal visit now carries the exit bit)
                lt = jnp.min(tm, axis=0, keepdims=True)    # (1, T)
                out_t_ref[0, t_idx, :] = jnp.minimum(
                    out_t_ref[0, t_idx, :], lt[0])
                return sp
            lt = jnp.min(tm, axis=0, keepdims=True)        # (1, T)
            lj = jnp.argmin(tm, axis=0).astype(jnp.int32).reshape(1, T)
            better = lt < best
            out_t_ref[0, t_idx, :] = jnp.where(better, lt, best)[0]
            old_id = out_id_ref[0, t_idx, :].reshape(1, T)
            out_id_ref[0, t_idx, :] = jnp.where(better, leaf * K + lj,
                                                old_id)[0]
            if out_attr_ref is not None:
                # winner-attribute extraction: the improving rays pull
                # their triangle's 32-float attribute column out of the
                # resident block with a one-hot MXU contraction — the
                # rows land on sublanes, rays stay on lanes, and the
                # per-ray random HBM row gather in make_surface
                # disappears. HIGHEST precision: one-hot weights are
                # exact in bf16, so each output is the untouched f32
                # attribute (bf16x6 reconstructs f32 exactly when only
                # one addend is nonzero).
                kio = jax.lax.broadcasted_iota(jnp.int32, (K, T), 0)
                oneh = ((kio == jnp.broadcast_to(lj, (K, T)))
                        & jnp.broadcast_to(better, (K, T))
                        ).astype(jnp.float32)
                # aw is (16, 2K): attr rows 16..31 live in lanes K..2K
                # (128-aligned DMA slices); contract each half. On the
                # bf16x2 tier: the one-hot is EXACT in bf16 and each
                # output has a single nonzero addend, so attr_hi@oneh
                # + attr_lo@oneh (2 DEFAULT passes) reproduces the
                # bf16x2-split attribute exactly — vs HIGHEST's 6
                # passes. The VMEM tier keeps HIGHEST (bit-exact f32
                # attributes for the golden scenes).
                def _extract(a):
                    if not bf16x2:
                        return jax.lax.dot_general(
                            a, oneh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                    ahi = a.astype(jnp.bfloat16).astype(jnp.float32)
                    alo = a - ahi
                    dflt = lambda x: jax.lax.dot_general(
                        x, oneh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                    return dflt(ahi) + dflt(alo)

                prod = jnp.concatenate(
                    [_extract(aw[:, h * K:(h + 1) * K])
                     for h in (0, 1)], axis=0)               # (32, T)
                out_attr_ref[0, t_idx] = jnp.where(
                    jnp.broadcast_to(better, (32, T)), prod,
                    out_attr_ref[0, t_idx])
            return sp

    if leaf_dma is None:
        def visit(sp):
            sp = sp - 1
            node = stack_i[sp]

            def do_leaf(sp):
                if stats_refs is not None:
                    stats_refs[1][0, t_idx, :] = \
                        stats_refs[1][0, t_idx, :] + 1
                leaf = -node - 1
                aw = None if out_attr_ref is None else attrA_ref[leaf]
                return shade_leaf(leaf, leafW_ref[leaf], aw, sp)

            return jax.lax.cond(node >= 0,
                                lambda s: do_internal(node, s),
                                do_leaf, sp)

        if _TWO_POP:
            def body(sp):
                sp = visit(sp)
                return jax.lax.cond(sp > 0, visit, lambda s: s, sp)
        else:
            body = visit
        jax.lax.while_loop(lambda sp: sp > 0, body, sp0)
        return

    # ---- HBM leaf tables: R-slot DMA ring ----
    # A leaf pop STARTS its HBM->VMEM copies (leafW + attrA) into the
    # ring slot at `tail` and defers processing; the oldest pending
    # leaf is shaded only when the ring is full, by which point its
    # copy has had R-1 leaf pops plus the interleaved internal visits
    # to complete. Deferred processing only ever sees a LATER (tighter)
    # best-t, so closest-hit results are identical; the any-hit
    # retirement fires at most R-1 visits later. Ring ids live in SMEM
    # (q_ref); in-flight count = tail - head <= R.
    lw_scratch, lw_sem, aw_scratch, aw_sem, q_ref = leaf_dma
    R = lw_scratch.shape[0]              # power of 2 (ring mask below)

    def leaf_copy(leaf, slot):
        return pltpu.make_async_copy(leafW_ref.at[leaf],
                                     lw_scratch.at[slot],
                                     lw_sem.at[slot])

    def attr_copy(leaf, slot):
        return pltpu.make_async_copy(attrA_ref.at[leaf],
                                     aw_scratch.at[slot],
                                     aw_sem.at[slot])

    def shade_oldest(sp, head):
        slot = head & (R - 1)
        leaf = q_ref[slot]
        leaf_copy(leaf, slot).wait()
        aw = None
        if out_attr_ref is not None:
            attr_copy(leaf, slot).wait()
            aw = aw_scratch[slot]
        return shade_leaf(leaf, lw_scratch[slot], aw, sp), head + 1

    def visit(state):
        sp, head, tail = state
        sp = sp - 1
        node = stack_i[sp]

        def internal_(state):
            sp, head, tail = state
            return (do_internal(node, sp), head, tail)

        def leaf_(state):
            sp, head, tail = state
            if stats_refs is not None:
                stats_refs[1][0, t_idx, :] = stats_refs[1][0, t_idx, :] + 1

            def drain(s):
                return shade_oldest(*s)

            # free a slot first when the ring is full
            sp, head = jax.lax.cond(tail - head >= R, drain,
                                    lambda s: s, (sp, head))
            leaf = -node - 1
            slot = tail & (R - 1)
            q_ref[slot] = leaf
            leaf_copy(leaf, slot).start()
            if out_attr_ref is not None:
                attr_copy(leaf, slot).start()
            return (sp, head, tail + 1)

        return jax.lax.cond(node >= 0, internal_, leaf_,
                            (sp, head, tail))

    if _TWO_POP:
        def body(state):
            state = visit(state)
            return jax.lax.cond(state[0] > 0, visit, lambda s: s, state)
    else:
        body = visit
    state = jax.lax.while_loop(lambda s: s[0] > 0, body,
                               (sp0, jnp.int32(0), jnp.int32(0)))
    sp_f, head_f, tail_f = state

    # drain every in-flight copy (also after an any-hit early exit,
    # keeping the semaphores clean)
    def drain_body(s):
        sp, head = s
        return shade_oldest(sp, head)

    jax.lax.while_loop(lambda s: s[1] < tail_f, drain_body,
                       (sp_f, head_f))
