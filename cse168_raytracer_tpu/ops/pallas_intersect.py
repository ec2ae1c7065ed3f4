"""Pallas TPU kernel: block-culled ray-triangle closest hit.

The hand-controlled version of ops/accel.py's traversal — the moral
equivalent of the reference's SSE packet intersectors + inline-asm slab
tests (SSE.h, BVH.cpp:341-435,513-584), at VMEM tile width instead of
4-wide SSE:

- triangle data lives in VMEM as Morton-ordered 128-triangle blocks
  with the Pluecker operands pre-grouped [beta | gamma | den] so the
  per-block matmul result slices contiguously along lanes;
- each grid program owns a tile of RAY_TILE rays; a fori_loop walks the
  blocks, performs the 2-plane slab test on the whole ray tile (VPU),
  and only when ANY ray in the tile can hit the block closer than its
  current best does the predicated body run the
  (RAY_TILE, 6) @ (6, 3*128) MXU matmul + acceptance test
  (Triangle.cpp:158 epsilon semantics, same as ops/intersect.py);
- best (t, id) live in VMEM scratch, updated in place.

VMEM budget: triangle blocks cost 88 bytes/tri -> ~150k triangles fit
the default 13 MB budget; larger scenes fall back to the XLA streaming
path (ops/accel.py). The HBM-resident variant SHIPPED as
ops/pallas_bvh.PallasBVHHBM (whole-scene wide tree, per-leaf-visit
DMA ring) — this module is the measured-slower v1 kernel, kept for
A/B (attach_accel(kind="pallas"); see accel.py's kind table).
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
from cse168_raytracer_tpu.ops.intersect import (Hit, PRIM_NONE, PRIM_TRI,
                                                _BIG, _DEN_TINY, _merge,
                                                intersect_planes,
                                                intersect_spheres)

BLOCK = 256
RAY_TILE = 256
_FAR = 1.0e30

# triangle bytes: w6 (6*3*128) + w4 (4*128) floats per block
_BYTES_PER_TRI = (6 * 3 + 4) * 4
VMEM_TRI_BUDGET = 13 * 1024 * 1024


class PallasTriBlocks(NamedTuple):
    """Triangle blocks laid out for the kernel."""
    w6: jax.Array     # (NB, 6, 3*BLOCK): lanes [0:B]=beta numerator
                      # columns, [B:2B]=gamma, [2B:3B]=den
    w4: jax.Array     # (NB, 4, BLOCK): t-numerator columns
    aabb: jax.Array   # (NB, 8): lo.xyz, hi.xyz, pad, pad

    @property
    def num_blocks(self) -> int:
        return self.w6.shape[0]

    @property
    def num_tris(self) -> int:
        return self.num_blocks * BLOCK

    def fits_vmem(self) -> bool:
        return self.num_tris * _BYTES_PER_TRI <= VMEM_TRI_BUDGET


def build_pallas_blocks(pack: TrianglePack) -> PallasTriBlocks:
    """Repack a Morton-ordered TrianglePack for the kernel. Padding
    triangles have all-zero operands -> den = 0 -> never accepted."""
    t = pack.num_tris
    assert t % BLOCK == 0
    nb = t // BLOCK
    # pack.w6: (6, T, 3) -> (nb, 6, 3*BLOCK) grouped [beta|gamma|den]
    w6 = jnp.asarray(pack.w6)                     # (6, T, 3)
    w6 = w6.reshape(6, nb, BLOCK, 3)
    w6 = jnp.moveaxis(w6, 1, 0)                   # (nb, 6, BLOCK, 3)
    w6 = jnp.moveaxis(w6, 3, 2).reshape(nb, 6, 3 * BLOCK)
    w4 = jnp.asarray(pack.w4).reshape(4, nb, BLOCK)
    w4 = jnp.moveaxis(w4, 1, 0)                   # (nb, 4, BLOCK)

    v0 = np.asarray(pack.v0, np.float64)
    e1 = np.asarray(pack.e1, np.float64)
    e2 = np.asarray(pack.e2, np.float64)
    valid = np.asarray(pack.valid)
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    lo = np.where(valid[:, None], pts.min(axis=1), _FAR)
    hi = np.where(valid[:, None], pts.max(axis=1), _FAR)
    blo = lo.reshape(nb, BLOCK, 3).min(axis=1)
    bhi = hi.reshape(nb, BLOCK, 3).max(axis=1)
    bhi = np.where(blo >= _FAR, _FAR, bhi)
    aabb = np.concatenate([blo, bhi, np.zeros((nb, 2))], axis=1)
    return PallasTriBlocks(w6=w6, w4=w4,
                           aabb=jnp.asarray(aabb, jnp.float32))


_BIGF = 3.0e37  # python float: jnp constants can't be captured by kernels


def _kernel(aabb_ref, w6_ref, w4_ref, o_ref, drcp_ref, r6_ref, r4_ref,
            tlim_ref, t_out_ref, id_out_ref, best_t_ref, best_bi_ref):
    """v2 kernel: per-LANE running best.

    best_t_ref/best_bi_ref are (R, BLOCK): lane j holds the best t (and
    its block index) among triangles that live in lane j of any block.
    The expensive cross-lane argmin runs ONCE at the end instead of
    once per block (v1 did nb cross-lane argmins per tile — measured
    ~2x slower end-to-end with honest fetch-timing)."""
    nb = aabb_ref.shape[0]
    r = o_ref.shape[0]

    best_t_ref[:] = jnp.full((r, BLOCK), _BIGF, jnp.float32)
    best_bi_ref[:] = jnp.zeros((r, BLOCK), jnp.int32)

    o = o_ref[:]                  # (R, 3)
    drcp = drcp_ref[:]            # (R, 3)
    r6 = r6_ref[:]                # (R, 6)
    r4 = r4_ref[:]                # (R, 4)
    tmin = tlim_ref[:, 0:1]       # (R, 1)
    tmax = tlim_ref[:, 1:2]       # (R, 1)

    def body(bi, _):
        lo = aabb_ref[bi, 0:3]    # (3,)
        hi = aabb_ref[bi, 3:6]
        t0 = (lo - o) * drcp                              # (R, 3)
        t1 = (hi - o) * drcp
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        tn = jnp.where(jnp.isnan(tn), -jnp.inf, tn)
        tf = jnp.where(jnp.isnan(tf), jnp.inf, tf)
        enter = jnp.maximum(jnp.max(tn, axis=1, keepdims=True), tmin)
        exit_ = jnp.minimum(jnp.min(tf, axis=1, keepdims=True), tmax)
        any_hit = jnp.max(jnp.where(enter <= exit_, 1, 0)) > 0

        @pl.when(any_hit)
        def _():
            w6b = w6_ref[bi]                              # (6, 3*BLOCK)
            w4b = w4_ref[bi]                              # (4, BLOCK)
            nums = jnp.dot(r6, w6b, preferred_element_type=jnp.float32)
            t_num = jnp.dot(r4, w4b, preferred_element_type=jnp.float32)
            beta_n = nums[:, 0:BLOCK]
            gamma_n = nums[:, BLOCK:2 * BLOCK]
            den = nums[:, 2 * BLOCK:3 * BLOCK]
            safe_den = jnp.where(jnp.abs(den) < _DEN_TINY, 1.0, den)
            inv_den = 1.0 / safe_den
            beta = beta_n * inv_den
            gamma = gamma_n * inv_den
            t = t_num * inv_den
            ok = ((beta >= -EPSILON) & (gamma >= -EPSILON)
                  & (beta + gamma <= 1.0 + EPSILON)
                  & (t >= tmin) & (t <= tmax)
                  & (jnp.abs(den) >= _DEN_TINY))
            tm = jnp.where(ok, t, _BIGF)
            # strict < keeps the EARLIEST block on lane ties, matching
            # the XLA path's first-min argmin semantics
            better = tm < best_t_ref[:]
            best_t_ref[:] = jnp.where(better, tm, best_t_ref[:])
            best_bi_ref[:] = jnp.where(better, bi, best_bi_ref[:])

        return 0

    jax.lax.fori_loop(0, nb, body, 0)

    # single cross-lane resolve: first lane achieving the min, then its
    # block id -> global triangle id = block * BLOCK + lane
    bt = best_t_ref[:]                                    # (R, BLOCK)
    bmin = jnp.min(bt, axis=1, keepdims=True)             # (R, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, BLOCK), 1)
    cand = jnp.where(bt <= bmin, lane, BLOCK)
    lane_star = jnp.min(cand, axis=1, keepdims=True)      # (R, 1)
    ids = best_bi_ref[:] * BLOCK + lane
    sel = jnp.where(lane == lane_star, ids, 0)
    id_out_ref[:] = jnp.sum(sel, axis=1, keepdims=True)
    t_out_ref[:] = bmin


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _pallas_hit(blocks: PallasTriBlocks, o, d, tmin, tmax,
                interpret: bool):
    """Raw kernel call with a detached VJP.

    Hit selection is discrete; the triangle-winner's continuous
    quantities (P, normal, UV) are RECOMPUTED differentiably from the
    gathered primitive in ops/surface.py, so zero cotangents here are
    exact for the radiance gradient (SURVEY.md §7 detach protocol —
    same contract as the XLA path, where t's gradient w.r.t. ray/tri
    inputs is likewise never consumed for triangle winners)."""
    return _pallas_hit_impl(blocks, o, d, tmin, tmax, interpret)


def _pallas_hit_fwd(blocks, o, d, tmin, tmax, interpret):
    out = _pallas_hit_impl(blocks, o, d, tmin, tmax, interpret)
    return out, (blocks, o, d, tmin, tmax)


def _pallas_hit_bwd(interpret, res, _g):
    blocks, o, d, tmin, tmax = res
    return (jax.tree.map(jnp.zeros_like, blocks), jnp.zeros_like(o),
            jnp.zeros_like(d), jnp.zeros_like(tmin), jnp.zeros_like(tmax))


_pallas_hit.defvjp(_pallas_hit_fwd, _pallas_hit_bwd)


def pallas_intersect_triangles(blocks: PallasTriBlocks, o: jax.Array,
                               d: jax.Array, tmin, tmax,
                               interpret: bool = False) -> Hit:
    """Closest triangle hit via the Pallas kernel. o, d: (N, 3)."""
    n = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, o.dtype), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, o.dtype), (n,))
    best_t, best_id = _pallas_hit(blocks, o, d, tmin, tmax, interpret)
    hit = best_t < _BIG
    return Hit(t=best_t, prim_type=jnp.where(hit, PRIM_TRI, PRIM_NONE),
               prim_id=best_id, hit=hit)


def _pallas_hit_impl(blocks: PallasTriBlocks, o: jax.Array,
                     d: jax.Array, tmin, tmax, interpret: bool):
    n = o.shape[0]
    n_tiles = -(-n // RAY_TILE)
    n_pad = n_tiles * RAY_TILE

    def pad(x, fill=0.0):
        if n_pad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)])

    o_p = pad(o)
    d_p = pad(d, 1.0)
    m = jnp.cross(o_p, d_p)
    r6 = jnp.concatenate([d_p, m], axis=-1)
    r4 = jnp.concatenate([o_p, jnp.ones((n_pad, 1), o.dtype)], axis=-1)
    drcp = 1.0 / d_p
    tlim = jnp.stack([pad(tmin), pad(tmax, -1.0)], axis=-1)  # (Np, 2)

    grid = (n_tiles,)
    ray_spec = lambda w: pl.BlockSpec((RAY_TILE, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    t_out, id_out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[tri_spec, tri_spec, tri_spec,
                  ray_spec(3), ray_spec(3), ray_spec(6), ray_spec(4),
                  ray_spec(2)],
        out_specs=[pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((RAY_TILE, BLOCK), jnp.float32),
                        pltpu.VMEM((RAY_TILE, BLOCK), jnp.int32)],
        interpret=interpret,
    )(blocks.aabb, blocks.w6, blocks.w4, o_p, drcp, r6, r4, tlim)

    return t_out[:n, 0], id_out[:n, 0]


def pallas_closest_hit(blocks: PallasTriBlocks, tris, spheres, planes,
                       o, d, tmin=0.0, tmax=MIRO_TMAX,
                       interpret: bool = False) -> Hit:
    h = pallas_intersect_triangles(blocks, o, d, tmin, tmax,
                                   interpret=interpret)
    h = _merge(h, intersect_spheres(spheres, o, d, tmin, tmax))
    h = _merge(h, intersect_planes(planes, o, d, tmin, tmax))
    return h
