"""Hierarchical-BVH tests: per-ray traversal (ops/bvh.py) and packet
traversal (ops/packet.py) must agree exactly with the brute-force
intersector (the reference's correctness bar: BVH::intersect returns
the same hits as testing every object, BVH.cpp:438-658 vs
Triangle.cpp:136-169), and the in-traversal counters must be sane
(Stats.h parity, writeup/A2/Readme.tex:95-102)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cse168_raytracer_tpu.models.obj import load_obj
from cse168_raytracer_tpu.models.geometry import pack_triangles
from cse168_raytracer_tpu.ops.accel import morton_order, reorder_pack
from cse168_raytracer_tpu.ops.bvh import build_bvh, bvh_closest_hit_triangles
from cse168_raytracer_tpu.ops.packet import (build_packet_accel,
                                             packet_closest_hit_triangles)
from cse168_raytracer_tpu.ops.intersect import intersect_triangles

REF_MODELS = "/root/reference/models"


@pytest.fixture(scope="module")
def teapot_pack():
    obj = load_obj(f"{REF_MODELS}/teapot.obj")
    pack = pack_triangles([(obj, 0)])
    perm = morton_order(np.asarray(pack.v0), np.asarray(pack.e1),
                        np.asarray(pack.e2), np.asarray(pack.valid))
    return reorder_pack(pack, perm)


@pytest.fixture(scope="module")
def rays(teapot_pack):
    rng = np.random.default_rng(7)
    n = 2048 + 13   # non-multiple of any tile size: exercises padding
    v = np.asarray(teapot_pack.v0)[np.asarray(teapot_pack.valid)]
    lo, hi = v.min(0), v.max(0)
    c, ext = (lo + hi) / 2, (hi - lo).max()
    o = (c + rng.normal(0, 2 * ext, (n, 3))).astype(np.float32)
    tgt = (c + rng.normal(0, 0.3 * ext, (n, 3))).astype(np.float32)
    d = tgt - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check_against_brute(h, h_ref):
    rh = np.asarray(h_ref.hit)
    assert np.array_equal(np.asarray(h.hit), rh)
    both = rh & np.asarray(h.hit)
    np.testing.assert_allclose(np.asarray(h.t)[both],
                               np.asarray(h_ref.t)[both],
                               rtol=1e-4, atol=1e-5)
    # ids may differ only on exact-t ties; require 99%+ agreement
    agree = np.mean(np.asarray(h.prim_id)[both]
                    == np.asarray(h_ref.prim_id)[both])
    assert agree > 0.99


def test_perray_bvh_matches_brute_force(teapot_pack, rays):
    o, d = rays
    h_ref = intersect_triangles(teapot_pack, o, d, 0.0, 1e10)
    for leaf in (4, 8):
        accel = build_bvh(teapot_pack, leaf_size=leaf)
        h = bvh_closest_hit_triangles(accel, o, d, 0.0, 1e10)
        _check_against_brute(h, h_ref)


def test_packet_bvh_matches_brute_force(teapot_pack, rays):
    o, d = rays
    h_ref = intersect_triangles(teapot_pack, o, d, 0.0, 1e10)
    for leaf, tile in ((32, 128), (64, 64)):
        accel = build_packet_accel(teapot_pack, leaf_size=leaf, tile=tile)
        h = packet_closest_hit_triangles(accel, o, d, 0.0, 1e10)
        _check_against_brute(h, h_ref)


def test_any_hit_matches_closest_hit_mask(teapot_pack, rays):
    o, d = rays
    h_ref = intersect_triangles(teapot_pack, o, d, 0.0, 1e10)
    accel = build_bvh(teapot_pack, leaf_size=8)
    occ = bvh_closest_hit_triangles(accel, o, d, 0.0, 1e10, any_hit=True)
    assert np.array_equal(np.asarray(occ.hit), np.asarray(h_ref.hit))
    paccel = build_packet_accel(teapot_pack, leaf_size=32, tile=128)
    pocc = packet_closest_hit_triangles(paccel, o, d, 0.0, 1e10,
                                        any_hit=True)
    assert np.array_equal(np.asarray(pocc.hit), np.asarray(h_ref.hit))


def test_any_hit_respects_tmax(teapot_pack, rays):
    """Occlusion within [0, t_hit - eps) must NOT count the hit itself
    (shadow-ray semantics, Phong.cpp:92-97)."""
    o, d = rays
    h_ref = intersect_triangles(teapot_pack, o, d, 0.0, 1e10)
    accel = build_bvh(teapot_pack, leaf_size=8)
    short = jnp.where(h_ref.hit, h_ref.t * 0.5, 1e-3)
    occ = bvh_closest_hit_triangles(accel, o, d, 0.0, short, any_hit=True)
    # a first-hit at t can never be inside [0, t/2]
    assert not np.any(np.asarray(occ.hit) & np.asarray(h_ref.hit)
                      & (np.asarray(occ.t) > np.asarray(short)))


def test_traversal_counters(teapot_pack, rays):
    """In-traversal counters: tri tests must be far below brute force
    and node visits sane (the reference's teapot table shows 3.75
    tests/ray at 4 tris/leaf, writeup/A2/Readme.tex:95)."""
    o, d = rays
    n = o.shape[0]
    accel = build_bvh(teapot_pack, leaf_size=4)
    h, st = bvh_closest_hit_triangles(accel, o, d, 0.0, 1e10,
                                      collect_stats=True)
    tri_per_ray = float(st.tri_tests) / n
    assert 0 < tri_per_ray < 64, tri_per_ray   # brute force would be 640
    assert float(st.node_visits) / n < 128

    paccel = build_packet_accel(teapot_pack, leaf_size=32, tile=128)
    hp, stp = packet_closest_hit_triangles(paccel, o, d, 0.0, 1e10,
                                           collect_stats=True)
    assert int(stp.tri_tests) > 0
    # packet tri tests count K*T per leaf visit; still far below
    # brute-force (n * 640)
    assert int(stp.tri_tests) < n * 640


def test_empty_interval_rays(teapot_pack):
    """Rays with tmax < tmin (the integrator's dead lanes) must miss
    without traversing."""
    o = jnp.zeros((130, 3))
    d = jnp.ones((130, 3)) / np.sqrt(3.0)
    accel = build_bvh(teapot_pack, leaf_size=8)
    h, st = bvh_closest_hit_triangles(accel, o, d, 0.0, -1.0,
                                      collect_stats=True)
    assert not np.any(np.asarray(h.hit))
    assert int(st.node_visits) == 0
    paccel = build_packet_accel(teapot_pack, leaf_size=32, tile=128)
    hp = packet_closest_hit_triangles(paccel, o, d, 0.0, -1.0)
    assert not np.any(np.asarray(hp.hit))


def test_pallas_sah_matches_brute_force(teapot_pack, rays):
    """Pallas traversal kernel (interpret mode off-TPU) over the native
    SAH tree must reproduce brute-force hits exactly."""
    from cse168_raytracer_tpu.ops.pallas_bvh import (
        build_pallas_bvh_sah, pallas_bvh_closest_hit_triangles)
    o, d = rays
    o, d = o[:512], d[:512]   # interpret mode is slow; keep it small
    new_pack, accel = build_pallas_bvh_sah(teapot_pack)
    h_ref = intersect_triangles(new_pack, o, d, 0.0, 1e10)
    h = pallas_bvh_closest_hit_triangles(accel, o, d, 0.0, 1e10,
                                         interpret=True)
    _check_against_brute(h, h_ref)
    occ = pallas_bvh_closest_hit_triangles(accel, o, d, 0.0, 1e10,
                                           any_hit=True, interpret=True)
    assert np.array_equal(np.asarray(occ.hit), np.asarray(h_ref.hit))


def test_pallas_sah_render_matches_block(teapot_pack):
    """End-to-end render through the Pallas SAH accelerator matches the
    block-accel render bit-for-bit on CPU."""
    import jax
    from cse168_raytracer_tpu.config import RenderConfig
    from cse168_raytracer_tpu.scenes import build
    from cse168_raytracer_tpu.ops.accel import attach_accel
    from cse168_raytracer_tpu.render.integrator import render_hdr

    cfg = RenderConfig(width=32, height=32, trace_depth=2)
    imgs = {}
    for kind in ("block", "pallas_sah"):
        scene, static, cam, c = build("teapot", cfg)
        scene = attach_accel(scene, kind=kind)
        hdr, _ = jax.jit(lambda s, st=static, cm=cam, cc=c: render_hdr(
            s, st, cm, cc, jax.random.key(0)))(scene)
        imgs[kind] = np.asarray(hdr)
    np.testing.assert_allclose(imgs["pallas_sah"], imgs["block"],
                               rtol=1e-5, atol=1e-6)


def test_pallas_forest_matches_single_tree(teapot_pack, rays):
    """Chunked forest (3 sub-trees) must reproduce the single-tree hits:
    same hit mask, same t, and prim ids that map to the same triangle."""
    from cse168_raytracer_tpu.ops.pallas_bvh import (
        build_pallas_bvh_forest, build_pallas_bvh_sah,
        forest_closest_hit_triangles, pallas_bvh_closest_hit_triangles)
    o, d = rays
    o, d = o[:384], d[:384]   # interpret mode is slow; keep it small
    n_valid = int(np.asarray(teapot_pack.valid).sum())
    f_pack, forest = build_pallas_bvh_forest(teapot_pack,
                                             chunk_tris=-(-n_valid // 3))
    assert len(forest.chunks) == 3
    s_pack, tree = build_pallas_bvh_sah(teapot_pack)
    hf = forest_closest_hit_triangles(forest, o, d, 0.0, 1e10,
                                      interpret=True)
    hs = pallas_bvh_closest_hit_triangles(tree, o, d, 0.0, 1e10,
                                          interpret=True)
    assert np.array_equal(np.asarray(hf.hit), np.asarray(hs.hit))
    both = np.asarray(hf.hit)
    np.testing.assert_allclose(np.asarray(hf.t)[both],
                               np.asarray(hs.t)[both], rtol=1e-4, atol=1e-5)
    # prim ids index different re-orderings; compare the triangles
    fv = np.asarray(f_pack.v0)[np.asarray(hf.prim_id)[both]]
    sv = np.asarray(s_pack.v0)[np.asarray(hs.prim_id)[both]]
    assert np.mean(np.all(np.abs(fv - sv) < 1e-6, axis=1)) > 0.99
    # any-hit masks agree too
    of = forest_closest_hit_triangles(forest, o, d, 0.0, 1e10,
                                      any_hit=True, interpret=True)
    assert np.array_equal(np.asarray(of.hit), np.asarray(hs.hit))


def test_pallas_hbm_matches_brute_force(teapot_pack, rays):
    """HBM-leaf whole-scene tree (per-leaf-visit DMA) must reproduce
    brute-force hits exactly — same tree as pallas_sah4, only the leaf
    table's memory space (and the kernel's DMA fetch) differ."""
    from cse168_raytracer_tpu.ops.pallas_bvh import (
        build_pallas_bvh4_hbm, pallas_bvh_closest_hit_triangles)
    o, d = rays
    o, d = o[:384], d[:384]
    new_pack, accel = build_pallas_bvh4_hbm(teapot_pack)
    h_ref = intersect_triangles(new_pack, o, d, 0.0, 1e10)
    h = pallas_bvh_closest_hit_triangles(accel, o, d, 0.0, 1e10,
                                         interpret=True)
    _check_against_brute(h, h_ref)
    occ = pallas_bvh_closest_hit_triangles(accel, o, d, 0.0, 1e10,
                                           any_hit=True, interpret=True)
    assert np.array_equal(np.asarray(occ.hit), np.asarray(h_ref.hit))


def test_pallas_bvh4_matches_brute_force(teapot_pack, rays):
    """4-wide collapsed tree must reproduce brute-force hits exactly
    (same acceptance math, different topology)."""
    from cse168_raytracer_tpu.ops.pallas_bvh import (
        build_pallas_bvh4_sah, pallas_bvh_closest_hit_triangles)
    o, d = rays
    o, d = o[:512], d[:512]
    new_pack, accel = build_pallas_bvh4_sah(teapot_pack)
    h_ref = intersect_triangles(new_pack, o, d, 0.0, 1e10)
    h = pallas_bvh_closest_hit_triangles(accel, o, d, 0.0, 1e10,
                                         interpret=True)
    _check_against_brute(h, h_ref)
    occ = pallas_bvh_closest_hit_triangles(accel, o, d, 0.0, 1e10,
                                           any_hit=True, interpret=True)
    assert np.array_equal(np.asarray(occ.hit), np.asarray(h_ref.hit))


def test_pallas_bvh4_tiny_meshes():
    """Collapse edge cases: trees whose root children are leaves."""
    from cse168_raytracer_tpu.models.geometry import pack_triangles
    from cse168_raytracer_tpu.ops.pallas_bvh import (
        build_pallas_bvh4_sah, pallas_bvh_closest_hit_triangles)
    rng = np.random.default_rng(3)
    for n_tri in (1, 33, 80):
        v = rng.normal(0, 1, (n_tri * 3, 3)).astype(np.float32)
        f = np.arange(n_tri * 3, dtype=np.int64).reshape(n_tri, 3)
        nrm = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32),
                      (n_tri * 3, 1))
        mesh = {"vertices": v, "normals": nrm,
                "texcoords": np.zeros((0, 2), np.float32),
                "tri_vidx": f, "tri_nidx": f,
                "tri_tidx": np.full((n_tri, 3), -1, np.int64)}
        pack = pack_triangles([(mesh, 0)])
        new_pack, accel = build_pallas_bvh4_sah(pack)
        o = np.zeros((130, 3), np.float32) + np.array([0, 0, -5])
        d = rng.normal(0, 1, (130, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        # brute-force via the ORIGINAL 128-padded pack (the leaf-ordered
        # pack holds the same triangles, so hit mask and t must agree)
        h_ref = intersect_triangles(pack, jnp.asarray(o),
                                    jnp.asarray(d), 0.0, 1e10)
        h = pallas_bvh_closest_hit_triangles(accel, jnp.asarray(o),
                                             jnp.asarray(d), 0.0, 1e10,
                                             interpret=True)
        assert np.array_equal(np.asarray(h.hit), np.asarray(h_ref.hit)), n_tri
        both = np.asarray(h.hit)
        np.testing.assert_allclose(np.asarray(h.t)[both],
                                   np.asarray(h_ref.t)[both],
                                   rtol=1e-4, atol=1e-5)
