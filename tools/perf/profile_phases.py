"""Per-phase TPU profiler — the source of PERF.md's tables.

Usage (from the repo root, real TPU attached):

    python tools/perf/profile_phases.py [scene] [accel-kind]

Times each render phase standalone under jit (eye rays, staging,
closest-hit kernel, surface, NEE/shade, shadow any-hit, radiance), the
in-kernel -DSTATS visit counters, and the full fwd / fwd+bwd step with
and without shadows. Every measurement passes arrays as jit ARGUMENTS
(closed-over arrays become HLO constants and break the compile-RPC
size limit at bunny20 scale).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(
                          __file__)), "..", "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(f, *a, n=10):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1000


def main():
    from cse168_raytracer_tpu.config import EPSILON, RenderConfig
    from cse168_raytracer_tpu.models.lights import nee_sample
    from cse168_raytracer_tpu.ops.accel import attach_accel
    from cse168_raytracer_tpu.ops.pallas_bvh import (
        K, PallasBVHForest, T, pallas_bvh_closest_hit_triangles)
    from cse168_raytracer_tpu.ops.shading import shade_direct, trace_closest
    from cse168_raytracer_tpu.ops.surface import make_surface
    from cse168_raytracer_tpu.render.camera import eye_rays
    from cse168_raytracer_tpu.render.integrator import render_hdr
    from cse168_raytracer_tpu.scenes import build

    scene_name = sys.argv[1] if len(sys.argv) > 1 else "bunny1"
    kind = sys.argv[2] if len(sys.argv) > 2 else "auto"
    w = h = 512
    cfg = RenderConfig(width=w, height=h, trace_depth=4)
    scene, static, cam, cfg = build(scene_name, cfg)
    t0 = time.time()
    scene = attach_accel(scene, kind=kind)
    print(f"[accel] {type(scene.accel).__name__} built in "
          f"{time.time() - t0:.1f}s")

    ys_n, xs_n = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xs_n = xs_n.reshape(-1)
    ys_n = ys_n.reshape(-1)
    order = np.lexsort((xs_n % 16, ys_n % 8, xs_n // 16, ys_n // 8))
    xs = jnp.asarray(xs_n[order])
    ys = jnp.asarray(ys_n[order])
    key = jax.random.key(0)

    f_eye = jax.jit(lambda: eye_rays(cam, xs, ys, w, h, key=None))
    print(f"eye_rays          : {timeit(f_eye):6.2f} ms")
    o, d = jax.block_until_ready(f_eye())

    acc = scene.accel
    single_tree = not isinstance(acc, PallasBVHForest)
    if single_tree:
        fs = jax.jit(lambda a, o, d: pallas_bvh_closest_hit_triangles(
            a, o, d, 1e-4, 3e37, with_stats=True))
        _, box, tri = jax.block_until_ready(fs(acc, o, d))
        nv = np.asarray(box).reshape(-1, T)[:, 0] / 4
        lv = np.asarray(tri).reshape(-1, T)[:, 0] / K
        tot = nv.sum() + lv.sum()
        fc = jax.jit(lambda a, o, d: pallas_bvh_closest_hit_triangles(
            a, o, d, 1e-4, 3e37))
        ms = timeit(fc, acc, o, d)
        print(f"closest-hit kernel: {ms:6.2f} ms   "
              f"[{len(nv)} walks, {tot:.0f} visits "
              f"({lv.sum():.0f} leaf), {ms * 1e6 / tot:.0f} ns/visit]")

    f_tc = jax.jit(lambda sc, o, d: trace_closest(sc, static, o, d))
    print(f"trace_closest     : {timeit(f_tc, scene, o, d):6.2f} ms")
    hit, surf = jax.block_until_ready(f_tc(scene, o, d))

    f_ms = jax.jit(lambda sc, o, d, hh: make_surface(
        sc.tris, sc.spheres, sc.planes, o, d, hh,
        blpatches=sc.blpatches))
    print(f"make_surface      : {timeit(f_ms, scene, o, d, hit):6.2f} ms")

    f_sd = jax.jit(lambda sc, d, su: shade_direct(sc, static, d, su,
                                                  jax.random.key(1)))
    print(f"shade_direct      : {timeit(f_sd, scene, d, surf):6.2f} ms"
          "   (incl. shadow any-hit)")

    if single_tree and static.num_lights:
        s = jax.jit(lambda sc: nee_sample(sc.lights, 0, surf.p, surf.n,
                                          jax.random.key(1)))(scene)
        jax.block_until_ready(s)
        sh_o = surf.p + s.l * EPSILON
        sh_tmax = jnp.where(surf.hit, s.dist, -1.0)
        fa = jax.jit(lambda a, o_, l: pallas_bvh_closest_hit_triangles(
            a, o_, l, 0.0, sh_tmax, any_hit=True))
        ms_a = timeit(fa, acc, sh_o, s.l)
        fas = jax.jit(lambda a, o_, l: pallas_bvh_closest_hit_triangles(
            a, o_, l, 0.0, sh_tmax, any_hit=True, with_stats=True))
        _, boxa, tria = jax.block_until_ready(fas(acc, sh_o, s.l))
        nva = np.asarray(boxa).reshape(-1, T)[:, 0] / 4
        lva = np.asarray(tria).reshape(-1, T)[:, 0] / K
        tota = nva.sum() + lva.sum()
        print(f"shadow any-hit    : {ms_a:6.2f} ms   "
              f"[{tota:.0f} visits ({lva.sum():.0f} leaf), "
              f"{ms_a * 1e6 / tota:.0f} ns/visit]")

    def mk(disable_shadows):
        import dataclasses
        cc = dataclasses.replace(cfg, disable_shadows=disable_shadows)

        def fwd(kd, sc):
            s2 = sc.replace(materials=sc.materials._replace(kd=kd))
            hdr, st = render_hdr(s2, static, cam, cc, key)
            return jnp.sum(hdr), st
        return fwd

    fwd = mk(False)
    print(f"step fwd          : "
          f"{timeit(jax.jit(fwd), scene.materials.kd, scene):6.2f} ms")
    print(f"step fwd+bwd      : "
          f"{timeit(jax.jit(jax.value_and_grad(fwd, has_aux=True)), scene.materials.kd, scene):6.2f} ms")
    fwd_ns = mk(True)
    print(f"step fwd noshadow : "
          f"{timeit(jax.jit(fwd_ns), scene.materials.kd, scene):6.2f} ms")


if __name__ == "__main__":
    main()
