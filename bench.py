"""Benchmark harness: rays/sec/chip forward+backward at sponza 1spp
(the BASELINE.json north-star metric).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's implied sponza+shadows
throughput: 524,288 rays / 0.16675 s = 3.144 M rays/s on a 16-thread
x86 (writeup/A2/Readme.tex:83,98 — forward only; ours times forward
AND backward).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_SEC = 524288 / 0.16675  # ~3.144e6, reference sponza+shadows

WIDTH = HEIGHT = 512
DEPTH = 4


def main():
    from cse168_raytracer_tpu.config import RenderConfig
    from cse168_raytracer_tpu.ops.accel import attach_accel
    from cse168_raytracer_tpu.render.integrator import render_hdr
    from cse168_raytracer_tpu.scenes import build

    cfg = RenderConfig(width=WIDTH, height=HEIGHT, trace_depth=DEPTH)
    scene, static, cam, cfg = build("sponza", cfg)
    scene = attach_accel(scene)
    key = jax.random.key(0)

    def fwd_bwd(kd):
        s = scene.replace(materials=scene.materials._replace(kd=kd))
        hdr, stats = render_hdr(s, static, cam, cfg, key)
        return jnp.sum(hdr), stats

    step = jax.jit(jax.value_and_grad(fwd_bwd, has_aux=True))

    # compile + warmup
    (val, stats), g = step(scene.materials.kd)
    jax.block_until_ready(g)

    n_iter = 3
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
        "metric": "sponza_512_fwd+bwd_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))
    print(f"[bench] {rays} rays in {dt*1000:.1f} ms/step "
          f"(backend={jax.default_backend()}, depth={DEPTH})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
