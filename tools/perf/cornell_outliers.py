"""Root-cause the cornell full-frame golden's outlier pixels.

The r04 verdict flagged max|diff| = 62/255 concentrated in depth-10
Fresnel chains (GOLDEN_TPU cornell case). This tool:

1. renders cornell 512^2 depth 10 on the default (Pallas) accel and
   diffs against tests/golden/cornell.ppm;
2. re-renders the top outlier pixels through the BRUTE-FORCE
   (accel=None) intersector on CPU at the same depth;
3. classifies each outlier: if the brute-force pixel agrees with the
   Pallas pixel, the deviation is integrator/f32 arithmetic vs the
   reference's (expression-order sensitivity through long Fresnel
   chains); if brute-force agrees with the REFERENCE instead, the
   deviation is accelerator-specific (leaf visit order flipping an
   exact best-t tie).

Run on the real chip: python tools/perf/cornell_outliers.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(
                          __file__)), "..", "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    import golden_tpu as G
    from cse168_raytracer_tpu.config import RenderConfig
    from cse168_raytracer_tpu.ops.shading import trace_closest
    from cse168_raytracer_tpu.render.camera import eye_rays
    from cse168_raytracer_tpu.render.integrator import integrate
    from cse168_raytracer_tpu.render.tonemap import sigmoid_tonemap, to_bytes
    from cse168_raytracer_tpu.scenes import build

    ref = G.load_ppm(os.path.join(G.GOLDEN_DIR, "cornell.ppm"))
    img, kind, dt = G.render("cornell", 1, 10, False)
    diff = np.abs(img.astype(np.int32) - ref.astype(np.int32)).sum(-1)
    order = np.argsort(diff.reshape(-1))[::-1][:16]
    ys_img, xs_img = np.unravel_index(order, diff.shape)
    print(f"[outliers] max ch-sum diff {diff.max()} at "
          f"{list(zip(ys_img.tolist(), xs_img.tolist()))[:4]}")

    # brute-force re-render of those pixels on CPU (accel=None)
    cfg = RenderConfig(width=512, height=512, trace_depth=10)
    scene, static, cam, cfg = build("cornell", cfg)
    cpu = jax.devices("cpu")[0]
    scene_c = jax.device_put(scene, cpu)
    ys_int = jnp.asarray(511 - ys_img)       # image row -> camera row
    xs_int = jnp.asarray(xs_img)
    with jax.default_device(cpu):
        o, d = eye_rays(cam, xs_int, ys_int, 512, 512, key=None)
        n = o.shape[0]
        rad, _ = integrate(scene_c, static, o, d,
                           jnp.arange(n, dtype=jnp.int32), n,
                           jax.random.key(0), 10, path_tracing=False)
        brute = np.asarray(to_bytes(sigmoid_tonemap(rad)))

    rows = []
    for k in range(len(order)):
        y, x = int(ys_img[k]), int(xs_img[k])
        rows.append({
            "pixel": (y, x),
            "pallas": img[y, x].tolist(),
            "reference": ref[y, x].tolist(),
            "brute_cpu": brute[k].tolist(),
            "pallas_vs_brute": int(np.abs(
                img[y, x].astype(int) - brute[k].astype(int)).max()),
            "brute_vs_ref": int(np.abs(
                brute[k].astype(int) - ref[y, x].astype(int)).max()),
        })
    for r in rows:
        print(r)
    n_kernel = sum(1 for r in rows
                   if r["pallas_vs_brute"] > r["brute_vs_ref"] + 2)
    n_arith = sum(1 for r in rows
                  if r["brute_vs_ref"] > r["pallas_vs_brute"] + 2)
    print(f"[classify] accel-order-specific: {n_kernel}, "
          f"integrator-arithmetic: {n_arith}, "
          f"ambiguous: {len(rows) - n_kernel - n_arith}")


if __name__ == "__main__":
    main()
