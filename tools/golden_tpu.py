"""On-TPU golden parity driver — produces GOLDEN_TPU.json.

Covers the two golden gaps the CPU pytest suite cannot (conftest pins
the suite to the virtual-CPU backend, and 512^2 x 16 spp x depth 10 is
hours on this 2-core host):

1. FULL-FRAME deterministic parity through the DEFAULT Pallas
   accelerator on the real chip, for all four reference-rendered
   goldens (tests/golden/*.ppm came from the actual C++ build;
   tests/test_golden.py renders cornell only as a 96-row band on CPU
   and pins kind="bvh"/"block").
2. STATISTICAL parity of the sampled (path-tracing) integrator against
   the reference's own published cornell renders
   (/root/reference/output/A2/...cornell_{16,100}samples.png, scene
   assignment2.cpp:373-442, sampling loop Scene.cpp:126-139): both
   images are 16/100-sample Monte-Carlo means with different RNG
   streams, so they are compared as 8x8 box means with a tolerance of
   a few MC standard errors (estimated from OUR per-block sample
   variance) plus the deterministic-parity floor.

Run on the real chip (takes a few minutes):

    python tools/golden_tpu.py

Exit code 0 iff every case passes; the JSON records per-case metrics
either way.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(
                          __file__)), "..", ".jax_cache"))

import jax
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")
REF_OUT = "/root/reference/output/A2"


def load_ppm(path):
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        assert f.readline().strip() == b"255"
        return np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)


def render(scene_name, spp, depth, path_tracing, seed=0):
    from cse168_raytracer_tpu.config import RenderConfig
    from cse168_raytracer_tpu.ops.accel import attach_accel
    from cse168_raytracer_tpu.render.integrator import render_hdr
    from cse168_raytracer_tpu.render.tonemap import (sigmoid_tonemap,
                                                     to_bytes)
    from cse168_raytracer_tpu.scenes import build

    # one dispatch must stay under the device/tunnel execution limit
    # (~a few minutes): split high spp into chunked dispatches of <= 20
    # samples and average the HDR — the same MC estimator, keys derived
    # per chunk
    chunk = min(spp, 20)
    n_chunks = -(-spp // chunk)
    cfg = RenderConfig(width=512, height=512, trace_depth=depth,
                       trace_samples=chunk, path_tracing=path_tracing)
    scene, static, cam, cfg = build(scene_name, cfg)
    scene = attach_accel(scene)          # DEFAULT accel = Pallas on TPU
    accel_kind = type(scene.accel).__name__

    def run(kd, s, key):
        s = s.replace(materials=s.materials._replace(kd=kd))
        hdr, _ = render_hdr(s, static, cam, cfg, key)
        return hdr

    runj = jax.jit(run)
    t0 = time.time()
    acc = None
    for c in range(n_chunks):
        key = jax.random.fold_in(jax.random.key(seed), c)
        hdr = jax.block_until_ready(runj(scene.materials.kd, scene, key))
        acc = hdr if acc is None else acc + hdr
    dt = time.time() - t0
    img = np.asarray(to_bytes(sigmoid_tonemap(acc / n_chunks)))[::-1]
    return img, accel_kind, dt


def main():
    results = []
    ok_all = True

    # --- 1. full-frame deterministic goldens, default Pallas accel ---
    for scene_name, golden in [("teapot", "teapot.ppm"),
                               ("bunny1", "bunny1.ppm"),
                               ("cornell", "cornell.ppm"),
                               ("test_sphere", "testsphere.ppm")]:
        ref = load_ppm(os.path.join(GOLDEN_DIR, golden))
        img, kind, dt = render(scene_name, 1, 10, False)
        diff = np.abs(img.astype(np.int32) - ref.astype(np.int32))
        frac2 = float(np.mean(diff <= 2))
        entry = {
            "case": f"golden_fullframe_{scene_name}",
            "accel": kind,
            "max_diff": int(diff.max()),
            "mean_diff": round(float(diff.mean()), 4),
            "frac_within_2": round(frac2, 5),
            "seconds": round(dt, 2),
            "pass": bool(frac2 >= 0.999 and diff.mean() <= 0.05),
        }
        ok_all &= entry["pass"]
        results.append(entry)
        print(entry, flush=True)

    # --- 2. path-traced cornell vs the reference BINARY's MC renders ---
    # tests/golden/cornell_pt{16,100}.ppm come from the actual current
    # reference source built with -DPATH_TRACING (tools/golden_harness/
    # build_pt.sh). The repo's published PNGs (output/A2/...samples.png)
    # are from a DIFFERENT code state — the current source's own
    # deterministic render disagrees with them by block-RMS ~31/255 —
    # so they are reported informationally, not gated on.
    def blocks(x):
        return (x.astype(np.float64)
                .reshape(64, 8, 64, 8, 3).mean(axis=(1, 3)))

    for spp, hist in [(16, "lawson_alisha-lien_hallgeir-cornell_16samples.png"),
                      (100, "lawson_alisha-lien_hallgeir-cornell_100samples.png")]:
        gpath = os.path.join(GOLDEN_DIR, f"cornell_pt{spp}.ppm")
        if not os.path.exists(gpath):
            results.append({"case": f"pt_cornell_{spp}spp",
                            "pass": None,
                            "note": "run tools/golden_harness/build_pt.sh"})
            continue
        ref = load_ppm(gpath)
        # two independent seeds calibrate the jitter-noise scale of the
        # estimator itself before comparing to the reference's stream
        img_a, kind, dt = render("cornell", spp, 10, True, seed=0)
        img_b, _, _ = render("cornell", spp, 10, True, seed=1)

        ba, bb, br = blocks(img_a), blocks(img_b), blocks(ref)
        self_rms = float(np.sqrt(np.mean((ba - bb) ** 2)))
        ref_rms = float(np.sqrt(np.mean((ba - br) ** 2)))
        ref_mean_abs = float(np.mean(np.abs(ba - br)))
        # MC-error-scaled tolerance + a 1/255 quantization/impl floor
        tol = 3.0 * self_rms + 1.0
        entry = {
            "case": f"pt_cornell_{spp}spp",
            "accel": kind,
            "seconds": round(dt, 2),
            "block_rms_vs_reference": round(ref_rms, 3),
            "block_rms_seed_to_seed": round(self_rms, 3),
            "block_mean_abs_vs_reference": round(ref_mean_abs, 3),
            "tolerance": round(tol, 3),
            "pass": bool(ref_rms <= tol),
        }
        hpath = os.path.join(REF_OUT, hist)
        if os.path.exists(hpath):
            import imageio.v2 as iio
            bh = blocks(np.asarray(iio.imread(hpath))[..., :3])
            entry["block_rms_vs_historical_png"] = round(
                float(np.sqrt(np.mean((ba - bh) ** 2))), 3)
        ok_all &= entry["pass"]
        results.append(entry)
        print(entry, flush=True)

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "results": results, "all_pass": bool(ok_all)}
    with open(os.path.join(REPO, "GOLDEN_TPU.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"[golden_tpu] all_pass={ok_all} -> GOLDEN_TPU.json", flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
