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

def jnp_i32(v):
    import jax.numpy as jnp
    return jnp.int32(v)


def jnp_asarray(v):
    import jax.numpy as jnp
    return jnp.asarray(v)


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


def render(scene_name, spp, depth, path_tracing, seed=0, dof=False):
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
                       trace_samples=chunk, path_tracing=path_tracing,
                       dof=dof)
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


def render_photon(seed=0):
    """photon_cornell: deterministic eye rays (1 spp, depth 10) over a
    STOCHASTIC photon map (global + caustic, 200k each, k-NN 500) —
    the reference's signature radiance path (irradiance_estimate added
    at every diffuse hit, Scene.cpp:286-299). The golden
    (tests/golden/photon_cornell.ppm) is the actual reference binary
    built by tools/golden_harness/build_photon.sh; photon emission is
    frand/OpenMP-stochastic there and key-derived here, so the compare
    is statistical (8x8 block means), seed-calibrated like pt_cornell.
    """
    from cse168_raytracer_tpu.config import RenderConfig
    from cse168_raytracer_tpu.ops.accel import attach_accel
    from cse168_raytracer_tpu.ops.photon import build_photon_maps
    from cse168_raytracer_tpu.render.integrator import render_hdr
    from cse168_raytracer_tpu.render.tonemap import (sigmoid_tonemap,
                                                     to_bytes)
    from cse168_raytracer_tpu.scenes import build

    # max_per_cell 32 halves the gather's candidate fetches (the
    # latency-bound cost driver); overflow folds preserve energy and
    # the k-NN radius search rides the fold weights, so the estimator
    # stays Jensen-consistent at block-mean scale
    cfg = RenderConfig(width=512, height=512, trace_depth=10,
                       trace_samples=1, path_tracing=False,
                       photon_grid_max_per_cell=32,
                       # reach the full 200k caustic target like the
                       # reference's uncapped loop (store rate ~0.3%)
                       photon_max_batches=1200)
    scene, static, cam, cfg = build("photon_cornell", cfg)
    scene = attach_accel(scene)
    t0 = time.time()
    photons = build_photon_maps(scene, static, cfg,
                                jax.random.key(1000 + seed))
    scene = scene.replace(photons=photons)

    # each 64-row band is its own DISPATCH (the tunneled device kills
    # single dispatches past ~5-10 min; the photon gathers are ~10 s
    # per 262k-lane irradiance call). y0 is traced: one compile.
    from cse168_raytracer_tpu.render.integrator import render_hdr_band

    def run_band(s, key, y0):
        hdr, _ = render_hdr_band(s, static, cam, cfg, key, y0, 64)
        return hdr

    runj = jax.jit(run_band)
    bands = []
    for b in range(8):
        bands.append(np.asarray(jax.block_until_ready(
            runj(scene, jax.random.key(seed), jnp_i32(b * 64)))))
    hdr = np.concatenate(bands, axis=0)
    dt = time.time() - t0
    img = np.asarray(to_bytes(sigmoid_tonemap(jnp_asarray(hdr))))[::-1]
    return img, type(scene.accel).__name__, dt


def _degenerate_uv_mask(scene_name):
    """(512, 512) bool: pixels whose closest hit lands on a triangle
    with a ZERO reference-style Cramer-axis determinant (the axis pick
    of Triangle.cpp:190-202 in f32) — the reference's UV there is 0/0.
    Derived from OUR hits (identical geometry); dilated by one pixel
    to absorb f32 boundary jitter at the degenerate triangles' edges.
    """
    import jax.numpy as jnp
    from cse168_raytracer_tpu.config import RenderConfig
    from cse168_raytracer_tpu.ops.accel import attach_accel, \
        scene_closest_hit
    from cse168_raytracer_tpu.render.camera import eye_rays
    from cse168_raytracer_tpu.scenes import build

    cfg = RenderConfig(width=512, height=512)
    scene, static, cam, cfg = build(scene_name, cfg)
    scene = attach_accel(scene)
    ys, xs = np.meshgrid(np.arange(512), np.arange(512), indexing="ij")
    o, d = jax.jit(lambda: eye_rays(cam, jnp.asarray(xs.reshape(-1)),
                                    jnp.asarray(ys.reshape(-1)),
                                    512, 512, key=None))()
    hit = jax.jit(lambda s, o, d: scene_closest_hit(
        s.accel, s.tris, s.spheres, s.planes, o, d,
        blpatches=s.blpatches))(scene, o, d)
    tri = np.asarray(hit.prim_type) == 1
    ids = np.where(tri, np.asarray(hit.prim_id), 0)
    e1 = np.asarray(scene.tris.e1)[ids]
    e2 = np.asarray(scene.tris.e2)[ids]
    ng = np.asarray(scene.tris.n_geo)[ids]
    i_idx = np.where(ng[:, 0] > ng[:, 2], 2, 0)
    j_idx = np.where(ng[:, 0] > ng[:, 2], 1,
                     np.where(ng[:, 1] > ng[:, 2], 2, 1))
    take = lambda a, k: a[np.arange(a.shape[0]), k]
    det = (take(e1, i_idx) * take(e2, j_idx)
           - take(e2, i_idx) * take(e1, j_idx)).astype(np.float32)
    mask = (tri & (det == 0.0)).reshape(512, 512)[::-1]
    grown = mask.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grown |= np.roll(mask, (dy, dx), axis=(0, 1))
    return grown


def main():
    results = []
    ok_all = True

    # --- 1. full-frame deterministic goldens, default Pallas accel ---
    for scene_name, golden in [("teapot", "teapot.ppm"),
                               ("bunny1", "bunny1.ppm"),
                               ("cornell", "cornell.ppm"),
                               ("test_sphere", "testsphere.ppm"),
                               # bilinear image-texture path: the
                               # reference built with the REAL minimal
                               # FreeImage backend over gfx/earth.jpg
                               # (tools/golden_harness/build_earth.sh)
                               ("sphere_texture", "spheretexture.ppm")]:
        ref = load_ppm(os.path.join(GOLDEN_DIR, golden))
        img, kind, dt = render(scene_name, 1, 10, False)
        diff = np.abs(img.astype(np.int32) - ref.astype(np.int32))
        excl_frac = 0.0
        if scene_name == "sphere_texture":
            # pixels whose winning triangle has a ZERO Cramer-axis
            # determinant produce 0/0 = NaN texture coordinates in the
            # reference (Triangle.cpp:190-221 divides unguarded; the
            # NaN radiance tonemaps to a flat 221 gray) — instrumented
            # in the harness build: shadeResult=(-nan,-nan,-nan) at
            # those pixels. Our UV path guards the division (AD needs
            # finite forwards), so the reference's undefined pixels
            # are EXCLUDED from the deterministic comparison.
            mask = _degenerate_uv_mask(scene_name)
            excl_frac = float(mask.mean())
            diff = diff[~mask]
        frac2 = float(np.mean(diff <= 2))
        entry = {
            "case": f"golden_fullframe_{scene_name}",
            "accel": kind,
            "max_diff": int(diff.max()),
            "mean_diff": round(float(diff.mean()), 4),
            "frac_within_2": round(frac2, 5),
            "seconds": round(dt, 2),
            "pass": bool(frac2 >= 0.999 and diff.mean() <= 0.05
                         and excl_frac <= 0.02),
        }
        if excl_frac:
            entry["excluded_nan_uv_frac"] = round(excl_frac, 5)
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

    # --- 3. depth-of-field vs the reference BINARY (-DDOF build) ---
    gpath = os.path.join(GOLDEN_DIR, "dof_bunny20.ppm")
    if os.path.exists(gpath):
        def blocks(x):
            return (x.astype(np.float64)
                    .reshape(64, 8, 64, 8, 3).mean(axis=(1, 3)))
        ref = load_ppm(gpath)
        # thin-lens sampling (Camera.cpp:135-148, aperture .20 focus
        # 15.3). The -DDOF reference build runs the TRACE_SAMPLES=1000
        # sampling loop (Scene.cpp:126-139), so the golden is nearly
        # converged; ours renders 20 lens samples/pixel and compares
        # 8x8 block means (1280 samples/block) with the seed-calibrated
        # tolerance
        img_a, kind, dt = render("bunny20", 20, 10, False, seed=0,
                                 dof=True)
        img_b, _, _ = render("bunny20", 20, 10, False, seed=1, dof=True)
        ba, bb, br = blocks(img_a), blocks(img_b), blocks(ref)
        self_rms = float(np.sqrt(np.mean((ba - bb) ** 2)))
        ref_rms = float(np.sqrt(np.mean((ba - br) ** 2)))
        tol = 3.0 * self_rms + 1.0
        entry = {
            "case": "dof_bunny20",
            "accel": kind,
            "seconds": round(dt, 2),
            "block_rms_vs_reference": round(ref_rms, 3),
            "block_rms_seed_to_seed": round(self_rms, 3),
            "block_mean_abs_vs_reference": round(
                float(np.mean(np.abs(ba - br))), 3),
            "tolerance": round(tol, 3),
            "pass": bool(ref_rms <= tol),
        }
        ok_all &= entry["pass"]
        results.append(entry)
        print(entry, flush=True)
    else:
        results.append({"case": "dof_bunny20", "pass": None,
                        "note": "run tools/golden_harness/build_dof.sh"})

    # --- 4. photon-mapped radiance vs the reference BINARY ---
    gpath = os.path.join(GOLDEN_DIR, "photon_cornell.ppm")
    if os.path.exists(gpath):
        def blocks(x):
            return (x.astype(np.float64)
                    .reshape(64, 8, 64, 8, 3).mean(axis=(1, 3)))
        ref = load_ppm(gpath)
        img_a, kind, dt = render_photon(seed=0)
        img_b, _, _ = render_photon(seed=1)
        ba, bb, br = blocks(img_a), blocks(img_b), blocks(ref)
        self_rms = float(np.sqrt(np.mean((ba - bb) ** 2)))
        ref_rms = float(np.sqrt(np.mean((ba - br) ** 2)))
        tol = 3.0 * self_rms + 1.0
        entry = {
            "case": "photon_cornell",
            "accel": kind,
            "seconds": round(dt, 2),
            "block_rms_vs_reference": round(ref_rms, 3),
            "block_rms_seed_to_seed": round(self_rms, 3),
            "block_mean_abs_vs_reference": round(
                float(np.mean(np.abs(ba - br))), 3),
            "tolerance": round(tol, 3),
            "pass": bool(ref_rms <= tol),
        }
        ok_all &= entry["pass"]
        results.append(entry)
        print(entry, flush=True)
    else:
        results.append({"case": "photon_cornell", "pass": None,
                        "note": "run tools/golden_harness/build_photon.sh"})

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "results": results, "all_pass": bool(ok_all)}
    with open(os.path.join(REPO, "GOLDEN_TPU.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"[golden_tpu] all_pass={ok_all} -> GOLDEN_TPU.json", flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
