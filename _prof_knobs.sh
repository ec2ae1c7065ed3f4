#!/bin/bash
cat > /root/repo/_knob_bench.py <<'PYEOF'
import time, os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from cse168_raytracer_tpu.config import RenderConfig, EPSILON
from cse168_raytracer_tpu.ops.pallas_bvh import (build_pallas_bvh4_sah,
    pallas_bvh_closest_hit_triangles, _LEAF_PRECISION, _ORDERED4)
from cse168_raytracer_tpu.ops.shading import trace_closest
from cse168_raytracer_tpu.models.lights import nee_sample
from cse168_raytracer_tpu.ops.accel import attach_accel
from cse168_raytracer_tpu.render.camera import eye_rays
from cse168_raytracer_tpu.scenes import build

tag = sys.argv[1]
cfg = RenderConfig(width=512, height=512, trace_depth=4)
scene, static, cam, cfg = build("bunny1", cfg)
scene = attach_accel(scene)
h_, w_ = 512, 512
ys_n, xs_n = np.meshgrid(np.arange(h_), np.arange(w_), indexing="ij")
xs_n = xs_n.reshape(-1); ys_n = ys_n.reshape(-1)
order = np.lexsort((xs_n % 16, ys_n % 8, xs_n // 16, ys_n // 8))
xs = jnp.asarray(xs_n[order]); ys = jnp.asarray(ys_n[order])
o, d = eye_rays(cam, xs, ys, w_, h_, key=None)

def timeit(f, n=10):
    r = f(); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    return (time.time()-t0)/n*1000

fc = jax.jit(lambda: pallas_bvh_closest_hit_triangles(
    scene.accel, o, d, 1e-4, 3e37))
h = fc()
closest_ms = timeit(fc)
# shadow rays
@jax.jit
def shadow_inputs():
    hit, surf = trace_closest(scene, static, o, d)
    s = nee_sample(scene.lights, 0, surf.p, surf.n, jax.random.key(1))
    return surf.p + s.l * EPSILON, s.l, jnp.where(surf.hit, s.dist, -1.0)
sh_o, sh_l, sh_tmax = jax.block_until_ready(shadow_inputs())
fa = jax.jit(lambda: pallas_bvh_closest_hit_triangles(
    scene.accel, sh_o, sh_l, 0.0, sh_tmax, any_hit=True))
anyhit_ms = timeit(fa)
fs = jax.jit(lambda: pallas_bvh_closest_hit_triangles(
    scene.accel, o, d, 1e-4, 3e37, with_stats=True))
_, box, tri = fs()
print(f"[{tag}] closest {closest_ms:.2f} ms  shadow-anyhit {anyhit_ms:.2f} ms"
      f"  hits {int(np.asarray(h.hit).sum())}  box/ray {float(box.mean()):.1f}"
      f"  tri/ray {float(tri.mean()):.1f}", flush=True)
PYEOF
for cfgv in "highest 1" "highest 0" "high 1" "default 1"; do
  set -- $cfgv
  CSE168_LEAF_PRECISION=$1 CSE168_ORDERED4=$2 timeout 2500 python -u /root/repo/_knob_bench.py "prec=$1 ord=$2" 2>&1 | grep -v WARNING | grep "\["
done
rm -f /root/repo/_knob_bench.py
