import time, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from cse168_raytracer_tpu.config import RenderConfig
from cse168_raytracer_tpu.ops.accel import attach_accel
from cse168_raytracer_tpu.ops.shading import trace_closest, shade_direct
from cse168_raytracer_tpu.render.camera import eye_rays
from cse168_raytracer_tpu.scenes import build

cfg = RenderConfig(width=512, height=512, trace_depth=4)
scene, static, cam, cfg = build("bunny1", cfg)
scene = attach_accel(scene)
h_, w_ = 512, 512
ys_n, xs_n = np.meshgrid(np.arange(h_), np.arange(w_), indexing="ij")
xs_n = xs_n.reshape(-1); ys_n = ys_n.reshape(-1)
order = np.lexsort((xs_n % 16, ys_n % 8, xs_n // 16, ys_n // 8))
xs = jnp.asarray(xs_n[order]); ys = jnp.asarray(ys_n[order])
pixel = jnp.asarray((ys_n[order] * w_ + xs_n[order]).astype(np.int32))

def timeit(f, *a, n=10):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.time()-t0)/n*1000

f_eye = jax.jit(lambda: eye_rays(cam, xs, ys, w_, h_, key=None))
print("eye_rays      :", round(timeit(f_eye), 2), "ms", flush=True)
o, d = jax.block_until_ready(f_eye())

# input staging for the pallas kernel (r8 + rmat concats)
def staging(o, d):
    n = o.shape[0]
    tmin = jnp.full((n,), 1e-4); tmax = jnp.full((n,), 3e37)
    m = jnp.cross(o, d)
    rcp = 1.0 / d
    r8 = jnp.concatenate([o, rcp, tmin[:, None], tmax[:, None]], axis=1)
    ones = jnp.ones((n, 1), jnp.float32); zeros = jnp.zeros((n, 4), jnp.float32)
    rmat = jnp.concatenate([d, m, o, ones, tmin[:, None], tmax[:, None], zeros], axis=1)
    return r8, rmat
print("kernel staging:", round(timeit(jax.jit(staging), o, d), 2), "ms", flush=True)

f_tc = jax.jit(lambda o, d: trace_closest(scene, static, o, d))
print("trace_closest :", round(timeit(f_tc, o, d), 2), "ms  (traversal + surface)", flush=True)
hit, surf = jax.block_until_ready(f_tc(o, d))

f_sd = jax.jit(lambda: shade_direct(scene, static, d, surf, jax.random.key(1)))
print("shade_direct  :", round(timeit(f_sd), 2), "ms  (NEE + shadow anyhit)", flush=True)

f_sd2 = jax.jit(lambda: shade_direct(scene, static, d, surf, jax.random.key(1), disable_shadows=True))
print("shade noshadow:", round(timeit(f_sd2), 2), "ms  (NEE math only)", flush=True)

direct, _, _ = jax.block_until_ready(f_sd())
def scat(v):
    rad = jnp.zeros((w_*h_, 3), jnp.float32)
    return rad.at[pixel].add(v, mode="drop")
print("radiance scat :", round(timeit(jax.jit(scat), direct), 2), "ms", flush=True)
