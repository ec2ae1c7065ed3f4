import time, jax, jax.numpy as jnp, numpy as np
from cse168_raytracer_tpu.config import RenderConfig, EPSILON
from cse168_raytracer_tpu.ops.accel import attach_accel
from cse168_raytracer_tpu.ops.intersect import _ray6, _ray4, _DEN_TINY, _BIG
from cse168_raytracer_tpu.render.camera import eye_rays
from cse168_raytracer_tpu.scenes import build

cfg = RenderConfig(width=512, height=512, trace_depth=4)
scene, static, cam, cfg = build("sponza", cfg)
scene = attach_accel(scene)
pack = scene.tris
T = pack.num_tris
print("tris", T)

ys, xs = jnp.meshgrid(jnp.arange(512), jnp.arange(512), indexing="ij")
o, d = eye_rays(cam, xs.reshape(-1), ys.reshape(-1), 512, 512, key=None)

def flat_closest(o, d, tile=8192):
    n = o.shape[0]
    w6 = pack.w6.reshape(6, T * 3)
    w4 = pack.w4          # (4, T)
    valid = pack.valid
    o_t = o.reshape(n // tile, tile, 3)
    d_t = d.reshape(n // tile, tile, 3)

    def body(_, od):
        o_, d_ = od
        r6 = _ray6(o_, d_)          # (tile, 6)
        r4 = _ray4(o_)              # (tile, 4)
        nums = jnp.dot(r6, w6, preferred_element_type=jnp.float32)
        nums = nums.reshape(tile, T, 3)
        t_num = jnp.dot(r4, w4, preferred_element_type=jnp.float32)
        den = nums[:, :, 2]
        safe = jnp.where(jnp.abs(den) < _DEN_TINY, 1.0, den)
        inv = 1.0 / safe
        beta = nums[:, :, 0] * inv
        gamma = nums[:, :, 1] * inv
        t = t_num * inv
        ok = ((beta >= -EPSILON) & (gamma >= -EPSILON)
              & (beta + gamma <= 1.0 + EPSILON) & (t >= 0.0)
              & (jnp.abs(den) >= _DEN_TINY) & valid[None, :])
        tm = jnp.where(ok, t, _BIG)
        return None, (jnp.min(tm, axis=1), jnp.argmin(tm, axis=1))

    _, (bt, bid) = jax.lax.scan(body, None, (o_t, d_t))
    return bt.reshape(-1), bid.reshape(-1)

def timeit(name, fn, *args, n=5):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms")

for tile in (4096, 8192, 16384, 32768):
    f = jax.jit(lambda o, d, t=tile: flat_closest(o, d, t))
    timeit(f"flat tile={tile}", f, o, d)
