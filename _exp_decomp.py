import time, jax, jax.numpy as jnp, dataclasses
from cse168_raytracer_tpu.config import RenderConfig
from cse168_raytracer_tpu.ops.accel import attach_accel
from cse168_raytracer_tpu.render.integrator import render_hdr
from cse168_raytracer_tpu.scenes import build

base = RenderConfig(width=512, height=512, trace_depth=4)
scene, static, cam, base = build("sponza", base)
scene = attach_accel(scene)
key = jax.random.key(0)

def timeit(name, cfg, n=5):
    f = jax.jit(lambda s, k: render_hdr(s, static, cam, cfg, k)[0])
    r = f(scene, key); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n): r = f(scene, key)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)

timeit("depth=4 shadows", base)
timeit("depth=1 shadows", dataclasses.replace(base, trace_depth=1))
timeit("depth=4 noshadow", dataclasses.replace(base, disable_shadows=True))
timeit("depth=1 noshadow", dataclasses.replace(base, trace_depth=1, disable_shadows=True))
