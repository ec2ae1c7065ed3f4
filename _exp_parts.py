import time, jax, jax.numpy as jnp
from cse168_raytracer_tpu.config import RenderConfig
from cse168_raytracer_tpu.ops.accel import attach_accel
from cse168_raytracer_tpu.ops.shading import trace_closest, shade_direct
from cse168_raytracer_tpu.render.camera import eye_rays
from cse168_raytracer_tpu.render.integrator import integrate
from cse168_raytracer_tpu.scenes import build

cfg = RenderConfig(width=512, height=512, trace_depth=4)
scene, static, cam, cfg = build("sponza", cfg)
scene = attach_accel(scene)
key = jax.random.key(0)
ys, xs = jnp.meshgrid(jnp.arange(512), jnp.arange(512), indexing="ij")
xs = xs.reshape(-1); ys = ys.reshape(-1)
pix = (ys * 512 + xs).astype(jnp.int32)

def timeit(name, fn, *args, n=5):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return r

f_eye = jax.jit(lambda: eye_rays(cam, xs, ys, 512, 512, key=None))
o, d = timeit("eye_rays", f_eye)

f_tc = jax.jit(lambda o, d: trace_closest(scene, static, o, d))
hit, surf = timeit("trace_closest(+surface)", f_tc, o, d)

f_sh = jax.jit(lambda d_, s: shade_direct(scene, static, d_, s, key, disable_shadows=True)[0])
timeit("shade_direct noshadow", f_sh, d, surf)
f_sh2 = jax.jit(lambda d_, s: shade_direct(scene, static, d_, s, key, disable_shadows=False)[0])
timeit("shade_direct shadow", f_sh2, d, surf)

f_scat = jax.jit(lambda v, p: jnp.zeros((512*512, 3)).at[p].add(v, mode="drop"))
timeit("scatter-add 262k", f_scat, surf.p, pix)

f_int = jax.jit(lambda o, d, k: integrate(scene, static, o, d, pix, 512*512, k, 4, False)[0])
timeit("integrate depth4", f_int, o, d, key)
