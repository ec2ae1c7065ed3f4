import time, jax, jax.numpy as jnp, numpy as np
from cse168_raytracer_tpu.config import RenderConfig
from cse168_raytracer_tpu.ops.accel import attach_accel, accel_intersect_triangles, accel_any_hit_triangles
from cse168_raytracer_tpu.render.camera import eye_rays
from cse168_raytracer_tpu.scenes import build

cfg = RenderConfig(width=512, height=512, trace_depth=4)
scene, static, cam, cfg = build("sponza", cfg)
scene = attach_accel(scene)

ys, xs = jnp.meshgrid(jnp.arange(512), jnp.arange(512), indexing="ij")
o, d = eye_rays(cam, xs.reshape(-1), ys.reshape(-1), 512, 512, key=None)

# square-tile permutation: 64 rows x 128 cols tiles = 8192 pixels/tile
def tile_perm(h, w, th, tw):
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    key = ((ys // th) * (w // tw) + (xs // tw)) * (th * tw) \
        + (ys % th) * tw + (xs % tw)
    return np.argsort(key.reshape(-1), kind="stable")

perm = jnp.asarray(tile_perm(512, 512, 64, 128))
o_sq, d_sq = o[perm], d[perm]

def timeit(name, fn, *args, n=5):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms")

chit = jax.jit(lambda o, d: accel_intersect_triangles(scene.accel, scene.tris, o, d, 0.0, 1e30))
timeit("closest row-major", chit, o, d)
timeit("closest square-tile", chit, o_sq, d_sq)
anyh = jax.jit(lambda o, d: accel_any_hit_triangles(scene.accel, scene.tris, o, d, 0.001, 10.0))
timeit("anyhit row-major", anyh, o, d)
timeit("anyhit square-tile", anyh, o_sq, d_sq)
