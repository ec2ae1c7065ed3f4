"""cse168_raytracer_tpu — a TPU-native differentiable ray/path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
CSE168 C++ reference tracer (Whitted ray tracing, Monte-Carlo path
tracing, photon mapping, BVH acceleration, procedural + image textures,
HDR environment maps, depth of field), re-designed TPU-first:

- SoA scene pytrees instead of virtual-dispatch object graphs
- wavefront (per-bounce queue) integration instead of recursion
- MXU matmul ray-triangle intersection (Pluecker form) instead of
  per-ray SSE packets (reference SSE.h, BVH.cpp:341-435)
- Morton-clustered triangle blocks + AABB stream culling instead of
  a recursive SAH BVH walk (reference BVH.cpp:438-658)
- fixed-radius hashed-grid photon gather instead of a kd-tree kNN
  (reference PhotonMap.cpp:152-243)
- jax.random key threading instead of racy libc rand()
- shard_map pixel-tile / photon-batch sharding over a device mesh
  instead of OpenMP threads (reference Scene.cpp:112-115)
"""

__version__ = "0.1.0"

from cse168_raytracer_tpu.config import RenderConfig  # noqa: F401
