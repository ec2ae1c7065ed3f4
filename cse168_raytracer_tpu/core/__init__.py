from cse168_raytracer_tpu.core import vecmath, sampling, noise  # noqa: F401
