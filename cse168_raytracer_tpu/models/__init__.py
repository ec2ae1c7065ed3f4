from cse168_raytracer_tpu.models.obj import load_obj  # noqa: F401
from cse168_raytracer_tpu.models.geometry import (  # noqa: F401
    Mesh, TrianglePack, SpherePool, PlanePool, pack_triangles,
)
