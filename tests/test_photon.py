"""Photon mapping tests: emission gates, RR semantics, grid gather."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cse168_raytracer_tpu.config import PI, RenderConfig
from cse168_raytracer_tpu.models.geometry import (make_plane_pool,
                                                  make_sphere_pool)
from cse168_raytracer_tpu.models.lights import (LIGHT_DIRECTIONAL_AREA,
                                                LIGHT_POINT)
from cse168_raytracer_tpu.models.materials import MaterialBuilder
from cse168_raytracer_tpu.models.scene import make_scene
from cse168_raytracer_tpu.ops.photon import (build_grid, build_photon_maps,
                                             grid_irradiance,
                                             trace_photon_batch)


@pytest.fixture(scope="module")
def caustic_scene():
    """Glass sphere over a diffuse floor under a directional beam."""
    mb = MaterialBuilder()
    floor = mb.phong(kd=(0.8, 0.8, 0.8))
    glass = mb.phong(kd=(0, 0, 0), kt=(1, 1, 1), ior=1.5)
    spheres = make_sphere_pool([(0, 1, 0)], [1.0], [glass])
    planes = make_plane_pool([(0, 0, 0)], [(0, 1, 0)], [floor])
    lights = [dict(kind=LIGHT_DIRECTIONAL_AREA, position=(0, 8, 0),
                   normal=(0, -1, 0), color=(1, 1, 1), wattage=10.0,
                   radius=3.0)]
    return make_scene(spheres=spheres, planes=planes,
                      materials=mb.build(), lights=lights)


def test_grid_gather_oracle():
    """Fixed-radius gather equals a brute-force numpy sum."""
    rng = np.random.RandomState(0)
    pos = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    pw = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    dirs = np.tile(np.array([0, -1, 0], np.float32), (500, 1))
    r = 0.5
    grid = build_grid(pos, pw, dirs, r, max_per_cell=64)

    q = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    n = np.tile(np.array([0, 1, 0], np.float32), (16, 1))
    got = np.asarray(jax.jit(lambda q, n: grid_irradiance(grid, q, n))(
        jnp.asarray(q), jnp.asarray(n)))

    for i in range(16):
        d2 = ((pos - q[i]) ** 2).sum(-1)
        accept = (d2 < r * r)  # dirs oppose n everywhere
        want = pw[accept].sum(0) / (np.pi * r * r)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_global_photons_die_on_first_bounce_specular(caustic_scene):
    """Scene.cpp:612-628: global-map photons that hit a specular
    surface on the FIRST bounce terminate; straight-down photons here
    either hit the glass sphere (die for global) or the diffuse floor
    (first diffuse bounce is not stored, depth>1 only)."""
    scene, static = caustic_scene
    out = jax.jit(trace_photon_batch,
                  static_argnames=("static", "light_i", "n_emit", "caustic",
                                   "depth_limit", "path_tracing"))(
        scene, static=static, light_i=0, n_emit=512, caustic=False,
        depth_limit=5, path_tracing=False, key=jax.random.key(0))
    mask = np.asarray(out.mask)
    assert mask[0].sum() == 0          # depth 1 never stores
    assert mask.sum() > 0              # later diffuse bounces store


def test_caustic_photons_need_specular_first_bounce(caustic_scene):
    scene, static = caustic_scene
    out = jax.jit(trace_photon_batch,
                  static_argnames=("static", "light_i", "n_emit", "caustic",
                                   "depth_limit", "path_tracing"))(
        scene, static=static, light_i=0, n_emit=512, caustic=True,
        depth_limit=5, path_tracing=False, key=jax.random.key(0))
    mask = np.asarray(out.mask)
    pos = np.asarray(out.pos)
    stored = pos.reshape(-1, 3)[mask.reshape(-1)]
    assert stored.shape[0] > 0
    # every stored caustic photon refracted through the sphere first ->
    # lands on the floor inside the sphere's footprint-ish region
    assert np.abs(stored[:, [0, 2]]).max() < 3.0
    assert np.abs(stored[:, 1]).max() < 1e-3   # on the floor plane


def test_point_lights_do_not_emit():
    mb = MaterialBuilder()
    floor = mb.phong(kd=(0.9, 0.9, 0.9))
    planes = make_plane_pool([(0, 0, 0)], [(0, 1, 0)], [floor])
    lights = [dict(kind=LIGHT_POINT, position=(0, 5, 0),
                   color=(1, 1, 1), wattage=100.0)]
    scene, static = make_scene(planes=planes, materials=mb.build(),
                               lights=lights)
    cfg = RenderConfig(photons_per_light=100, caustic_photons_per_light=100)
    maps = build_photon_maps(scene, static, cfg, jax.random.key(0),
                             path_tracing=False)
    assert maps is None   # dynamic_cast gate (Scene.cpp:368)


def test_caustic_focus(caustic_scene):
    """The glass sphere focuses the beam: irradiance under the sphere
    must dominate everywhere else (the physics smoke test)."""
    scene, static = caustic_scene
    cfg = RenderConfig(photons_per_light=0, caustic_photons_per_light=2000)
    maps = build_photon_maps(scene, static, cfg, jax.random.key(1),
                             path_tracing=False)
    assert maps.global_map is None and maps.caustic_map is not None
    p = jnp.array([[0.0, 0.0, 0.0], [2.5, 0.0, 2.5]])
    n = jnp.array([[0.0, 1.0, 0.0]] * 2)
    irr = np.asarray(jax.jit(
        lambda p, n: grid_irradiance(maps.caustic_map, p, n))(p, n))
    assert irr[0, 0] > 10 * (irr[1, 0] + 1e-6)
