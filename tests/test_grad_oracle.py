"""Finite-difference gradient oracle (the BASELINE.json acceptance
metric: pixel gradients allclose vs finite differences).

Protocol per SURVEY.md §7: the oracle uses the SAME fixed random
sequence and the same discrete decisions (hit selection, RR branches)
— only continuous parameters move. Central differences in float32 at
eps tuned per parameter magnitude; visibility gradients are out of
scope (discrete), so perturbations are small enough not to flip any
discrete choice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cse168_raytracer_tpu.config import RenderConfig
from cse168_raytracer_tpu.render.integrator import render_hdr
from cse168_raytracer_tpu.scenes import build


def central_diff(f, x0, eps):
    """Scalar-output central difference over every element of x0."""
    x0 = np.asarray(x0, np.float64)
    g = np.zeros_like(x0)
    it = np.nditer(x0, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x0.copy(); xp[i] += eps
        xm = x0.copy(); xm[i] -= eps
        g[i] = (f(xp.astype(np.float32)) - f(xm.astype(np.float32))) / (2 * eps)
        it.iternext()
    return g


@pytest.fixture(scope="module")
def sphere_setup():
    cfg = RenderConfig(width=12, height=12, trace_depth=2)
    scene, static, cam, cfg = build("sphere", cfg)
    key = jax.random.key(0)
    render = jax.jit(render_hdr, static_argnames=("static", "cfg"))
    return scene, static, cam, cfg, key, render


def test_grad_wrt_kd_matches_fd(sphere_setup):
    scene, static, cam, cfg, key, render = sphere_setup

    def loss_np(kd):
        s = scene.replace(materials=scene.materials._replace(
            kd=jnp.asarray(kd)))
        hdr, _ = render(s, static, cam, cfg, key)
        return float(jnp.sum(hdr))

    def loss_jx(kd):
        s = scene.replace(materials=scene.materials._replace(kd=kd))
        hdr, _ = render(s, static, cam, cfg, key)
        return jnp.sum(hdr)

    kd0 = scene.materials.kd
    g = np.asarray(jax.jit(jax.grad(loss_jx))(kd0))
    g_fd = central_diff(loss_np, kd0, 1e-2)
    # kd enters quadratically (the reference kd^2 quirk) — fd at
    # kd=1 sees d(kd^2)=2kd; tolerance covers f32 render noise
    np.testing.assert_allclose(g, g_fd, rtol=5e-2, atol=1e-3)


def test_grad_wrt_light_wattage_matches_fd(sphere_setup):
    scene, static, cam, cfg, key, render = sphere_setup

    def loss_np(w):
        s = scene.replace(lights=scene.lights._replace(
            wattage=jnp.asarray(w)))
        hdr, _ = render(s, static, cam, cfg, key)
        return float(jnp.sum(hdr))

    def loss_jx(w):
        s = scene.replace(lights=scene.lights._replace(wattage=w))
        hdr, _ = render(s, static, cam, cfg, key)
        return jnp.sum(hdr)

    w0 = scene.lights.wattage
    g = np.asarray(jax.jit(jax.grad(loss_jx))(w0))
    g_fd = central_diff(loss_np, w0, 1.0)
    np.testing.assert_allclose(g, g_fd, rtol=2e-2, atol=1e-6)


def test_grad_wrt_light_position_matches_fd(sphere_setup):
    """Light position moves falloff + shading continuously (shadowing
    is discrete but the perturbation is too small to flip it)."""
    scene, static, cam, cfg, key, render = sphere_setup

    def loss_np(p):
        s = scene.replace(lights=scene.lights._replace(
            position=jnp.asarray(p)))
        hdr, _ = render(s, static, cam, cfg, key)
        return float(jnp.sum(hdr))

    def loss_jx(p):
        s = scene.replace(lights=scene.lights._replace(position=p))
        hdr, _ = render(s, static, cam, cfg, key)
        return jnp.sum(hdr)

    p0 = scene.lights.position
    g = np.asarray(jax.jit(jax.grad(loss_jx))(p0))
    g_fd = central_diff(loss_np, p0, 1e-2)
    np.testing.assert_allclose(g, g_fd, rtol=5e-2, atol=1e-4)


def test_grad_wrt_sphere_center_matches_fd_frozen_discrete(sphere_setup):
    """Geometry gradients under the SURVEY §7 oracle protocol: freeze
    all discrete decisions (hit winners, shadow visibility) at the base
    parameters, then differentiate only the continuous math. A naive FD
    on the full render does not converge for geometry parameters — each
    eps flips different silhouette/shadow pixels — which is exactly why
    the protocol fixes the discrete structure."""
    from cse168_raytracer_tpu.models.lights import nee_sample
    from cse168_raytracer_tpu.ops.intersect import closest_hit
    from cse168_raytracer_tpu.ops.surface import make_surface
    from cse168_raytracer_tpu.core.vecmath import safe_normalize
    from cse168_raytracer_tpu.render.camera import eye_rays

    scene, static, cam, cfg, key, _render = sphere_setup
    w = h = 12
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    o, d = eye_rays(cam, xs.ravel(), ys.ravel(), w, h)

    # frozen discrete structure at the base parameters
    hit0 = closest_hit(scene.tris, scene.spheres, scene.planes, o, d)
    surf0 = make_surface(scene.tris, scene.spheres, scene.planes, o, d, hit0)
    s0 = nee_sample(scene.lights, 0, surf0.p, safe_normalize(surf0.n), key)
    sh0 = closest_hit(scene.tris, scene.spheres, scene.planes,
                      surf0.p + s0.l * 1e-4, s0.l, 0.0, s0.dist)
    visible0 = ~sh0.hit & hit0.hit

    def radiance(center):
        s = scene.replace(spheres=scene.spheres._replace(center=center))
        surf = make_surface(s.tris, s.spheres, s.planes, o, d, hit0)
        n = safe_normalize(surf.n)
        smp = nee_sample(s.lights, 0, surf.p, n, key)
        watt = s.lights.wattage[0]
        kd = s.materials.kd[surf.material_id]
        contrib = (jnp.maximum(0.0, smp.n_dot_l * smp.falloff * watt)[:, None]
                   * kd * kd)
        return jnp.sum(jnp.where(visible0[:, None], contrib, 0.0))

    c0 = scene.spheres.center
    g = np.asarray(jax.jit(jax.grad(radiance))(c0))
    f = jax.jit(radiance)
    g_fd = central_diff(lambda c: float(f(jnp.asarray(c))), c0, 1e-3)
    np.testing.assert_allclose(g, g_fd, rtol=2e-2, atol=1e-4)


def test_grad_env_bg_color(sphere_setup):
    """Miss rays hit the background: d(sum)/d(bg) = #miss-pixels."""
    scene, static, cam, cfg, key, render = sphere_setup

    def loss_jx(bg):
        s = scene.replace(env=scene.env._replace(bg_color=bg))
        hdr, _ = render(s, static, cam, cfg, key)
        return jnp.sum(hdr)

    g = np.asarray(jax.jit(jax.grad(loss_jx))(scene.env.bg_color))
    assert (g > 0).all()
    assert g[0] == g[1] == g[2]   # each channel counts the same misses
