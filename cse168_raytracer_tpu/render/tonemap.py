"""Tonemapping + NaN scrub (Scene.cpp:87-91, 180-202)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_tonemap(hdr: jax.Array) -> jax.Array:
    """The reference's final pass: NaN pixels replaced with the image
    max intensity, then sigmoid(6v - 3) per channel (Scene.cpp:87-91,
    187-195). hdr: (..., 3) linear radiance."""
    finite = jnp.isfinite(hdr)
    max_intensity = jnp.max(jnp.where(finite, hdr, -jnp.inf))
    scrubbed = jnp.where(finite, hdr, max_intensity)
    return 1.0 / (1.0 + jnp.exp(-(6.0 * scrubbed - 3.0)))


def normalized_tonemap(hdr: jax.Array) -> jax.Array:
    """The reference's commented-out alternative curve
    min((v/max)^0.35 * 1.1, 1) (Scene.cpp:90) — this is what the A2-era
    golden PNGs were produced with; useful for visual comparison against
    output/A2/*.png. NaNs scrub to max intensity first."""
    finite = jnp.isfinite(hdr)
    max_intensity = jnp.maximum(jnp.max(jnp.where(finite, hdr, -jnp.inf)),
                                1e-12)
    scrubbed = jnp.where(finite, hdr, max_intensity)
    return jnp.minimum(jnp.power(jnp.maximum(scrubbed, 0.0)
                                 / max_intensity, 0.35) * 1.1, 1.0)


def tonemap(hdr: jax.Array, kind: str = "sigmoid") -> jax.Array:
    if kind == "sigmoid":
        return sigmoid_tonemap(hdr)
    if kind == "normalized":
        return normalized_tonemap(hdr)
    if kind == "none":
        return jnp.clip(hdr, 0.0, 1.0)
    raise ValueError(f"unknown tonemap {kind!r}")


def to_bytes(mapped: jax.Array) -> jax.Array:
    """Image::setPixel float->byte clamp (Image.cpp:47-63)."""
    return jnp.clip(mapped * 255.0, 0.0, 255.0).astype(jnp.uint8)
