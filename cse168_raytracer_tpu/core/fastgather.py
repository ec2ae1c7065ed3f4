"""Row lookup that sidesteps XLA's TPU gather.

XLA lowers `table[ids]` to a serial gather costing ~10 ns per OUTPUT
row on v5e (measured: 262k-row gathers take ~2.6 ms regardless of table
size or row width). For the small tables a wavefront indexes every
bounce — materials, texture params, sphere/plane pools — that tax
dwarfs the math. A one-hot matmul `(N, M) @ (M, F)` computes the same
lookup on the MXU/VPU in ~0.1 ms, and its adjoint is another matmul
(the gather adjoint is an equally slow scatter-add).

`take_rows` picks the strategy by table height; the one-hot path is
exact for float tables and for ints below 2^24 (stored exactly in
f32). Used by ops/surface.py, ops/shading.py, render/integrator.py,
models/textures.py, ops/photon.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# one-hot beats the serial gather easily up to a few hundred rows;
# beyond that the (N, M) one-hot product starts to cost real FLOPs/BW
ONEHOT_MAX_ROWS = 256


def select_component(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr[i, idx[i]] for arr (N, C) with C small (2-4) and idx (N,) in
    [0, C): a chain of jnp.where on the VPU. take_along_axis lowers to
    the same ~10 ns/row serial gather as table[ids] — measured 2.6 ms
    per 262k-row call on v5e, vs ~0.05 ms for the where chain."""
    out = arr[:, 0]
    for c in range(1, arr.shape[1]):
        out = jnp.where(idx == c, arr[:, c], out)
    return out


def take_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table[ids] for 1-D or 2-D `table` and integer `ids` of any
    shape. One-hot matmul for small tables, plain gather otherwise."""
    m = table.shape[0]
    if m > ONEHOT_MAX_ROWS:
        return table[ids]
    squeeze = table.ndim == 1
    t2 = table[:, None] if squeeze else table
    dt = t2.dtype
    tf = t2.astype(jnp.float32)
    oh = (ids[..., None] == jnp.arange(m, dtype=ids.dtype)).astype(
        jnp.float32)
    out = jax.lax.dot_general(
        oh, tf, (((oh.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    if jnp.issubdtype(dt, jnp.integer):
        out = jnp.round(out).astype(dt)
    elif dt == jnp.bool_:
        out = out > 0.5
    elif out.dtype != dt:
        out = out.astype(dt)
    return out[..., 0] if squeeze else out
