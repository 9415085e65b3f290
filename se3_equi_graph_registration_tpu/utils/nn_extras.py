"""Small NN utilities — capability parity with the vendored library's
utils/utils.py (to_order, fourier_encode, masked_mean, batched_index_select,
memo cache) and utils/rotary.py (SinusoidalEmbeddings, apply_rotary_pos_emb),
as pure jnp functions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def to_order(degree: int) -> int:
    """Dimension of the degree-d irrep: 2d+1."""
    return 2 * degree + 1


def fourier_encode(x: Array, num_encodings: int = 4,
                   include_self: bool = True) -> Array:
    """x[..., d] → [..., d·(2·num_encodings (+1))] with sin/cos at dyadic
    frequencies (vendored utils.py fourier_encode semantics)."""
    x = x[..., None]
    scales = 2.0 ** jnp.arange(num_encodings, dtype=x.dtype)
    xs = x / scales
    enc = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], axis=-1)
    if include_self:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc.reshape(enc.shape[:-2] + (-1,))


def masked_mean(tensor: Array, mask: Array, axis: int = -1) -> Array:
    """Mean over `axis` counting only mask==True entries (empty → 0)."""
    mask = mask.astype(tensor.dtype)
    total = jnp.sum(tensor * mask, axis=axis)
    count = jnp.sum(mask, axis=axis)
    return total / jnp.maximum(count, 1.0)


def batched_index_select(values: Array, indices: Array, axis: int = 1) -> Array:
    """Gather along `axis` with per-batch index arrays (torch gather parity)."""
    idx = indices
    while idx.ndim < values.ndim:
        idx = idx[..., None]
    idx = jnp.broadcast_to(idx, idx.shape[:axis + 1] + values.shape[axis + 1:])
    return jnp.take_along_axis(values, idx, axis=axis)


def cache(fn):
    """Memoization decorator (the vendored lib's `cache`; hashable args)."""
    return functools.lru_cache(maxsize=None)(fn)


# --- rotary embeddings (utils/rotary.py parity) ---

def sinusoidal_embeddings(positions: Array, dim: int,
                          base: float = 10000.0) -> Array:
    """positions [...,] → [..., dim] interleaved sin/cos frequencies."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


def rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(x: Array, sincos: Array) -> Array:
    """Rotate feature pairs by position-dependent angles."""
    sin, cos = jnp.split(sincos, 2, axis=-1)
    sin = jnp.concatenate([sin, sin], axis=-1)
    cos = jnp.concatenate([cos, cos], axis=-1)
    return x * cos + rotate_half(x) * sin
