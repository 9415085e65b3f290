"""Gradient-safe numeric primitives.

Self-loop edges (torch_cluster loop=True parity) make ‖Δx‖ = 0 a *guaranteed*
input, and `d/dx sqrt(x)` at 0 is +inf while `d/dx ‖x‖` at 0 is NaN. PyTorch
defines the norm subgradient at 0 as 0; these helpers give JAX the same
behavior without data-dependent control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def safe_sqrt(x: Array, eps: float = 1e-20) -> Array:
    """sqrt with zero (finite) gradient at x == 0; value error ≤ sqrt(eps)."""
    return jnp.sqrt(jnp.maximum(x, 0.0) + eps)


def zero_at_zero_sqrt(x: Array) -> Array:
    """sqrt whose value is exactly 0 at x == 0 AND whose gradient is 0 there
    (double-where trick)."""
    positive = x > 0
    safe_x = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe_x), 0.0)


def safe_norm(x: Array, axis: int = -1, keepdims: bool = False,
              eps: float = 1e-20) -> Array:
    """L2 norm with finite gradient at x == 0 (evaluates to ~sqrt(eps) there)."""
    return safe_sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims), eps)


def safe_normalize(x: Array, axis: int = -1, eps: float = 1e-8) -> Array:
    """x / (‖x‖ + eps) with finite gradients everywhere (reference adds the
    same eps to the denominator, /root/reference/src/3dmatch_train_egnn_with_batch.py:140)."""
    return x / (safe_norm(x, axis=axis, keepdims=True) + eps)
