"""Segment reductions — the TPU replacement for torch_scatter / scatter_add_.

The reference aggregates edge messages with `unsorted_segment_sum` built on
`Tensor.scatter_add_` (/root/reference/src/3dmatch_train_egnn_with_batch.py:343-358).
On TPU we provide:

- `segment_sum` / `segment_mean`: thin wrappers over `jax.ops.segment_sum` with
  static `num_segments` (XLA lowers to an efficient sorted-scatter on TPU).
- `kregular_sum`: the fast path for k-regular graphs in 'center' direction —
  messages laid out [N, K, C] reduce with a plain sum over K. No scatter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def segment_sum(data: Array, segment_ids: Array, num_segments: int) -> Array:
    """Sum rows of `data` [E, C] into `num_segments` buckets by `segment_ids` [E]."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data: Array, segment_ids: Array, num_segments: int) -> Array:
    """Mean-reduce rows by segment, empty segments → 0 (clamp-by-1 like the
    reference's unsorted_segment_mean count clamp)."""
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    count = jax.ops.segment_sum(
        jnp.ones(data.shape[:1], dtype=data.dtype), segment_ids, num_segments=num_segments
    )
    return total / jnp.maximum(count, 1.0)[:, None]


def kregular_sum(messages: Array, mask: Array | None = None) -> Array:
    """Sum messages [..., N, K, C] over the K axis → [..., N, C].

    The zero-cost aggregation for dense k-NN graphs aggregating onto centers.
    `mask` [..., N, K] zeroes padded edges before the reduce.
    """
    if mask is not None:
        messages = messages * mask[..., None].astype(messages.dtype)
    return jnp.sum(messages, axis=-2)


def kregular_mean(messages: Array, mask: Array | None = None) -> Array:
    """Mean over the K axis honoring the mask; empty neighborhoods → 0."""
    if mask is None:
        return jnp.mean(messages, axis=-2)
    m = mask[..., None].astype(messages.dtype)
    total = jnp.sum(messages * m, axis=-2)
    count = jnp.sum(m, axis=-2)
    return total / jnp.maximum(count, 1.0)
