"""PointNet-style k-NN feature encoder (the reference's optional end-to-end
descriptor learner, enabled with use_pointnet — README.md:69, off by default).

Capability parity with `PointNetLayer`/`PointNet`
(/root/reference/src/3dmatch_train_egnn_with_batch.py:52-96): two max-
aggregation message-passing layers whose messages are MLP([h_j, x_j − x_i]),
here on the same dense [B, N, K] neighbor layout as the EGNN (max over the K
axis instead of torch_geometric scatter-max).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.edge_geometry import gather_neighbors

Array = jax.Array


class PointNetLayer(nn.Module):
    """One max-aggregation message-passing layer (reference :55-68)."""
    out_channels: int

    @nn.compact
    def __call__(self, h: Optional[Array], x: Array, nbr_idx: Array,
                 edge_mask: Optional[Array] = None) -> Array:
        x_nbr = gather_neighbors(x, nbr_idx)                  # [B,N,K,3]
        rel = x_nbr - x[..., :, None, :]
        if h is None:
            msg_in = rel                                      # first layer: pos only
        else:
            h_nbr = gather_neighbors(h, nbr_idx)
            msg_in = jnp.concatenate([h_nbr, rel], axis=-1)
        m = nn.Dense(self.out_channels, name="dense_0")(msg_in)
        m = nn.relu(m)
        m = nn.Dense(self.out_channels, name="dense_1")(m)
        if edge_mask is not None:
            m = jnp.where(edge_mask[..., None] > 0, m, -jnp.inf)
        return jnp.max(m, axis=-2)                            # max over neighbors


class PointNet(nn.Module):
    """Two-layer encoder producing learned per-point descriptors (:71-96)."""
    hidden_channels: int = 32
    out_channels: int = 32

    @nn.compact
    def __call__(self, x: Array, nbr_idx: Array,
                 edge_mask: Optional[Array] = None) -> Array:
        h = PointNetLayer(self.hidden_channels, name="conv1")(None, x, nbr_idx,
                                                              edge_mask)
        h = nn.relu(h)
        h = PointNetLayer(self.hidden_channels, name="conv2")(h, x, nbr_idx,
                                                              edge_mask)
        h = nn.relu(h)
        return nn.Dense(self.out_channels, name="classifier")(h)
