"""Point-axis (sequence-parallel analog) sharding for dense 8-16K-point clouds.

The reference clamps clouds to 2048 points by sampling because its memory and
Python-loop costs blow up beyond that (SURVEY.md §5.7). Here the point axis
shards across devices via `shard_map` (BASELINE.json config 5, "Dense scaling:
8K-16K pts/frame"):

- `sharded_knn`: coordinates are replicated (16K × 3 × 4B = 192 KB), each
  device computes exact k-NN for its own query slab against the full cloud —
  the same row tiling as ops/knn.knn_tiled, laid across the mesh;
- `sharded_egnn_forward`: node features shard over points. The EGNN module's
  slab mode (models/egnn.py, `axis_name=`) all-gathers the feature/coord
  tables once per layer (N × 32 × 4B = 2 MB at 16K — one cheap ICI all-gather)
  so neighbor gathers stay local; aggregation is the canonical 'center'
  direction, so no cross-device scatter ever occurs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.egnn import EGNN
from ..ops.knn import pairwise_sq_dists

Array = jax.Array


def sharded_knn(x: Array, k: int, mesh: Mesh, axis: str = "point") -> Array:
    """k-NN over a replicated cloud with queries sharded on `axis`.

    x: [N, 3] (replicated). Returns nbr_idx [N, K] (global indices), sharded
    on the N axis. Each device computes distances for its N/d query rows
    against the full cloud — one MXU matmul tile per device.
    """
    n = x.shape[0]
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, f"N={n} must divide over {n_shards} shards"

    def local_knn(x_full, x_local):
        d2 = pairwise_sq_dists(x_local, x_full)          # [N/d, N]
        _, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32)

    return shard_map(
        local_knn, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
    )(x, x)


def sharded_egnn_forward(model: EGNN, params, h: Array, x: Array,
                         nbr_idx: Array, mesh: Mesh,
                         axis: str = "point") -> tuple[Array, Array]:
    """Run an EGNN with the point axis sharded across `mesh[axis]`.

    `model` must be constructed with `axis_name=axis` and direction='center'.
    h [N, C], x [N, 3], nbr_idx [N, K] (global indices) — all sharded on the
    point axis at entry; outputs shard the same way.
    """
    assert model.axis_name == axis, "construct the EGNN with axis_name=axis"

    def local_apply(h_loc, x_loc, nbr_loc):
        return model.apply(params, h_loc, x_loc, nbr_loc)

    return shard_map(
        local_apply, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )(h, x, nbr_idx)
