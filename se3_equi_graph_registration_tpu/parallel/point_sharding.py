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


def sharded_knn_batched(x: Array, k: int, mesh: Mesh,
                        data_axis: str | None = "data",
                        point_axis: str = "point") -> Array:
    """Batched exact k-NN with batch sharded on `data_axis` and points on
    `point_axis`. x: [B, N, 3]. Returns nbr_idx [B, N, K] (global indices),
    sharded the same way. Each device all-gathers its batch rows' full clouds
    once (B/d_data × N × 3 floats) and computes distances for its own slab."""
    def local_knn(x_loc):
        x_full = jax.lax.all_gather(x_loc, point_axis, axis=1, tiled=True)
        d2 = pairwise_sq_dists(x_loc, x_full)            # [B_loc, n_loc, N]
        _, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32)

    spec = P(data_axis, point_axis)
    return shard_map(local_knn, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)


def sharded_egnn_forward_batched(model: EGNN, params, h: Array, x: Array,
                                 nbr_idx: Array, mesh: Mesh,
                                 data_axis: str | None = "data",
                                 point_axis: str = "point") -> tuple[Array, Array]:
    """Batched point-sharded EGNN: h [B, N, C], x [B, N, 3], nbr_idx [B, N, K]
    (global indices), each sharded P(data_axis, point_axis). The slab-mode
    module (constructed with `axis_name=point_axis`) all-gathers the node
    tables once per layer; the per-batch vmap rides inside shard_map so the
    collective batches over B_loc.

    Fully differentiable: `jax.grad` through this inserts the point-axis
    gradient collectives automatically (all_gather transposes to
    reduce-scatter; replicated params psum their cotangents over both axes).
    """
    assert model.axis_name == point_axis, \
        "construct the EGNN with axis_name=point_axis"

    def local_apply(params, h_loc, x_loc, nbr_loc):
        apply_one = lambda hh, xx, nn: model.apply(params, hh, xx, nn)
        return jax.vmap(apply_one)(h_loc, x_loc, nbr_loc)

    spec = P(data_axis, point_axis)
    return shard_map(
        local_apply, mesh=mesh,
        in_specs=(P(), spec, spec, spec),
        out_specs=(spec, spec),
    )(params, h, x, nbr_idx)


def halo_sharded_knn_batched(x_sorted: Array, k: int, mesh: Mesh, halo: int,
                             data_axis: str | None = "data",
                             point_axis: str = "point") -> Array:
    """Batched halo k-NN: x_sorted [B, N, 3] (each cloud curve-sorted),
    sharded P(data_axis, point_axis). Same contract as halo_sharded_knn per
    cloud; two ppermutes of the [B_loc, halo, 3] boundary blocks replace the
    per-cloud all-gather."""
    from ..models.egnn import halo_extend

    n = x_sorted.shape[1]
    D = mesh.shape[point_axis]
    L = n // D
    assert n % D == 0 and halo <= L, (n, D, halo)

    def local_knn(x_loc):                                # [B_loc, L, 3]
        ext = halo_extend(x_loc, point_axis, halo)       # [B_loc, L+2W, 3]
        d2 = jax.vmap(pairwise_sq_dists)(x_loc, ext)     # [B_loc, L, L+2W]
        d = jax.lax.axis_index(point_axis)
        gids = jnp.arange(L + 2 * halo, dtype=jnp.int32) + (d * L - halo)
        d2 = jnp.where((gids >= 0) & (gids < n), d2, jnp.inf)
        _, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32) + (d * L - halo)

    spec = P(data_axis, point_axis)
    return shard_map(local_knn, mesh=mesh, in_specs=(spec,),
                     out_specs=spec)(x_sorted)


def halo_sharded_egnn_forward_batched(model: EGNN, params, h: Array,
                                      x: Array, nbr_idx: Array, mesh: Mesh,
                                      data_axis: str | None = "data",
                                      point_axis: str = "point"):
    """Batched halo EGNN: inputs [B, N, ·] curve-sorted and sharded
    P(data_axis, point_axis); `model` built with axis_name=point_axis and
    halo=W. The per-element vmap rides inside shard_map, so the boundary
    ppermutes batch over B_loc."""
    assert model.axis_name == point_axis and model.halo is not None

    def local_apply(params, h_loc, x_loc, nbr_loc):
        one = lambda hh, xx, nn: model.apply(params, hh, xx, nn)
        return jax.vmap(one)(h_loc, x_loc, nbr_loc)

    spec = P(data_axis, point_axis)
    return shard_map(local_apply, mesh=mesh,
                     in_specs=(P(), spec, spec, spec),
                     out_specs=(spec, spec))(params, h, x, nbr_idx)


def make_point_sharded_train_step(model, optimizer, cfg, mesh: Mesh,
                                  data_axis: str | None = "data",
                                  point_axis: str = "point",
                                  halo: int | None = None):
    """Training step with the pair-batch sharded over `data_axis` AND the
    point axis sharded over `point_axis` — the sequence-parallel analog the
    reference cannot express (SURVEY.md §2.5), now for the BACKWARD too.

    halo: switch the embedding stage to the halo-exchange regime — clouds
    are curve-sorted (ops/morton.sort_by_curve), the graph comes from
    halo_sharded_knn_batched, and each EGCL layer ppermutes only the ±halo
    boundary rows (O(halo) ICI traffic instead of the per-layer all-gather).
    The graph is then the slab-window approximation, like the single-chip
    fast path's Hilbert window.

    The EGNN embedding stage runs under shard_map in slab mode (activation
    memory per device scales as N/d_point); the scoring/Kabsch head and the
    losses run on the re-assembled [B, N, ·] arrays outside shard_map, where
    pjit's sharding propagation parallelizes them. Gradients of the replicated
    parameters are psum'd over BOTH mesh axes by the shard_map/pjit
    transposes — no hand-written collectives.

    `model` must be a RegistrationModel with direction='center' (slab-mode
    aggregation, models/egnn.py) and egnn_impl='xla'. Returns a jitted
    (state, batch) -> (state, metrics) with the same contract as
    engine.make_train_step.
    """
    import optax

    from ..train import losses as losses_lib
    from ..train.engine import TrainState

    assert model.direction == "center", "point sharding requires 'center'"
    assert not model.use_pointnet, "pointnet encoder not supported point-sharded"
    egnn_slab = EGNN(
        in_node_nf=model.in_node_nf, hidden_nf=model.hidden_nf,
        out_node_nf=model.hidden_nf, edge_attr_dim=model.edge_attr_dim,
        n_layers=model.n_layers, num_heads=model.num_heads,
        direction="center", so3_mode=model.so3_mode, axis_name=point_axis,
        halo=halo)

    def embed(params, h, x):
        if halo is None:
            nbr = sharded_knn_batched(x, cfg.k, mesh, data_axis, point_axis)
            return sharded_egnn_forward_batched(
                egnn_slab, params, h, x, nbr, mesh, data_axis, point_axis)
        from ..ops import morton
        hs, xs, perm = morton.sort_by_curve(h, x, cfg.curve)
        nbr = halo_sharded_knn_batched(xs, cfg.k, mesh, halo,
                                       data_axis, point_axis)
        h2, x2 = halo_sharded_egnn_forward_batched(
            egnn_slab, params, hs, xs, nbr, mesh, data_axis, point_axis)
        return morton.unsort_rows((h2, x2), perm)

    def loss_fn(params, batch):
        egnn_params = {"params": params["params"]["egnn"]}
        h_s, x_s = embed(egnn_params, batch["src_feat"], batch["src_pts"])
        h_t, x_t = embed(egnn_params, batch["tgt_feat"], batch["tgt_pts"])
        out = model.apply(
            params, batch["src_feat"], batch["tgt_feat"],
            batch["src_pts"], batch["tgt_pts"],
            h_s, x_s, h_t, x_t, batch["labels"],
            method="head_from_embeddings")
        lb = losses_lib.total_loss(out, batch["gt_pose"], batch["labels"],
                                   cfg.loss_weights)
        return lb.total, lb

    def step(state, batch):
        (_, lb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, {k: v for k, v in lb._asdict().items()}

    return jax.jit(step, donate_argnums=(0,))


def shard_points_batch(batch, mesh: Mesh, data_axis: str | None = "data",
                       point_axis: str = "point"):
    """Assemble a pair-batch dict with [B, N, ...] leaves sharded
    P(data_axis, point_axis) and per-pair leaves (labels [B,N] included on
    both axes; gt_pose [B,4,4] on data only).

    Multi-process: each process passes its LOCAL slice of the global batch
    (the data axis spans processes over DCN, like host_local_to_global;
    the point axis stays within each process's ICI devices) and the global
    array is assembled via make_array_from_process_local_data — the 2-axis
    composition of multi-host input feeding with context-parallel points."""
    import numpy as np
    from jax.sharding import NamedSharding

    multi = jax.process_count() > 1

    def put(name, a):
        spec = (P(data_axis, point_axis)
                if getattr(a, "ndim", 0) >= 2 and name != "gt_pose"
                else P(data_axis))
        sharding = NamedSharding(mesh, spec)
        if multi:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(a))
        return jax.device_put(a, sharding)

    return {k: put(k, v) for k, v in batch.items()}


def halo_sharded_knn(x_sorted: Array, k: int, mesh: Mesh, halo: int,
                     axis: str = "point") -> Array:
    """k-NN over a CURVE-SORTED cloud with O(halo) communication.

    x_sorted: [N, 3] sorted by ops/morton.morton_perm, sharded on `axis` in
    contiguous slabs. Each device ppermutes its ±halo boundary rows with its
    neighbors and finds each local point's k nearest among slab ∪ halos —
    an approximate-kNN graph exact within ±halo curve rows (the distributed
    analog of morton.knn_graph_window; same locality argument). Returns
    GLOBAL indices [N, K] sharded on `axis` — by construction every neighbor
    lies within ±halo of its slab, the contract `EGNN(halo=...)` gathers
    under. End slabs receive wraparound rows from the far end of the curve —
    those are MASKED out of the selection (they can and do win k-NN contests
    otherwise, producing out-of-range ids), so the curve's end slabs see a
    ONE-SIDED, narrower candidate set (L + halo rows). Note this differs
    from the single-chip window path: morton.window_starts shifts a
    full-width window inward at the ends, so halo end slabs have slightly
    fewer candidates (and marginally lower edge recall) than it.
    """
    return halo_sharded_knn_batched(x_sorted[None], k, mesh, halo,
                                    data_axis=None, point_axis=axis)[0]


def halo_sharded_egnn_forward(model: EGNN, params, h: Array, x: Array,
                              nbr_idx: Array, mesh: Mesh,
                              axis: str = "point") -> tuple[Array, Array]:
    """Point-sharded EGNN with halo exchange: two ppermutes of [halo, C] per
    layer instead of an O(N) all-gather — the context-parallel design for
    curve-sorted clouds (SURVEY §2.5 'halo exchange of neighbor features').

    `model` must be built with `axis_name=axis, halo=W, direction='center'`;
    inputs are curve-sorted, sharded on `axis`, with `nbr_idx` from
    `halo_sharded_knn(..., halo=W)` (global indices). ~N/(2·halo)× less ICI
    traffic than `sharded_egnn_forward` at equal math.
    """
    assert model.axis_name == axis and model.halo is not None, \
        "construct the EGNN with axis_name=axis and halo=W"

    def local_apply(h_loc, x_loc, nbr_loc):
        return model.apply(params, h_loc, x_loc, nbr_loc)

    return shard_map(
        local_apply, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )(h, x, nbr_idx)


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
