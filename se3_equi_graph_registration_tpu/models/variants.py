"""Model-zoo variants beyond the flagship RegistrationModel.

Covers the remaining SURVEY.md §2.1 inventory rows:

- `SO3TensorProductLayer`: MLP over the x xᵀ tensor product of flattened 3x3
  edge frames (/root/reference/src/3dmatch_train_egnn_with_batch.py:98-124;
  wired into the edge model only in src/clean_so3_model.py:85-97).
- `CleanEGCL` / `CleanEGNN`: the standalone "clean" variant
  (src/clean_so3_model.py): plain edge MLP → SO3TensorProductLayer; node MLP
  takes [h ‖ agg ‖ rel_pos-mean]; mean coordinate aggregation.
- `GCL` / `GCLrf` / `ClofGCL`: the vgsatorras-EGNN / ClofNet reference zoo
  (tests/CofModel.py) — plain graph conv, radial-field layer, and the
  local-frame (scalarization) layer with 3-basis coordinate updates.
- `GraphConvolution` + `build_gaussian_adjacency` + `GlobalPooling`: the
  legacy dense-adjacency GCN path (src/gcnLayer.py:58-112).

All on the dense [B, N, K] neighbor layout (or dense [N, N] adjacency for the
legacy GCN), vmap/jit-safe.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.edge_geometry import edge_geometry, gather_neighbors
from ..ops.numerics import safe_norm, safe_normalize
from ..ops.segment import kregular_mean, kregular_sum

Array = jax.Array


class SO3TensorProductLayer(nn.Module):
    """MLP over M Mᵀ of per-edge 3x3 frames (reference :98-124).

    Input [..., 9] (flattened frame) → tensor product [..., 9] → MLP → out.
    """
    input_dim: int = 3
    output_dim: int = 32

    @nn.compact
    def __call__(self, flat_frames: Array) -> Array:
        d = self.input_dim
        M = flat_frames.reshape(flat_frames.shape[:-1] + (d, d))
        tp = jnp.einsum("...ij,...kj->...ik", M, M)          # M Mᵀ
        tp = tp.reshape(flat_frames.shape[:-1] + (d * d,))
        y = nn.Dense(2 * self.output_dim, name="dense_0")(tp)
        y = nn.relu(y)
        return nn.Dense(self.output_dim, name="dense_1")(y)


class CleanEGCL(nn.Module):
    """'Clean' EGCL (src/clean_so3_model.py): edge MLP feeds an SO(3) tensor-
    product layer; the node MLP additionally sees the mean relative position;
    coordinates aggregate with mean."""
    hidden_nf: int = 32
    act: Callable = nn.silu

    @nn.compact
    def __call__(self, h: Array, x: Array, nbr_idx: Array,
                 edge_mask: Optional[Array] = None) -> tuple[Array, Array]:
        geom = edge_geometry(x, nbr_idx, direction="center", so3_mode="frame")
        h_nbr = gather_neighbors(h, nbr_idx)
        h_row = jnp.broadcast_to(h[..., :, None, :], h_nbr.shape)

        edge_in = jnp.concatenate([h_row, h_nbr, geom.radial, geom.dist], axis=-1)
        m = nn.Dense(self.hidden_nf, name="edge_mlp_0")(edge_in)
        m = self.act(m)
        m = m + SO3TensorProductLayer(3, self.hidden_nf, name="so3_tp")(geom.so3)

        scale = nn.Dense(self.hidden_nf, name="coord_mlp_0")(m)
        scale = self.act(scale)
        scale = nn.Dense(1, use_bias=False, name="coord_mlp_out")(scale)
        x = x + kregular_mean(geom.rel * scale, edge_mask)

        agg = kregular_sum(m, edge_mask)
        rel_mean = kregular_mean(geom.rel, edge_mask)
        out = jnp.concatenate([h, agg, rel_mean], axis=-1)
        out = nn.Dense(self.hidden_nf, name="node_mlp_0")(out)
        out = self.act(out)
        out = nn.Dense(self.hidden_nf, name="node_mlp_1")(out)
        return h + out, x


class CleanEGNN(nn.Module):
    in_node_nf: int = 32
    hidden_nf: int = 32
    out_node_nf: int = 32
    n_layers: int = 3

    @nn.compact
    def __call__(self, h: Array, x: Array, nbr_idx: Array,
                 edge_mask: Optional[Array] = None) -> tuple[Array, Array]:
        h = nn.Dense(self.hidden_nf, name="embedding_in")(h)
        for i in range(self.n_layers):
            h, x = CleanEGCL(self.hidden_nf, name=f"gcl_{i}")(h, x, nbr_idx,
                                                              edge_mask)
        return nn.Dense(self.out_node_nf, name="embedding_out")(h), x


class GCL(nn.Module):
    """Plain (non-equivariant) graph conv layer — reference zoo GCL
    (tests/CofModel.py, 'from EGNN (vgsatorras)')."""
    hidden_nf: int = 32
    act: Callable = nn.silu

    @nn.compact
    def __call__(self, h: Array, nbr_idx: Array,
                 edge_mask: Optional[Array] = None) -> Array:
        h_nbr = gather_neighbors(h, nbr_idx)
        h_row = jnp.broadcast_to(h[..., :, None, :], h_nbr.shape)
        m = nn.Dense(self.hidden_nf, name="edge_mlp_0")(
            jnp.concatenate([h_row, h_nbr], axis=-1))
        m = self.act(m)
        m = nn.Dense(self.hidden_nf, name="edge_mlp_1")(m)
        agg = kregular_sum(m, edge_mask)
        out = nn.Dense(self.hidden_nf, name="node_mlp_0")(
            jnp.concatenate([h, agg], axis=-1))
        out = self.act(out)
        return h + nn.Dense(h.shape[-1], name="node_mlp_1")(out)


class GCLrf(nn.Module):
    """Radial-field layer: coordinate-only update x += Σ rel·φ(‖rel‖²)."""
    hidden_nf: int = 32
    act: Callable = nn.silu

    @nn.compact
    def __call__(self, x: Array, nbr_idx: Array,
                 edge_mask: Optional[Array] = None) -> Array:
        geom = edge_geometry(x, nbr_idx, so3_mode="invariant")
        s = nn.Dense(self.hidden_nf, name="phi_0")(geom.radial)
        s = self.act(s)
        s = nn.Dense(1, use_bias=False, name="phi_1")(s)
        return x + kregular_sum(geom.rel * s, edge_mask)


def coord2localframe(x: Array, nbr_idx: Array,
                     degen_threshold: float = 1e-3) -> Array:
    """ClofNet scalarization frame per edge (CofModel.py:357-371):
    a = normalize(x_i − x_j), b = normalize(x_i × x_j), c = a × b → [...,K,3,3].

    Near-parallel position pairs make normalize(x_i × x_j) numerically
    ill-conditioned (the direction of a ~0 cross product flips under fp
    noise, breaking equivariance in float32 — a live instability in the
    reference formulation); such frames are zeroed so they contribute nothing.
    """
    x_nbr = gather_neighbors(x, nbr_idx)
    x_row = jnp.broadcast_to(x[..., :, None, :], x_nbr.shape)
    rel = x_row - x_nbr
    a = safe_normalize(rel)
    cross = jnp.cross(x_row, x_nbr)
    # relative degeneracy: ‖x_i × x_j‖ vs ‖x_i‖‖x_j‖ (sin of the angle)
    scale = safe_norm(x_row, keepdims=True) * safe_norm(x_nbr, keepdims=True)
    degen = (safe_norm(cross, keepdims=True) < degen_threshold * scale) | \
            (safe_norm(rel, keepdims=True) < 1e-6)
    b = jnp.where(degen, 0.0, safe_normalize(cross))
    a = jnp.where(degen, 0.0, a)
    c = jnp.cross(a, b)
    return jnp.stack([a, b, c], axis=-2)


class ClofGCL(nn.Module):
    """ClofNet local-frame layer (CofModel.py Clof_GCL): invariant edge
    features from frame projections; coordinate update as a learned
    combination of the 3 frame basis vectors (:373-380)."""
    hidden_nf: int = 32
    act: Callable = nn.silu

    @nn.compact
    def __call__(self, h: Array, x: Array, nbr_idx: Array,
                 edge_mask: Optional[Array] = None) -> tuple[Array, Array]:
        frame = coord2localframe(x, nbr_idx)                 # [B,N,K,3,3]
        x_nbr = gather_neighbors(x, nbr_idx)
        rel = x[..., :, None, :] - x_nbr
        # scalarization: project rel and positions onto the frame (invariants)
        proj = jnp.einsum("...kij,...kj->...ki", frame, rel)
        radial = jnp.sum(rel * rel, axis=-1, keepdims=True)

        h_nbr = gather_neighbors(h, nbr_idx)
        h_row = jnp.broadcast_to(h[..., :, None, :], h_nbr.shape)
        edge_in = jnp.concatenate([h_row, h_nbr, radial, proj], axis=-1)
        m = nn.Dense(self.hidden_nf, name="edge_mlp_0")(edge_in)
        m = self.act(m)
        m = nn.Dense(self.hidden_nf, name="edge_mlp_1")(m)

        # 3 learned coefficients per edge → coordinate update in frame basis
        coefs = nn.Dense(3, use_bias=False, name="coord_coefs")(m)
        delta = jnp.einsum("...kij,...ki->...kj", frame, coefs)
        x = x + kregular_sum(delta, edge_mask)

        agg = kregular_sum(m, edge_mask)
        out = nn.Dense(self.hidden_nf, name="node_mlp_0")(
            jnp.concatenate([h, agg], axis=-1))
        out = self.act(out)
        h = h + nn.Dense(h.shape[-1], name="node_mlp_1")(out)
        return h, x


def build_gaussian_adjacency(x: Array, sigma: float = 1.0,
                             threshold: float = 0.0) -> Array:
    """Dense symmetric-normalized Gaussian adjacency Â = D^-1/2 (A+I) D^-1/2
    (legacy GCN path, src/gcnLayer.py:58-67 / utils/preprocessGcn.py:43-79) —
    the cKDTree + scipy.sparse pipeline recast as one dense jnp expression."""
    d2 = jnp.sum((x[..., :, None, :] - x[..., None, :, :]) ** 2, axis=-1)
    A = jnp.exp(-d2 / (2.0 * sigma ** 2))
    if threshold > 0:
        A = jnp.where(A > threshold, A, 0.0)
    deg = jnp.sum(A, axis=-1)
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    return A * dinv[..., :, None] * dinv[..., None, :]


class GraphConvolution(nn.Module):
    """Dense-adjacency GCN layer: h' = act(Â h W) (src/gcnLayer.py:70-80)."""
    out_features: int
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, h: Array, adj: Array) -> Array:
        y = nn.Dense(self.out_features, name="weight")(h)
        return self.act(jnp.einsum("...nm,...mc->...nc", adj, y))


class GlobalPooling(nn.Module):
    """Max + average pooling over the point axis (src/gcnLayer.py)."""

    @nn.compact
    def __call__(self, h: Array) -> Array:
        return jnp.concatenate(
            [jnp.max(h, axis=-2), jnp.mean(h, axis=-2)], axis=-1)


class EGCLVel(nn.Module):
    """Velocity-extended EGCL (reference zoo E_GCL_vel / GCL_rf_vel,
    tests/CofModel.py): besides the coordinate stream, integrates a velocity
    channel — v' = φ_v(h)·v + Σ rel·φ_x(m); x' = x + v'."""
    hidden_nf: int = 32
    act: Callable = nn.silu

    @nn.compact
    def __call__(self, h: Array, x: Array, v: Array, nbr_idx: Array,
                 edge_mask: Optional[Array] = None
                 ) -> tuple[Array, Array, Array]:
        geom = edge_geometry(x, nbr_idx, so3_mode="invariant")
        h_nbr = gather_neighbors(h, nbr_idx)
        h_row = jnp.broadcast_to(h[..., :, None, :], h_nbr.shape)
        m = nn.Dense(self.hidden_nf, name="edge_mlp_0")(
            jnp.concatenate([h_row, h_nbr, geom.radial], axis=-1))
        m = self.act(m)
        m = nn.Dense(self.hidden_nf, name="edge_mlp_1")(m)

        scale = nn.Dense(self.hidden_nf, name="coord_mlp_0")(m)
        scale = self.act(scale)
        scale = nn.Dense(1, use_bias=False, name="coord_mlp_out")(scale)
        force = kregular_sum(geom.rel * scale, edge_mask)

        vel_gate = nn.Dense(self.hidden_nf, name="vel_mlp_0")(h)
        vel_gate = self.act(vel_gate)
        vel_gate = nn.Dense(1, name="vel_mlp_1")(vel_gate)
        v = vel_gate * v + force
        x = x + v

        agg = kregular_sum(m, edge_mask)
        out = nn.Dense(self.hidden_nf, name="node_mlp_0")(
            jnp.concatenate([h, agg], axis=-1))
        out = self.act(out)
        h = h + nn.Dense(h.shape[-1], name="node_mlp_1")(out)
        return h, x, v
