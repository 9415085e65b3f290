"""Fused EGCL layer as a Pallas TPU kernel.

The reference recomputes per-edge geometry and runs four separate gather+concat
+MLP passes per E_GCL (/root/reference/src/3dmatch_train_egnn_with_batch.py:
231-289); the XLA version of this layer (models/egnn.py) already fuses the
math but still materializes [B, N, K, 77] edge tensors in HBM and pays for
serial gathers. This kernel keeps one *entire layer* on-chip:

- layout is transposed — features in sublanes, points in lanes: h [C, N],
  x [3, N] — so every op is a [rows, E]-shaped VPU/MXU op over edge lanes;
- neighbor gathers become ONE-HOT MATMULS on the MXU: O[N, E] one-hot of
  neighbor ids (built from iota compares, never stored in HBM), h_col = h @ O;
- the center map R[T, E] (edge → its center) is also an iota-built one-hot,
  used both to broadcast center rows and — transposed — to aggregate messages
  back to centers: agg = m @ Rᵀ. k-regular aggregation without any scatter;
- edge features, the fused multi-head edge MLP, LayerNorm, coordinate scale,
  and both aggregations happen per chunk of E edge-lanes in VMEM; only
  h' [C, N] and x' [3, N] are written back.

Grid: (B, N/T, TK/E) — the innermost chunk axis accumulates into VMEM scratch
and finalizes the node update on its last step (standard K-loop pattern).

Fast path restrictions (asserted by the wrapper): 'center' direction,
'frame' so3 mode, all-ones edge_attr (its first-layer weight column folds into
the bias), no edge mask. Everything else falls back to the XLA path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_EPS = 1e-8
_DEGEN = 1e-6


class EGCLParams(NamedTuple):
    """Per-layer parameters, pre-arranged for the transposed kernel layout.
    All 'w*' are [out, in] so the kernel computes w @ activations."""
    w1_hrow: Array    # [C, C]   edge-MLP first layer, h_row block
    w1_hcol: Array    # [C, C]   h_col block
    w1_geo: Array     # [C, 12]  radial, dist, dot, so3(9) block
    b1: Array         # [C, 1]   bias + folded edge_attr(=1) column
    w2: Array         # [C, C]   block-diagonal dense of the per-head 2nd layers
    b2: Array         # [C, 1]
    ln_scale: Array   # [C, 1]
    ln_bias: Array    # [C, 1]
    wc0: Array        # [C, C]   coord MLP
    bc0: Array        # [C, 1]
    wc1: Array        # [1, C]   (no bias)
    wn0: Array        # [C, 2C]  node MLP
    bn0: Array        # [C, 1]
    wn1: Array        # [C, C]
    bn1: Array        # [C, 1]


def params_from_tree(tree: dict, dtype=jnp.float32) -> EGCLParams:
    """Build EGCLParams from one flax gcl_i subtree (models/egnn.py naming)."""
    em = tree["edge_mlp"]
    w1 = jnp.asarray(em["fused_in"]["kernel"], dtype)       # [77, C]
    b1 = jnp.asarray(em["fused_in"]["bias"], dtype)
    c = w1.shape[1]
    # reference concat order: [h_row(C), h_col(C), radial, dist, dot, so3(9), edge_attr(1)]
    w1_hrow = w1[:c].T
    w1_hcol = w1[c:2 * c].T
    w1_geo = w1[2 * c:2 * c + 12].T
    w1_ea = w1[2 * c + 12]                                   # [C] edge_attr row
    b1_folded = (b1 + w1_ea)[:, None]

    hk = jnp.asarray(em["head_kernels"], dtype)              # [H, w, w]
    hb = jnp.asarray(em["head_biases"], dtype)               # [H, w]
    n_heads, w_head, _ = hk.shape
    w2 = jax.scipy.linalg.block_diag(*[hk[h] for h in range(n_heads)]).T
    b2 = hb.reshape(-1)[:, None]

    return EGCLParams(
        w1_hrow=w1_hrow, w1_hcol=w1_hcol, w1_geo=w1_geo, b1=b1_folded,
        w2=w2.astype(dtype), b2=b2,
        ln_scale=jnp.asarray(tree["layer_norm"]["scale"], dtype)[:, None],
        ln_bias=jnp.asarray(tree["layer_norm"]["bias"], dtype)[:, None],
        wc0=jnp.asarray(tree["coord_mlp_0"]["kernel"], dtype).T,
        bc0=jnp.asarray(tree["coord_mlp_0"]["bias"], dtype)[:, None],
        wc1=jnp.asarray(tree["coord_mlp_out"]["kernel"], dtype).T,
        wn0=jnp.asarray(tree["node_mlp_0"]["kernel"], dtype).T,
        bn0=jnp.asarray(tree["node_mlp_0"]["bias"], dtype)[:, None],
        wn1=jnp.asarray(tree["node_mlp_1"]["kernel"], dtype).T,
        bn1=jnp.asarray(tree["node_mlp_1"]["bias"], dtype)[:, None],
    )


def _row(v: Array, i: int) -> Array:
    return v[i:i + 1, :]


def _cross_rows(u: Array, v: Array) -> Array:
    """Row-wise cross product of [3, E] arrays → [3, E]."""
    return jnp.concatenate([
        _row(u, 1) * _row(v, 2) - _row(u, 2) * _row(v, 1),
        _row(u, 2) * _row(v, 0) - _row(u, 0) * _row(v, 2),
        _row(u, 0) * _row(v, 1) - _row(u, 1) * _row(v, 0),
    ], axis=0)


def _safe_unit(v: Array) -> tuple[Array, Array]:
    n2 = jnp.sum(v * v, axis=0, keepdims=True)
    n = jnp.sqrt(n2 + 1e-20)
    return v / (n + _EPS), n


def _egcl_kernel(nbr_ref, ht_ref, xt_ref,
                 w1hr_ref, w1hc_ref, w1g_ref, b1_ref, w2_ref, b2_ref,
                 lns_ref, lnb_ref, wc0_ref, bc0_ref, wc1_ref,
                 wn0_ref, bn0_ref, wn1_ref, bn1_ref,
                 hout_ref, xout_ref, *rest,
                 T: int, E: int, K: int, N: int, C: int, accurate: bool,
                 table_chunk: int, emit_aggm: bool = False,
                 window: int | None = None, cast_bf16: bool = False):
    if emit_aggm:
        aggm_out_ref, aggm_ref, aggx_ref = rest
    else:
        aggm_out_ref = None
        aggm_ref, aggx_ref = rest
    i = pl.program_id(1)
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)

    ht = ht_ref[0]                      # [C, N]
    xt = xt_ref[0]                      # [3, N]
    h_tile = ht_ref[0, :, pl.ds(i * T, T)]   # ref-level dynamic slice
    x_tile = xt_ref[0, :, pl.ds(i * T, T)]

    # --- one-hot maps (built on the fly, never stored) ---
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (T, E), 1)
    local_center = (c * E + e_ids) // K                 # [T, E] values 0..T-1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, E), 0)
    Rmat = (row_ids == local_center).astype(jnp.float32)

    nbr = nbr_ref[0]                                     # [1, E] int32

    f32 = jnp.float32
    # preferred_element_type only sets the ACCUMULATOR dtype; input precision
    # (single-pass bf16 vs 3-pass ~fp32) is the `precision` argument.
    prec = jax.lax.Precision.HIGHEST if accurate else jax.lax.Precision.DEFAULT

    def dot(a_, b_):
        return jnp.dot(a_, b_, preferred_element_type=f32, precision=prec)

    # Neighbor gather = one-hot matmul. For large clouds the [N, E] one-hot
    # exceeds VMEM, so the contraction loops over table chunks of NT rows —
    # the one-hot chunk is regenerated per step (iota compare), classic
    # matmul K-loop with on-the-fly operand.
    NT = min(N, table_chunk)

    def gather_cols(nt_chunk_idx, acc):
        h_acc, x_acc = acc
        base = nt_chunk_idx * NT
        n_ids = jax.lax.broadcasted_iota(jnp.int32, (NT, E), 0) + base
        Opart = (n_ids == jnp.broadcast_to(nbr, (NT, E))).astype(f32)
        ht_part = ht_ref[0, :, pl.ds(base, NT)]
        xt_part = xt_ref[0, :, pl.ds(base, NT)]
        return (h_acc + dot(ht_part, Opart), x_acc + dot(xt_part, Opart))

    if window is not None:
        # Morton/Hilbert-window gather (ops/morton.py): the graph builder
        # guarantees every neighbor of tile i lies in [S(i), S(i)+window), so
        # comparing against the window slice alone is EXACT for this graph.
        # S(i) from the ONE shared definition (ops/morton.window_start_at;
        # constant multiply OUTERMOST so Mosaic can statically prove the
        # dynamic lane offset is 128-aligned)
        from ..morton import window_start_at
        S = window_start_at(i, T, N, window)
        n_ids = jax.lax.broadcasted_iota(jnp.int32, (window, E), 0) + S
        # fast compiled mode: bf16 one-hot + tables — bit-identical on TPU
        # (DEFAULT-precision matmuls already round inputs to bf16) but ~5%
        # less VMEM->MXU traffic; interpret mode keeps f32 (CPU DEFAULT is
        # full fp32, so casting there would CHANGE numerics).
        # h and x stack into ONE [C+3, W] gather matmul.
        gdt = jnp.bfloat16 if cast_bf16 else f32
        O = (n_ids == jnp.broadcast_to(nbr, (window, E))).astype(gdt)
        tab = jnp.concatenate([ht_ref[0, :, pl.ds(S, window)],
                               xt_ref[0, :, pl.ds(S, window)]], axis=0)
        hx = dot(tab.astype(gdt), O)
        h_col, x_col = hx[:C], hx[C:]
    elif N == NT:
        n_ids = jax.lax.broadcasted_iota(jnp.int32, (N, E), 0)
        O = (n_ids == jnp.broadcast_to(nbr, (N, E))).astype(f32)
        h_col = dot(ht, O)            # [C, E]
        x_col = dot(xt, O)            # [3, E]
    else:
        h_col, x_col = jax.lax.fori_loop(
            0, N // NT, gather_cols,
            (jnp.zeros((C, E), f32), jnp.zeros((3, E), f32)))

    h_row = dot(h_tile, Rmat)     # [C, E]
    x_row = dot(x_tile, Rmat)     # [3, E]

    # --- fused edge geometry (ops/edge_geometry.py semantics, rows layout) ---
    rel = x_row - x_col
    radial = jnp.sum(rel * rel, axis=0, keepdims=True)
    dist = jnp.sqrt(radial + 1e-20)
    dotf = jnp.sum(x_row * x_col, axis=0, keepdims=True)

    a, a_n = _safe_unit(rel)
    cr = _cross_rows(x_row, x_col)
    b, b_n = _safe_unit(cr)
    cvec = _cross_rows(a, b)
    c_n = jnp.sqrt(jnp.sum(cvec * cvec, axis=0, keepdims=True) + 1e-20)
    a_unit_n = jnp.sqrt(jnp.sum(a * a, axis=0, keepdims=True) + 1e-20)
    b_unit_n = jnp.sqrt(jnp.sum(b * b, axis=0, keepdims=True) + 1e-20)
    degen = ((a_unit_n < _DEGEN) | (b_unit_n < _DEGEN) | (c_n < _DEGEN))

    # flattened frame [a0,b0,c0,a1,b1,c1,a2,b2,c2]; degenerate → identity
    # (identity pattern = ones at rows 0,4,8 — built by iota, not captured)
    ident_rows = jax.lax.broadcasted_iota(jnp.int32, (9, E), 0)
    ident = jnp.where(ident_rows % 4 == 0, 1.0, 0.0).astype(f32)
    so3 = jnp.concatenate([
        _row(a, 0), _row(b, 0), _row(cvec, 0),
        _row(a, 1), _row(b, 1), _row(cvec, 1),
        _row(a, 2), _row(b, 2), _row(cvec, 2),
    ], axis=0)                                           # [9, E]
    so3 = jnp.where(jnp.broadcast_to(degen, so3.shape), ident, so3)

    geo = jnp.concatenate([radial, dist, dotf, so3], axis=0)    # [12, E]

    # --- edge MLP (first layer split by input blocks; edge_attr folded in b1) ---
    m = (dot(w1hr_ref[:], h_row) + dot(w1hc_ref[:], h_col)
         + dot(w1g_ref[:], geo) + b1_ref[:])
    m = m * jax.nn.sigmoid(m)                            # SiLU
    m = dot(w2_ref[:], m) + b2_ref[:]

    # LayerNorm over the C sublanes (feature axis), torch eps
    mu = jnp.mean(m, axis=0, keepdims=True)
    var = jnp.mean((m - mu) ** 2, axis=0, keepdims=True)
    m = (m - mu) * jax.lax.rsqrt(var + 1e-5) * lns_ref[:] + lnb_ref[:]

    # coordinate scale φ_x(m)
    s = dot(wc0_ref[:], m) + bc0_ref[:]
    s = s * jax.nn.sigmoid(s)
    s = dot(wc1_ref[:], s)                               # [1, E]
    trans = rel * s

    # --- accumulate onto centers: agg = msgs @ Rᵀ (k-regular, no scatter) ---
    @pl.when(c == 0)
    def _():
        aggm_ref[:] = jnp.zeros_like(aggm_ref)
        aggx_ref[:] = jnp.zeros_like(aggx_ref)

    dn = (((1,), (1,)), ((), ()))
    aggm_ref[:] += jax.lax.dot_general(m, Rmat, dn, preferred_element_type=f32,
                                       precision=prec)
    aggx_ref[:] += jax.lax.dot_general(trans, Rmat, dn, preferred_element_type=f32,
                                       precision=prec)

    # --- finalize: node update + residual, coordinate update ---
    @pl.when(c == n_chunks - 1)
    def _():
        xout_ref[0] = x_tile + aggx_ref[:]
        hcat = jnp.concatenate([h_tile, aggm_ref[:]], axis=0)    # [2C, T]
        out = dot(wn0_ref[:], hcat) + bn0_ref[:]
        out = out * jax.nn.sigmoid(out)
        out = dot(wn1_ref[:], out) + bn1_ref[:]
        hout_ref[0] = h_tile + out
        if emit_aggm:
            aggm_out_ref[0] = aggm_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_t", "chunk", "interpret",
                                              "accurate", "table_chunk",
                                              "emit_aggm", "window"))
def egcl_layer_pallas(h: Array, x: Array, nbr_idx: Array, params: EGCLParams,
                      tile_t: int = 128, chunk: int = 512,
                      interpret: bool = False,
                      accurate: bool = True,
                      table_chunk: int = 2048,
                      emit_aggm: bool = False,
                      window: int | None = None):
    """One fused EGCL layer.

    h: [B, C, N] fp32 (transposed layout), x: [B, 3, N], nbr_idx: [B, N, K].
    Returns (h', x') in the same layout. N must divide by tile_t and
    tile_t*K by chunk.

    window: if set, nbr_idx MUST satisfy the curve-window invariant
    (ops/morton.knn_graph_window with the same tile/window) — gathers then
    compare against [window, E] instead of [N, E].
    """
    b, c_dim, n = h.shape
    k = nbr_idx.shape[-1]
    T = tile_t
    tk = T * k
    E = min(chunk, tk)
    assert n % T == 0 and tk % E == 0, (n, T, tk, E)
    assert n % min(n, table_chunk) == 0, (n, table_chunk)
    if window is not None:
        assert window % 128 == 0 and T <= window <= n, (window, T, n)
        assert window % T == 0 and (n - window) % T == 0, (window, T, n)
    n_chunks = tk // E
    nbr_flat = nbr_idx.reshape(b, 1, n * k).astype(jnp.int32)

    grid = (b, n // T, n_chunks)

    def const_spec(p):
        return pl.BlockSpec(p.shape, lambda bb, ii, cc: (0,) * p.ndim,
                            memory_space=pltpu.VMEM)

    p = params
    kernel = functools.partial(_egcl_kernel, T=T, E=E, K=k, N=n, C=c_dim,
                               accurate=accurate, table_chunk=table_chunk,
                               emit_aggm=emit_aggm, window=window,
                               cast_bf16=not accurate and not interpret)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, E),
                         lambda bb, ii, cc, tk_=tk, E_=E: (bb, 0, (ii * tk_ // E_) + cc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_dim, n), lambda bb, ii, cc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda bb, ii, cc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [const_spec(q) for q in p],
        out_specs=[
            pl.BlockSpec((1, c_dim, T), lambda bb, ii, cc: (bb, 0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, T), lambda bb, ii, cc: (bb, 0, ii),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((1, c_dim, T), lambda bb, ii, cc: (bb, 0, ii),
                           memory_space=pltpu.VMEM)] if emit_aggm else []),
        out_shape=[
            jax.ShapeDtypeStruct((b, c_dim, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, n), jnp.float32),
        ] + ([jax.ShapeDtypeStruct((b, c_dim, n), jnp.float32)]
             if emit_aggm else []),
        scratch_shapes=[
            pltpu.VMEM((c_dim, T), jnp.float32),
            pltpu.VMEM((3, T), jnp.float32),
        ],
        interpret=interpret,
    )(nbr_flat, h, x, *p)
    if emit_aggm:
        return tuple(outs)
    h_out, x_out = outs
    return h_out, x_out


def egnn_forward_pallas(variables: dict, h: Array, x: Array, nbr_idx: Array,
                        tile_t: int = 128, chunk: int | None = None,
                        interpret: bool = False,
                        accurate: bool = True,
                        table_chunk: int = 2048,
                        window: int | None = None) -> tuple[Array, Array]:
    """Full EGNN forward (embedding → n×EGCL → embedding) on the fused kernel.

    Takes the SAME flax variables tree as models/egnn.EGNN (standard layout
    h [B, N, C_in], x [B, N, 3]) and matches its 'center'/'frame' output to
    fp32 tolerance. The embeddings are plain XLA matmuls (they're already a
    single fused op); each EGCL runs as one Pallas layer.
    """
    tree = variables["params"] if "params" in variables else variables
    emb_in = tree["embedding_in"]
    emb_out = tree["embedding_out"]

    # Accurate (3-pass) VMEM chunk caps, measured on v5e: the FULL-TABLE
    # one-hot is [table_chunk, E] fp32 — beyond 256 lanes it OOMs VMEM. The
    # WINDOW one-hot is only [window, E]: up to 1024 lanes fit and run 21%
    # faster (4.88 -> 3.84 ms/layer-batch at B=16, W=384; 2048 crashes the
    # compiler — same envelope as the backward, egcl_backward.py).
    acc_cap = (1024 if window is not None else 256) if accurate else None
    k = nbr_idx.shape[-1]
    if chunk is None:
        # fast mode is ~30% faster with one full-tile chunk (no accumulation
        # loop) as long as the [table_chunk, chunk] one-hot stays in budget
        chunk = tile_t * k
        if window is not None and not accurate:
            # keep the [window, chunk] one-hot within the VMEM budget
            chunk = min(chunk, 2048)
    if acc_cap is not None and chunk > acc_cap:
        # must still DIVIDE tile_t*K (the kernel's chunking invariant)
        chunk = tile_t * k
        while chunk > acc_cap or (tile_t * k) % chunk:
            chunk //= 2

    squeeze = h.ndim == 2
    if squeeze:
        h, x, nbr_idx = h[None], x[None], nbr_idx[None]

    prec = jax.lax.Precision.HIGHEST if accurate else jax.lax.Precision.DEFAULT
    h = jnp.matmul(h, emb_in["kernel"], precision=prec) + emb_in["bias"]
    ht = jnp.swapaxes(h, -1, -2).astype(jnp.float32)      # [B, C, N]
    xt = jnp.swapaxes(x, -1, -2).astype(jnp.float32)      # [B, 3, N]

    n_layers = sum(1 for kk in tree if kk.startswith("gcl_"))
    for li in range(n_layers):
        params = params_from_tree(tree[f"gcl_{li}"])
        # every layer routes through the custom-VJP wrapper: identical
        # forward kernel, hand-written Pallas backward at the SAME precision
        # mode — the whole EGNN is differentiable end-to-end in both fast
        # (1-pass bf16) and accurate (3-pass ~fp32) modes (egcl_backward.py)
        from .egcl_backward import egcl_fused_diff
        ht, xt = egcl_fused_diff(ht, xt, nbr_idx, params,
                                 tile_t, chunk, interpret, window, accurate)

    h = jnp.swapaxes(ht, -1, -2)
    h = jnp.matmul(h, emb_out["kernel"], precision=prec) + emb_out["bias"]
    x = jnp.swapaxes(xt, -1, -2)
    if squeeze:
        return h[0], x[0]
    return h, x
