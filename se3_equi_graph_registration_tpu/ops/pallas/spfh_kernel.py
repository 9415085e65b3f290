"""Fused SPFH (Darboux-angle histogram) stage as a Pallas TPU kernel.

The XLA FPFH extractor (ops/fpfh.fpfh) is gather-issue bound: it materializes
x[nbr], normals[nbr] ([N, K, 3] row gathers — TPU gathers serialize at issue
rate) and chains the per-edge Darboux math over [N, K] tensors in HBM
(BASELINE.md global-reg attribution: FPFH is ~45% of the checkpoint-free
pipeline). This kernel keeps the whole per-edge stage on-chip, in the same
transposed edges-in-lanes layout as the fused EGCL kernel
(ops/pallas/egcl_kernel.py):

- neighbor coords+normals gather = ONE one-hot matmul [6, W] @ [W, E] against
  the Hilbert-window slice (the one-hot is iota-built per chunk, never stored
  in HBM);
- center rows broadcast through the iota-built center map R [T, E];
- the Darboux frame (source-pick, cross products, alpha/phi/theta) runs on
  [., E] vectors at full lane utilization;
- histogram binning is a [33, E] one-hot compare, aggregated onto centers by
  one MXU matmul with R^T — no scatter;
- per-point SPFH normalization (each channel sums to 100, PCL convention)
  happens at the last chunk from the accumulated [33, T] scratch.

Outputs SPFH [B, N, 33] plus the per-edge distances [B, N, K] (the weighted
FPFH neighbor accumulation — ops/fpfh._accumulate_window, a banded MXU
matmul — and the valid-neighbor counts are cheap XLA given dist; the SPFH of
*neighbors* can only be consumed after every tile finished, so that pass
stays outside).

Semantics match ops/fpfh.fpfh's SPFH (same masks, same bin formulae) with one
documented deviation: θ is binned by sector half-plane tests instead of
arctan2+floor (Mosaic has no atan2 lowering) — identical except for edges
within fp noise of a bin boundary, where the arctan2 bin is itself
noise-determined. Parity is pinned by tests/test_fpfh.py in interpret mode.
Like the registration pipeline itself this is a no-grad path (no custom VJP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BINS = 11


def _row(v: Array, i: int) -> Array:
    return v[i:i + 1, :]


def _cross_rows(u: Array, v: Array) -> Array:
    """Row-wise cross product of [3, E] arrays → [3, E]."""
    return jnp.concatenate([
        _row(u, 1) * _row(v, 2) - _row(u, 2) * _row(v, 1),
        _row(u, 2) * _row(v, 0) - _row(u, 0) * _row(v, 2),
        _row(u, 0) * _row(v, 1) - _row(u, 1) * _row(v, 0),
    ], axis=0)


def _spfh_kernel(nbr_ref, xt_ref, nt_ref, spfh_ref, dist_ref, hist_ref, *,
                 T: int, E: int, K: int, N: int, W: int, accurate: bool):
    i = pl.program_id(1)
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    f32 = jnp.float32
    prec = jax.lax.Precision.HIGHEST if accurate else jax.lax.Precision.DEFAULT

    def dot(a_, b_, dims=None):
        if dims is None:
            return jnp.dot(a_, b_, preferred_element_type=f32, precision=prec)
        return jax.lax.dot_general(a_, b_, (dims, ((), ())),
                                   preferred_element_type=f32, precision=prec)

    from ..morton import window_start_at
    S = window_start_at(i, T, N, W)
    cand = xt_ref[0, :, pl.ds(S, W)]                     # [3, W]
    ncand = nt_ref[0, :, pl.ds(S, W)]                    # [3, W]
    x_tile = xt_ref[0, :, pl.ds(i * T, T)]               # [3, T]
    n_tile = nt_ref[0, :, pl.ds(i * T, T)]

    # iota-built maps (same pattern as egcl_kernel): edges r-major (r*K + k)
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (T, E), 1)
    local_center = (c * E + e_ids) // K                  # [T, E] in 0..T-1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, E), 0)
    Rmat = (row_ids == local_center).astype(f32)

    nbr = nbr_ref[0]                                     # [1, E] int32 global
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (W, E), 0) + S
    O = (w_ids == jnp.broadcast_to(nbr, (W, E))).astype(f32)

    tab = jnp.concatenate([cand, ncand], axis=0)         # [6, W]
    pn = dot(tab, O)                                     # [6, E]
    pj, nj = pn[:3], pn[3:]
    x_row = dot(x_tile, Rmat)                            # [3, E]
    n_row = dot(n_tile, Rmat)

    d = pj - x_row
    d2 = jnp.sum(d * d, axis=0, keepdims=True)           # [1, E]
    # identical source values round identically through the matmul, so the
    # self pair (and exact duplicates) hit d2 == 0 exactly at either precision
    valid = d2 > 1e-12
    dist = jnp.sqrt(d2)
    dhat = d / (dist + 1e-12)

    cos_i = jnp.abs(jnp.sum(n_row * dhat, axis=0, keepdims=True))
    cos_j = jnp.abs(jnp.sum(nj * dhat, axis=0, keepdims=True))
    take_i = cos_i >= cos_j                              # [1, E]
    tk = jnp.broadcast_to(take_i, (3, E))
    n_s = jnp.where(tk, n_row, nj)
    n_t = jnp.where(tk, nj, n_row)
    dvec = jnp.where(tk, dhat, -dhat)

    u = n_s
    v = _cross_rows(dvec, u)
    v = v / (jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + 1e-24) + 1e-12)
    w = _cross_rows(u, v)

    alpha = jnp.sum(v * n_t, axis=0, keepdims=True)      # [1, E] in [-1, 1]
    phi = jnp.sum(u * dvec, axis=0, keepdims=True)
    ty = jnp.sum(w * n_t, axis=0, keepdims=True)         # atan2(ty, tx) = θ
    tx = jnp.sum(u * n_t, axis=0, keepdims=True)

    def bins(vals, lo, hi):
        t = jnp.clip((vals - lo) / (hi - lo), 0.0, 1.0 - 1e-7)
        idx = jnp.floor(t * _BINS).astype(jnp.int32)     # [1, E]
        b_ids = jax.lax.broadcasted_iota(jnp.int32, (_BINS, E), 0)
        hit = (b_ids == jnp.broadcast_to(idx, (_BINS, E)))
        return jnp.where(hit & jnp.broadcast_to(valid, hit.shape), 1.0, 0.0)

    # θ binning WITHOUT atan2 (no Mosaic lowering exists): bin b covers
    # [θ_b, θ_{b+1}) with θ_b = -π + b·2π/11; membership is two half-plane
    # tests against the boundary directions, cross_b = cosθ_b·y − sinθ_b·x
    # (each wedge is 2π/11 < π wide, so the pair of tests is exact). The
    # ±π seam uses the mathematical sin(±π) = 0, so the tests reduce to the
    # y-sign split. Differs from the arctan2+floor formulation only for
    # edges within fp noise of a bin boundary — where atan2's own bin is
    # noise-determined too (a cross-product fp eps decides the sign).
    import numpy as _np
    ang = -_np.pi + (2.0 * _np.pi / _BINS) * _np.arange(_BINS + 1)
    cs = _np.cos(ang); sn = _np.sin(ang)
    cs[0] = cs[-1] = -1.0
    sn[0] = sn[-1] = 0.0
    # python-scalar constants fold into the ops (array constants would be
    # captured consts, which pallas_call rejects)
    cross = jnp.concatenate(
        [float(cs[b]) * ty - float(sn[b]) * tx for b in range(_BINS + 1)],
        axis=0)                                          # [12, E]
    hit_t = (cross[:_BINS] >= 0.0) & (cross[1:] < 0.0)   # [11, E]
    theta_oh = jnp.where(hit_t & jnp.broadcast_to(valid, hit_t.shape),
                         1.0, 0.0)

    oh = jnp.concatenate([bins(alpha, -1.0, 1.0),
                          bins(phi, -1.0, 1.0),
                          theta_oh], axis=0).astype(f32)  # [33, E]

    @pl.when(c == 0)
    def _():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    # counts are small integers: DEFAULT-precision (bf16-input) matmul is
    # exact for 0/1 operands and integer sums <= 256
    hist_ref[:] += jax.lax.dot_general(
        oh, Rmat, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    dist_ref[0] = jnp.where(valid, dist, 0.0)            # [1, E]

    @pl.when(c == n_chunks - 1)
    def _():
        h = hist_ref[:]                                  # [33, T]
        total = jnp.sum(h[:_BINS], axis=0, keepdims=True)   # valid count [1,T]
        scale = 100.0 / jnp.maximum(total, 1e-6)
        spfh_ref[0] = h * scale


@functools.partial(jax.jit, static_argnames=("window", "tile_t", "chunk",
                                             "interpret", "accurate"))
def spfh_pallas(x: Array, normals: Array, nbr: Array, window: int,
                tile_t: int = 128, chunk: int | None = None,
                interpret: bool = False, accurate: bool = True
                ) -> tuple[Array, Array]:
    """SPFH-33 + per-edge distances over a Hilbert-window neighbor table.

    x/normals: [N, 3] or [B, N, 3] curve-sorted points and their unit normals;
    nbr: [.., N, K] from morton.knn_graph_window / knn_pallas(window=) at the
    SAME tile/window (every neighbor of tile i inside [S(i), S(i)+window)).
    Returns (spfh [.., N, 33], dist [.., N, K] with self/duplicate pairs
    zeroed). Combine into FPFH with ops/fpfh.fpfh_from_spfh (banded-MXU
    neighbor accumulation).

    accurate=True (default) gathers coordinates/normals at fp32 matmul
    precision; False uses DEFAULT (bf16 inputs) — the self-pair mask stays
    exact either way (identical sources round identically), but Darboux
    angles and the 1/d weights pick up ~0.4% rounding.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x, normals, nbr = x[None], normals[None], nbr[None]
    b, n, _ = x.shape
    k = nbr.shape[-1]
    T = tile_t
    tk = T * k
    assert n % T == 0 and T <= window <= n, (n, T, window)
    assert window % T == 0 and (n - window) % T == 0, (window, T, n)
    if chunk is None:
        # largest 128-multiple divisor of T*K that keeps the [window, E]
        # one-hot in VMEM (Mosaic block shapes need lane dims % 128)
        chunk = max(d for d in range(128, min(tk, 2048) + 1, 128)
                    if tk % d == 0)
    E = chunk
    assert tk % E == 0 and E % 128 == 0, (tk, E)

    xt = jnp.swapaxes(x, -1, -2).astype(jnp.float32)      # [B, 3, N]
    nt = jnp.swapaxes(normals, -1, -2).astype(jnp.float32)
    nbr_flat = nbr.reshape(b, 1, n * k).astype(jnp.int32)

    kernel = functools.partial(_spfh_kernel, T=T, E=E, K=k, N=n, W=window,
                               accurate=accurate)
    spfh, dist = pl.pallas_call(
        kernel,
        grid=(b, n // T, tk // E),
        in_specs=[
            pl.BlockSpec((1, 1, E),
                         lambda bb, ii, cc, tk_=tk, E_=E: (bb, 0, ii * (tk_ // E_) + cc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda bb, ii, cc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda bb, ii, cc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 33, T), lambda bb, ii, cc: (bb, 0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E),
                         lambda bb, ii, cc, tk_=tk, E_=E: (bb, 0, ii * (tk_ // E_) + cc),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 33, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n * k), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((33, T), jnp.float32)],
        interpret=interpret,
    )(nbr_flat, xt, nt)
    spfh = jnp.swapaxes(spfh, -1, -2)                     # [B, N, 33]
    dist = dist.reshape(b, n, k)
    if squeeze:
        return spfh[0], dist[0]
    return spfh, dist
