"""Exact k-NN as a Pallas TPU kernel.

`lax.top_k` over a [B, N, N] distance matrix costs ~28ms at B=16, N=2048 (it
sorts far more than k=16 needs); `lax.approx_min_k` is fast but inexact. This
kernel computes the distance tile on the MXU and extracts the k minima by
iterative (min, mask) sweeps on the VPU — exact, with lowest-index tie-breaking
(identical to lax.top_k on negated distances), in one fused pass that never
materializes the distance matrix in HBM.

Layout: coordinates transposed [3, N] (points in lanes). Grid (B, N/T); each
program computes d² [T, N] = ‖x_tile‖² + ‖x‖² − 2·x_tileᵀx and runs K
extraction sweeps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _knn_kernel(xt_ref, out_ref, *, T: int, N: int, K: int,
                include_self: bool, window: int | None = None,
                packed: bool = False):
    i = pl.program_id(1)
    f32 = jnp.float32

    x_tile = xt_ref[0, :, pl.ds(i * T, T)]           # [3, T]
    if window is not None:
        # curve-window candidates — S(i) from the ONE shared definition
        # (ops/morton.window_start_at; Mosaic-safe tile quantization)
        from ..morton import window_start_at
        S = window_start_at(i, T, N, window)
        cand = xt_ref[0, :, pl.ds(S, window)]        # [3, W]
        W = window
    else:
        S = 0
        cand = xt_ref[0]                             # [3, N]
        W = N

    x2_full = jnp.sum(cand * cand, axis=0, keepdims=True)      # [1, W]
    x2_tile = jnp.sum(x_tile * x_tile, axis=0, keepdims=True)  # [1, T]
    cross = jax.lax.dot_general(
        x_tile, cand, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    d2 = x2_tile.T - 2.0 * cross + x2_full                     # [T, W]

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)  # window-local
    if not include_self:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, W), 0) + i * T
        d2 = jnp.where(lane_ids + S == row_ids, jnp.inf, d2)

    # K is static — unroll so every output column store has a static index
    # (Mosaic rejects dynamically-indexed strided vector stores)
    if packed:
        # Pack (distance, lane) into ONE int32 sort key: non-negative f32
        # bit patterns are monotone, so dropping the low 10 mantissa bits
        # makes room for the lane id and a single min-reduction yields BOTH
        # the winning distance and its index — ~half the VPU work of the
        # compare/select formulation below. Quantization: candidates whose
        # d² agree to ~2^-13 relative may swap (pure near-tie noise; the
        # lower lane wins among quantized ties, matching the exact kernel).
        # Cancellation can make d² slightly negative: negative f32 bits sort
        # (signed) before all positives, so those ≈0 candidates still win,
        # with an arbitrary order among themselves.
        assert W <= 1024, "packed lane id needs W <= 1024"
        bits = jax.lax.bitwise_and(
            jax.lax.bitcast_convert_type(d2, jnp.int32),
            jnp.int32(~0x3FF))
        key = jax.lax.bitwise_or(bits, lane_ids)               # [T, W]
        for kk in range(K):
            kmin = jnp.min(key, axis=1, keepdims=True)         # [T, 1]
            idx = jax.lax.bitwise_and(kmin, jnp.int32(0x3FF))
            out_ref[0, :, kk:kk + 1] = idx + S
            key = jnp.where(key == kmin, jnp.int32(0x7FFFFFFF), key)
        return

    d = d2
    gids = lane_ids + S                                        # global ids
    for kk in range(K):
        cur_min = jnp.min(d, axis=1, keepdims=True)            # [T, 1]
        # lowest-index tie-break: first lane attaining the minimum
        is_min = d <= cur_min
        idx = jnp.min(jnp.where(is_min, gids, N), axis=1,
                      keepdims=True)                           # [T, 1]
        out_ref[0, :, kk:kk + 1] = idx.astype(jnp.int32)
        d = jnp.where(gids == idx, jnp.inf, d)


@functools.partial(jax.jit, static_argnames=("k", "include_self", "tile_t",
                                             "interpret", "window", "packed"))
def knn_pallas(x: Array, k: int, include_self: bool = True,
               tile_t: int = 256, interpret: bool = False,
               window: int | None = None, packed: bool = False) -> Array:
    """Exact k-NN of x [B, N, 3] (or [N, 3]) → nbr_idx int32 [B, N, K].

    window: exact k-NN restricted to the curve window (x must be sorted by
    ops/morton.morton_perm; tile_t must equal the consuming EGCL kernel's
    tile). Matches morton.knn_graph_window bit-for-bit at the same
    tile/window.

    packed (window mode only, window <= 1024): packs (distance, lane) into
    one int32 key so each extraction sweep is a single min-reduction — ~2x
    less VPU work. Selection may differ from exact for candidates whose d²
    agree within ~2^-13 relative (near-tie noise, far below the window
    graph's own ~0.85 edge recall); used by the engine's fast config."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    b, n, _ = x.shape
    T = min(tile_t, n)
    assert n % T == 0, (n, T)
    if window is not None:
        assert window % T == 0 and (n - window) % T == 0, (window, T, n)
    if packed:
        assert window is not None and window <= 1024, \
            "packed mode needs a curve window <= 1024 (10-bit lane ids)"
    xt = jnp.swapaxes(x, -1, -2).astype(jnp.float32)   # [B, 3, N]

    kernel = functools.partial(_knn_kernel, T=T, N=n, K=k,
                               include_self=include_self, window=window,
                               packed=packed)
    out = pl.pallas_call(
        kernel,
        grid=(b, n // T),
        in_specs=[pl.BlockSpec((1, 3, n), lambda bb, ii: (bb, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, k), lambda bb, ii: (bb, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        interpret=interpret,
    )(xt)
    return out[0] if squeeze else out
