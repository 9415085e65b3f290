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


def _knn_kernel_chunked(xt_ref, out_ref, *, T: int, N: int, K: int, S_pc: int,
                        include_self: bool, window: int):
    """Two-level packed extraction (see knn_pallas(chunked=True)).

    The distance tile is computed TRANSPOSED [W, T] — candidates in
    sublanes, tile points in lanes — so a plain row-major reshape to
    [128, C, T] lands window offset r = q*C + c in chunk c: consecutive
    curve positions (spatial near-neighbors) spread round-robin across the
    C chunks with NO data movement. Each phase-1 sweep min-reduces ALL
    chunks at once (axis 0) — C winners for one full pass instead of packed
    mode's one — and phase 2 runs the K exact packed sweeps on the
    [S_pc*C, T] shortlist at ~shortlist/W of the full-width sweep cost.

    A rejected variant kept the [T, W] orientation and interleaved the
    candidates with a one-hot [W, W] permutation matmul so chunk minima
    were contiguous 128-lane slices: faster in STANDALONE micro-timing,
    but in the vmapped global-registration pipeline the 2.4 MB permutation
    operand turned the k-NN stage marginal from 1.6 to 4.6 ms (measured
    cumulative-prefix, BASELINE.md protocol). This formulation needs no
    extra operand and measures faster end to end, which is the standard
    that counts.
    """
    i = pl.program_id(1)
    f32 = jnp.float32
    W = window
    C = W // 128

    from ..morton import window_start_at
    S = window_start_at(i, T, N, W)
    x_tile = xt_ref[0, :, pl.ds(i * T, T)]                     # [3, T]
    cand = xt_ref[0, :, pl.ds(S, W)]                           # [3, W]

    x2_cand = jnp.sum(cand * cand, axis=0)[:, None]            # [W, 1]
    x2_tile = jnp.sum(x_tile * x_tile, axis=0)[None, :]        # [1, T]
    cross = jax.lax.dot_general(
        cand, x_tile, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    d2 = x2_cand - 2.0 * cross + x2_tile                       # [W, T]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)   # window-local
    if not include_self:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (W, T), 1) + i * T
        d2 = jnp.where(row_ids + S == col_ids, jnp.inf, d2)

    # same (distance | id) int32 packing as packed mode (id = window offset)
    bits = jax.lax.bitwise_and(
        jax.lax.bitcast_convert_type(d2, jnp.int32), jnp.int32(~0x3FF))
    key = jax.lax.bitwise_or(bits, row_ids)                    # [W, T]
    key3 = key.reshape(128, C, T)                              # r = q*C + c

    INF = jnp.int32(0x7FFFFFFF)
    minis = []
    for _ in range(S_pc):
        m = jnp.min(key3, axis=0)                              # [C, T]
        minis.append(m)
        key3 = jnp.where(key3 == m[None], INF, key3)
    short = jnp.concatenate(minis, axis=0)                     # [S_pc*C, T]

    for kk in range(K):
        kmin = jnp.min(short, axis=0, keepdims=True)           # [1, T]
        idx = jax.lax.bitwise_and(kmin, jnp.int32(0x3FF))
        out_ref[0, kk:kk + 1, :] = idx + S
        short = jnp.where(short == kmin, INF, short)


@functools.partial(jax.jit, static_argnames=("k", "include_self", "tile_t",
                                             "interpret", "window", "packed",
                                             "chunked"))
def knn_pallas(x: Array, k: int, include_self: bool = True,
               tile_t: int = 256, interpret: bool = False,
               window: int | None = None, packed: bool = False,
               chunked: bool = False) -> Array:
    """Exact k-NN of x [B, N, 3] (or [N, 3]) → nbr_idx int32 [B, N, K].

    window: exact k-NN restricted to the curve window (x must be sorted by
    ops/morton.morton_perm; tile_t must equal the consuming EGCL kernel's
    tile). Matches morton.knn_graph_window bit-for-bit at the same
    tile/window.

    packed (window mode only, window <= 1024): packs (distance, lane) into
    one int32 key so each extraction sweep is a single min-reduction — ~2x
    less VPU work. Selection may differ from exact for candidates whose d²
    agree within ~2^-13 relative (near-tie noise, far below the window
    graph's own ~0.85 edge recall); used by the engine's fast config.

    chunked (with packed, window a multiple of 128): two-level extraction.
    The W candidates are split round-robin into C = W/128 interleaved
    chunks (consecutive curve positions land in different chunks, so each
    point's neighbors spread ~uniformly); each phase-1 sweep extracts ALL C
    chunk minima for the cost packed mode pays for one, giving a
    [min(2*ceil(K/C), 128//C)*C]-candidate shortlist after S_pc sweeps, and
    phase 2 runs the K packed sweeps on the shortlist at ~W/shortlist of
    the full-width cost. Exact-within-shortlist: a neighbor is missed only
    when one residue class mod C holds more than S_pc of the true top-K —
    geometrically vanishing for interleaved curve positions (measured
    neighbor-set agreement with the packed kernel ≥ 0.9997 at
    k ∈ {16, 60} × W ∈ {512, 768} on a 2048-pt surface cloud, and 1.000
    at the fused pipeline's k=60/W=768 operating point). Built for the
    fused global-registration pipeline's dominant k-NN stage at k=60
    (BASELINE.md attribution)."""
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

    if chunked:
        assert packed and window is not None and window % 128 == 0, \
            "chunked mode extends packed window mode (window % 128 == 0)"
        C = window // 128
        S_pc = min(2 * -(-k // C), 128 // C)
        assert S_pc * C >= k, (
            f"chunked shortlist {S_pc * C} < k={k}: window {window} too "
            "narrow for two-level extraction at this k; use packed=True")
        kernel = functools.partial(_knn_kernel_chunked, T=T, N=n, K=k,
                                   S_pc=S_pc, include_self=include_self,
                                   window=window)
        out = pl.pallas_call(
            kernel,
            grid=(b, n // T),
            in_specs=[pl.BlockSpec((1, 3, n), lambda bb, ii: (bb, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, k, T), lambda bb, ii: (bb, 0, ii),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, k, n), jnp.int32),
            interpret=interpret,
        )(xt)
        out = jnp.swapaxes(out, -1, -2)                # [B, N, K]
        return out[0] if squeeze else out

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
