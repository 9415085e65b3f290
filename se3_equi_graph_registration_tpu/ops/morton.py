"""Morton (Z-order) sorting and window-restricted k-NN graph construction.

The fused Pallas EGCL kernels gather neighbors with iota-built one-hot
matmuls over the FULL point table — ~40% of the layer cost at N=2048 is the
[N, E] compare + the mostly-zero [C, N] @ [N, E] contraction. Sorting points
along a space-filling curve makes k-NN neighbors land near their center in
index space, so the gather can compare against a ±window slice instead:
[W, E] work, an N/W-fold reduction.

Exactness contract: the window kernel is exact FOR THE GRAPH IT IS GIVEN —
the graph itself is built window-restricted (`knn_graph_window`), i.e. each
point's k nearest neighbors *among its curve window* (cf. the reference's
torch_cluster exact k-NN, src/3dmatch_train_egnn_with_batch.py:1005). This is
an approximate-kNN graph like `knn_method='approx'` (lax.approx_min_k with
recall_target 0.85, already the fast-path default). Measured window recall at
N=2048, k=16, W=384: Morton ~0.83 uniform / ~0.87 clustered; Hilbert (the
default curve — better locality, no octant jumps) ~0.85 / ~0.88; W=512 adds
~+2pp. Missing true neighbors are REPLACED by the next-nearest in-window
point (still nearby), unlike approx_min_k which just mis-selects near-ties.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .knn import pairwise_sq_dists

Array = jax.Array


def _expand_bits_10(v: Array) -> Array:
    """Spread 10 bits of v over 30: abcdefghij → a00b00c00...j (int32)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _quantize(x: Array, bits: int) -> Array:
    """Min-max normalize per cloud and quantize to `bits` per axis (int32)."""
    assert 1 <= bits <= 10, f"bit-spread masks support <=10 bits, got {bits}"
    lo = jnp.min(x, axis=-2, keepdims=True)
    hi = jnp.max(x, axis=-2, keepdims=True)
    scale = (2 ** bits - 1) / jnp.maximum(hi - lo, 1e-12)
    return jnp.clip((x - lo) * scale, 0, 2 ** bits - 1).astype(jnp.int32)


def morton_codes(x: Array, bits: int = 10) -> Array:
    """Morton codes for points x [..., N, 3] → int32 [..., N]. Ties
    (duplicate points) are fine — any consistent order works."""
    q = _quantize(x, bits)
    ex = _expand_bits_10(q[..., 0])
    ey = _expand_bits_10(q[..., 1])
    ez = _expand_bits_10(q[..., 2])
    return (ex << 2) | (ey << 1) | ez


def hilbert_codes(x: Array, bits: int = 10) -> Array:
    """3D Hilbert-curve codes (Skilling's transpose algorithm) — continuous
    curve, no Morton octant jumps, ~+2pp window recall at equal W."""
    q = _quantize(x, bits)
    X = [q[..., 0], q[..., 1], q[..., 2]]
    M = 1 << (bits - 1)
    # axes → transpose form (bit loop unrolled at trace time: `bits` is static)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(3):
            cond = (X[i] & Q) != 0
            t = (X[0] ^ X[i]) & P
            X0_new = jnp.where(cond, X[0] ^ P, X[0] ^ t)
            X[i] = jnp.where(cond, X[i], X[i] ^ t)
            X[0] = X0_new
        Q >>= 1
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[0])
    Q = M
    while Q > 1:
        t = jnp.where((X[2] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    X = [xi ^ t for xi in X]
    # interleave the transpose (X[0] most significant per bit-plane)
    ex = _expand_bits_10(X[0])
    ey = _expand_bits_10(X[1])
    ez = _expand_bits_10(X[2])
    return (ex << 2) | (ey << 1) | ez


def curve_codes(x: Array, bits: int = 10, curve: str = "hilbert") -> Array:
    if curve == "hilbert":
        return hilbert_codes(x, bits)
    if curve == "morton":
        return morton_codes(x, bits)
    raise ValueError(f"unknown curve {curve!r}")


def morton_perm(x: Array, curve: str = "hilbert") -> Array:
    """Permutation (int32 [..., N]) sorting points along the space-filling
    curve (default Hilbert; name kept for the ROADMAP's 'Morton window')."""
    return jnp.argsort(curve_codes(x, curve=curve), axis=-1).astype(jnp.int32)


def window_start_at(i, tile: int, n: int, window: int):
    """Window start for tile index `i` (scalar or array):
    S(i) = clip(i - pad_tiles, 0, (n-window)//tile) * tile — tile-quantized
    so the kernels' dynamic lane offsets are provably 128-aligned (Mosaic
    requires a static proof; the constant multiply must be OUTERMOST). The
    ONE definition shared by the graph builder and all three Pallas kernels
    (they call this with their program id)."""
    pad_tiles = (window - tile) // 2 // tile if window > tile else 0
    return jnp.clip(i - pad_tiles, 0, (n - window) // tile) * tile


def window_starts(n: int, tile: int, window: int) -> Array:
    """Window start per tile (vectorized window_start_at over all tiles)."""
    assert n % tile == 0 and window % tile == 0, (n, tile, window)
    return window_start_at(jnp.arange(n // tile, dtype=jnp.int32),
                           tile, n, window)


# XLA's variadic sort unrolls the bitonic network per operand: TPU compile
# time scales ~linearly with (operands x stages) and blows up fast — measured
# 211s to compile a 37-operand sort at N=2048 (vs 4.4s for argsort), and >10
# MINUTES at N=8192. Runtime-wise wide sorts win only ~0.2ms per embed, so:
# narrow columns (coords, iota) ride the sort, wide tensors (features) are
# gathered by the co-sorted permutation.
_MAX_SORT_OPERANDS = 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sort_by_curve(h: Array, x: Array, curve: str = "hilbert"):
    """Sort (h [..., N, C], x [..., N, 3]) along the space-filling curve
    → (hs, xs, perm).

    Equivalent to `perm = morton_perm(x); take(h/x, perm)` (same stable-sort
    tie-breaks, bit-identical outputs) but cheaper on TPU: ONE key-value sort
    co-sorts the coordinate columns and iota with the curve-code compare
    (replacing argsort + the x gather); h is gathered by the resulting perm
    (features stay OUT of the sort — see _MAX_SORT_OPERANDS). Gradients treat
    the permutation as locally constant (exactly like the argsort formulation
    — the codes are quantized, so no gradient flows through the ordering) and
    lower to scatter-free gathers by the inverse permutation."""
    codes = curve_codes(x, curve=curve)
    iota = jnp.broadcast_to(
        jnp.arange(x.shape[-2], dtype=jnp.int32), codes.shape)
    cols = ((codes,) + tuple(x[..., j] for j in range(x.shape[-1])) + (iota,))
    if 1 <= h.shape[-1] and len(cols) + h.shape[-1] <= _MAX_SORT_OPERANDS:
        cols = cols[:-1] + tuple(
            h[..., j] for j in range(h.shape[-1])) + (iota,)
        out = jax.lax.sort(cols, dimension=-1, num_keys=1)
        nx = x.shape[-1]
        xs = jnp.stack(out[1:1 + nx], axis=-1)
        hs = jnp.stack(out[1 + nx:-1], axis=-1)
        return hs, xs, out[-1]
    out = jax.lax.sort(cols, dimension=-1, num_keys=1)
    xs = jnp.stack(out[1:-1], axis=-1)
    perm = out[-1]
    hs = jnp.take_along_axis(h, perm[..., None], axis=-2)
    return hs, xs, perm


def _sort_by_curve_fwd(h, x, curve):
    hs, xs, perm = sort_by_curve(h, x, curve)
    return (hs, xs, perm), perm


def _sort_by_curve_bwd(curve, perm, g):
    g_hs, g_xs, _ = g
    inv = jnp.argsort(perm, axis=-1)
    gh = jnp.take_along_axis(g_hs, inv[..., None], axis=-2)
    gx = jnp.take_along_axis(g_xs, inv[..., None], axis=-2)
    return gh, gx


sort_by_curve.defvjp(_sort_by_curve_fwd, _sort_by_curve_bwd)


@jax.custom_vjp
def unsort_rows(arrs: tuple, perm: Array) -> tuple:
    """Invert the row permutation on a tuple of [..., N, C_i] arrays:
    u[..., perm[i], :] = a[..., i, :].

    One key-value sort keyed by perm carries the narrow arrays and iota
    (yielding the inverse permutation as a by-product); arrays that would
    push the sort past _MAX_SORT_OPERANDS are gathered by that inverse
    instead (wide sorts explode TPU compile time — see note above). Still
    no argsort pass, and the VJP is a plain gather by perm — scatter-free
    (the generic take_along_axis transpose is a serial TPU scatter)."""
    in_sort, by_gather = [], []
    budget = _MAX_SORT_OPERANDS - 2          # key + iota always ride
    for i, a in enumerate(arrs):
        if a.shape[-1] <= budget:
            in_sort.append(i)
            budget -= a.shape[-1]
        else:
            by_gather.append(i)
    cols = tuple(arrs[i][..., j] for i in in_sort
                 for j in range(arrs[i].shape[-1]))
    iota = jnp.broadcast_to(
        jnp.arange(perm.shape[-1], dtype=jnp.int32), perm.shape)
    out = jax.lax.sort((perm,) + cols + (iota,), dimension=-1, num_keys=1)
    inv = out[-1]
    res: list = [None] * len(arrs)
    o = 1
    for i in in_sort:
        res[i] = jnp.stack(out[o:o + arrs[i].shape[-1]], axis=-1)
        o += arrs[i].shape[-1]
    for i in by_gather:
        res[i] = jnp.take_along_axis(arrs[i], inv[..., None], axis=-2)
    return tuple(res)


def _unsort_rows_fwd(arrs, perm):
    return unsort_rows(arrs, perm), perm


def _unsort_rows_bwd(perm, g):
    import numpy as np

    ga = tuple(jnp.take_along_axis(gi, perm[..., None], axis=-2) for gi in g)
    return ga, np.zeros(perm.shape, dtype=jax.dtypes.float0)


unsort_rows.defvjp(_unsort_rows_fwd, _unsort_rows_bwd)


def permute_rows_matmul(t: Array, perm: Array, invert: bool = False) -> Array:
    """Row permutation of t [..., N, C] as a bf16 one-hot MXU matmul.

    invert=False: out[..., r, :] = t[..., perm[r], :]  (= take_along_axis —
    the sorted-order gather in sort_by_curve); invert=True:
    out[..., perm[r], :] = t[..., r, :] (= unsort_rows' wide-tensor gather).

    2x faster than the TPU gather at [64, 2048, 32] (measured 4.1 -> 2.0 ms
    for two clouds; the one-hot rides the MXU, the gather serializes), and
    the VJP is simply the TRANSPOSED one-hot matmul — scatter-free. The cost:
    t is rounded to bf16. That makes this a fast-path-only tool — the
    engine applies it to the EGNN's h features under `onehot_h_permute`
    (where every downstream consumer is a DEFAULT-precision / bf16-kernel
    matmul that keeps only ~bf16 of h anyway; measured pose delta on the
    shipped checkpoint is inside the fast path's existing accuracy budget,
    BASELINE.md), never to coordinates (Kabsch geometry stays exact fp32).
    """
    n = t.shape[-2]
    iota = jnp.arange(n, dtype=jnp.int32)
    onehot = (perm[..., None] == iota).astype(jnp.bfloat16)  # [..., N, N]
    # row axis of `onehot` is the perm index r, lane axis the source row j:
    # gather contracts j (dim -1), scatter contracts r (dim -2)
    contract = onehot.ndim - (2 if invert else 1)
    batch_dims = tuple(range(onehot.ndim - 2))
    dims = (((contract,), (t.ndim - 2,)), (batch_dims, batch_dims))
    return jax.lax.dot_general(onehot, t.astype(jnp.bfloat16), dims,
                               preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "tile", "window"))
def knn_graph_window(x_sorted: Array, k: int, tile: int = 128,
                     window: int = 384) -> Array:
    """Exact-within-window k-NN over Morton-SORTED points.

    x_sorted: [N, 3] (already permuted by morton_perm). Returns
    nbr_idx [N, K] int32 in SORTED index space, guaranteed to satisfy the
    fused kernel's window invariant: every neighbor of tile i lies in
    [S(i), S(i)+window). Self-matches are included (torch_cluster loop=True
    parity) — the self point is always inside its own window.

    Also ~N/window cheaper than dense k-NN: distances are [T, W] per tile
    instead of [N, N].
    """
    n = x_sorted.shape[0]
    assert n % tile == 0 and window <= n, (n, tile, window)
    starts = window_starts(n, tile, window)                  # [n//tile]

    q = x_sorted.reshape(n // tile, tile, 3)

    def tile_knn(s, q_tile):
        # both start indices must share a dtype (under x64 a literal 0
        # weak-promotes to int64 and lax.dynamic_slice rejects the mix)
        cand = jax.lax.dynamic_slice(x_sorted, (s, jnp.zeros((), s.dtype)),
                                     (window, 3))
        d2 = pairwise_sq_dists(q_tile, cand)                 # [T, W]
        _, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32) + s

    return jax.vmap(tile_knn)(starts, q).reshape(n, k)


def window_recall(x: Array, k: int, tile: int = 128, window: int = 384,
                  curve: str = "hilbert") -> float:
    """Fraction of true k-NN edges kept by the window restriction (host-side
    diagnostic; used by tests and BASELINE.md accounting)."""
    import numpy as np

    from .knn import knn_graph

    perm = np.asarray(morton_perm(x, curve=curve))
    xs = jnp.asarray(np.asarray(x)[perm])
    win = np.asarray(knn_graph_window(xs, k, tile, window))
    exact = np.asarray(knn_graph(xs, k))
    hits = sum(len(set(win[i]) & set(exact[i])) for i in range(win.shape[0]))
    return hits / exact.size


def calibrate_window(clouds, k: int, target_recall: float = 0.90,
                     tile: int = 128,
                     candidates: tuple = (128, 256, 384, 512, 768, 1024),
                     curve: str = "hilbert") -> tuple[int, float]:
    """Pick the smallest `egnn_window` meeting a target edge recall.

    `clouds`: one [N, 3] cloud or a sequence of them (recall averaged).
    Returns (window, measured_recall) for the first candidate whose mean
    window recall >= target_recall, else the largest candidate. Offline
    host-side calibration — run once on a sample of the deployment's clouds
    and pass the result as `EngineConfig(egnn_window=...)`. Rationale: the
    window frontier is speed-flat but recall-sloped (BASELINE.md: W=256 →
    2526 pairs/s @ 0.843 recall, W=512 → 2373 @ 0.924 at N=2048), so W
    should be chosen for recall on REAL data, not guessed.
    """
    import numpy as np

    arr = np.asarray(clouds)
    batch = arr[None] if arr.ndim == 2 else arr
    best = (candidates[-1], 0.0)
    for w in sorted(candidates):
        if w >= batch.shape[1]:      # window covers everything: exact
            return int(w), 1.0
        r = float(np.mean([window_recall(c, k, tile, w, curve)
                           for c in batch]))
        best = (int(w), r)
        if r >= target_recall:
            return best
    return best
