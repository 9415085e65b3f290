"""Batched, jittable point-to-point ICP refinement for TPU.

The classic fine-registration stage a user of the reference gets from
open3d's `registration_icp` AFTER running the network (the reference itself
ships no refinement — its eval head is a single weighted solve,
/root/reference/src/eval_egnn_metrics.py:594-827). This is the TPU-native
formulation:

- correspondences are recomputed every iteration as 1-NN of the posed source
  against the raw target cloud — a [N, 3] x [3, M] MXU matmul + row argmin,
  NOT a data-dependent neighbor structure, so shapes stay static;
- the loop is a fixed-length `lax.scan`; outlier rejection is a robust
  weight (hard `tau` gate or MAD-scaled kernel from ops/kabsch), never a
  data-dependent slice;
- each solve is the absolute weighted Kabsch from the ORIGINAL source points
  (no pose-composition drift), and an iteration whose weights all vanish
  keeps the previous pose instead of degrading to (I, 0).

Unlike `kabsch_irls` (which reweights the NETWORK's putative correspondence
set), ICP re-associates by geometry — it refines through bad or sparse
correspondences as long as the initial pose is in the right basin. The two
compose: head -> [spectral] -> [IRLS] -> [ICP], coarse to fine.

Memory is O(N*M) for the distance matrix (fp32): at serving shapes
(B=1, N=M=2048) that is 16 MB/iteration inside one scan buffer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .kabsch import _IRLS_KERNELS, kabsch_weighted

Array = jax.Array

__all__ = ["icp_refine", "nearest_neighbor"]


def nearest_neighbor(query: Array, points: Array) -> tuple[Array, Array]:
    """1-NN of query [..., N, 3] in points [..., M, 3] via one MXU matmul.

    Returns (idx [..., N] int32, squared distance [..., N] fp32, clamped at
    0 against fp cancellation). Ties resolve to the lowest index (argmin).
    """
    q = query.astype(jnp.float32)
    p = points.astype(jnp.float32)
    # |q - p|^2 = |q|^2 - 2 q.p + |p|^2 ; the cross term is the MXU matmul
    cross = jnp.einsum("...nd,...md->...nm", q, p)
    d2 = (jnp.sum(q * q, axis=-1)[..., :, None]
          - 2.0 * cross + jnp.sum(p * p, axis=-1)[..., None, :])
    idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    dmin = jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]
    return idx, jnp.maximum(dmin, 0.0)


def icp_refine(src: Array, tgt: Array, R: Array, t: Array, iters: int = 10,
               tau: float = 0.0, kernel: str = "welsch",
               min_sigma: float = 1e-3, solver: str = "svd",
               prior_weights: Array | None = None
               ) -> tuple[Array, Array, Array]:
    """Point-to-point ICP from an initial pose (R [..., 3, 3], t [..., 3]).

    src [..., N, 3] and tgt [..., M, 3] are CLOUDS, not index-aligned
    correspondences — each of the `iters` scan steps re-associates the posed
    source with its nearest target point and re-solves the weighted Kabsch.

    Correspondence weights per iteration: `prior_weights` (e.g. the head's
    inlier weights over src; default ones) times a robust factor of the NN
    distance — `tau > 0` gates hard at that radius (trimmed ICP with static
    shapes); `tau == 0` uses the MAD-scaled `kernel` ('welsch' | 'huber' |
    'cauchy' | 'geman', ops/kabsch._IRLS_KERNELS) so the trim radius adapts
    to the current residual scale. Returns (R, t, final_weights). NaN-safe:
    an all-rejected iteration keeps the previous pose.
    """
    kernels = dict(_IRLS_KERNELS,
                   welsch=lambda u: jnp.exp(-(u * u)))
    if kernel not in kernels:
        raise ValueError(f"unknown ICP kernel {kernel!r}; "
                         f"expected one of {sorted(kernels)}")
    kfn = kernels[kernel]

    srcf = src.astype(jnp.float32)
    tgtf = tgt.astype(jnp.float32)
    w0 = (jnp.ones(srcf.shape[:-1], jnp.float32) if prior_weights is None
          else prior_weights.astype(jnp.float32))

    def body(carry, _):
        R_, t_ = carry
        x = jnp.einsum("...ij,...nj->...ni", R_, srcf) + t_[..., None, :]
        nn, d2 = nearest_neighbor(x, tgtf)
        d = jnp.sqrt(d2)
        if tau > 0:
            w = w0 * (d <= tau)
        else:
            med = jnp.median(d, axis=-1, keepdims=True)
            s = 1.4826 * jnp.median(jnp.abs(d - med), axis=-1, keepdims=True)
            w = w0 * kfn(d / jnp.maximum(s, min_sigma))
        y = jnp.take_along_axis(tgtf, nn[..., None], axis=-2)
        R2, t2 = kabsch_weighted(srcf, y, w, solver=solver)
        ok = jnp.sum(w, axis=-1) > 0
        R2 = jnp.where(ok[..., None, None], R2, R_)
        t2 = jnp.where(ok[..., None], t2, t_)
        return (R2, t2), w

    (R, t), ws = jax.lax.scan(
        body, (R.astype(jnp.float32), t.astype(jnp.float32)), None,
        length=iters)
    return R, t, ws[-1]
