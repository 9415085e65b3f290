"""Fixed-shape RANSAC pose hypotheses, batched on the MXU.

The reference has no robust solver at all, and classic RANSAC loops
(per-hypothesis Python iteration with data-dependent early exit, e.g.
open3d's registration_ransac_based_on_feature_matching) cannot jit on TPU.
This is the TPU-native formulation: ALL `hypotheses` minimal 3-point solves
run as one vmapped batch, all hypothesis×candidate residuals as one
broadcast matmul round, argmax of inlier count picks the winner — a single
fixed-shape jitted program, no trip-count dependence.

Complements ops/spectral (one global consistency eigenvector — precise but
single-shot: a misleading candidate ordering has no second chance) with a
multi-hypothesis search that only needs ONE of K samples to be all-inlier:
at inlier rate p, P(miss) = (1 - p**3)**K — at p = 5% and K = 1024, 12%;
compose with spectral/IRLS for the final polish.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .kabsch import kabsch_weighted

Array = jax.Array

__all__ = ["ransac_pose"]


def ransac_pose(src: Array, tgt: Array, scores: Array, key: Array,
                hypotheses: int = 512, top_m: int = 256,
                inlier_tau: float = 0.09, solver: str = "svd"
                ) -> tuple[Array, Array, Array]:
    """Robust pose from putative correspondences by minimal-sample voting.

    src/tgt [N, 3]: matched point pairs (row i of src corresponds to row i of
    tgt — e.g. `registration.match_features` output); scores [N]: priors used
    only to pick the top-M candidate subset (like ops/spectral). Samples
    `hypotheses` random triplets from the candidates (score-proportional via
    one categorical draw), solves each minimal Kabsch in one vmapped batch,
    counts candidates within `inlier_tau` of each hypothesis (one
    [K, M] residual broadcast), and re-solves on the best hypothesis's
    inlier set. Returns (R [3,3], t [3], weights [N] — the winning inlier
    mask over all N rows, zero outside the candidate subset).

    Degenerate draws (collinear triplets) just score few inliers and lose
    the vote; an all-outlier candidate set returns the best-effort pose with
    its (small) inlier mask — compose with `kabsch_irls`/`icp_refine` after.
    """
    n = scores.shape[-1]
    m = min(int(top_m), n)
    srcf = src.astype(jnp.float32)
    tgtf = tgt.astype(jnp.float32)
    sc = scores.astype(jnp.float32)

    _, cand = jax.lax.top_k(sc, m)                         # [M] candidate ids
    s = srcf[cand]                                         # [M, 3]
    y = tgtf[cand]                                         # [M, 3]

    # score-proportional triplet sampling; the 1e-30 floor keeps logits
    # finite — zero-score candidates keep ~exp(-69) probability (all-zero
    # scores therefore degrade to a uniform draw)
    logits = jnp.log(jnp.maximum(sc[cand], 1e-30))
    trip = jax.random.categorical(key, logits[None, :],
                                  shape=(hypotheses, 3))   # [K, 3] in [0, M)

    ones3 = jnp.ones((hypotheses, 3), jnp.float32)
    R_h, t_h = kabsch_weighted(s[trip], y[trip], ones3, solver=solver)

    # all hypothesis residuals at once: [K, M, 3] via one einsum
    posed = jnp.einsum("kij,mj->kmi", R_h, s) + t_h[:, None, :]
    d2 = jnp.sum((posed - y[None]) ** 2, axis=-1)          # [K, M]
    inl = d2 < inlier_tau * inlier_tau
    best = jnp.argmax(jnp.sum(inl, axis=-1))

    # refit on the winner's inliers, then one re-inlier round against the
    # LSQ pose; an empty inlier set at either step KEEPS the previous pose
    # (kabsch_weighted would degrade to (I, 0) — wrong here, where the
    # minimal-sample pose is still the best available answer)
    def _guarded_solve(w, R_prev, t_prev):
        R2, t2 = kabsch_weighted(s, y, w, solver=solver)
        ok = jnp.sum(w) > 0
        return (jnp.where(ok, R2, R_prev), jnp.where(ok, t2, t_prev))

    w_cand = inl[best].astype(jnp.float32)                 # [M]
    R, t = _guarded_solve(w_cand, R_h[best], t_h[best])
    posed2 = s @ R.T + t
    w_cand = (jnp.sum((posed2 - y) ** 2, -1)
              < inlier_tau * inlier_tau).astype(jnp.float32)
    R, t = _guarded_solve(w_cand, R, t)

    w = jnp.zeros((n,), jnp.float32).at[cand].set(w_cand)
    return R, t, w
