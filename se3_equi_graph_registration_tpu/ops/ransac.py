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

`ransac_pose_branches` additionally returns the top-B vote winners that are
mutually DISTINCT as poses, for downstream verified selection (the
low-overlap regime where a consistent cluster of wrong matches outvotes the
true cluster — registration._register_core refines every branch and keeps
the one with the smallest trimmed surface residual).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .kabsch import kabsch_weighted

Array = jax.Array

__all__ = ["ransac_pose", "ransac_pose_branches"]


def _hypothesis_pool(src, tgt, scores, key, hypotheses, top_m, inlier_tau,
                     solver, vote):
    """Shared core: candidate subset, minimal-sample solves, votes.

    Returns (s, y [M, 3] candidate pairs, cand [M] ids, R_h/t_h the [K]
    hypothesis poses, inl [K, M] inlier masks, gain [K] votes)."""
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
    tau2 = inlier_tau * inlier_tau
    inl = d2 < tau2
    if vote == "count":
        gain = jnp.sum(inl, axis=-1).astype(jnp.float32)
    elif vote == "msac":
        # truncated-quadratic (MSAC) gain: a candidate at distance d inside
        # the gate contributes 1 - d²/τ² instead of 1 — weighs cluster
        # TIGHTNESS, which binary counting ignores
        gain = jnp.sum(jnp.maximum(1.0 - d2 / tau2, 0.0), axis=-1)
    else:
        raise ValueError(f"unknown vote {vote!r}; expected 'count' or 'msac'")
    return s, y, cand, R_h, t_h, inl, gain


def _refit(s, y, w, R_prev, t_prev, inlier_tau, solver):
    """Refit on an inlier set, then one re-inlier round against the LSQ
    pose; an empty inlier set at either step KEEPS the previous pose
    (kabsch_weighted would degrade to (I, 0) — wrong here, where the
    minimal-sample pose is still the best available answer)."""
    def _guarded_solve(w, R0, t0):
        R2, t2 = kabsch_weighted(s, y, w, solver=solver)
        ok = jnp.sum(w) > 0
        return (jnp.where(ok, R2, R0), jnp.where(ok, t2, t0))

    R, t = _guarded_solve(w, R_prev, t_prev)
    posed2 = s @ R.T + t
    w2 = (jnp.sum((posed2 - y) ** 2, -1)
          < inlier_tau * inlier_tau).astype(jnp.float32)
    R, t = _guarded_solve(w2, R, t)
    return R, t, w2


def ransac_pose(src: Array, tgt: Array, scores: Array, key: Array,
                hypotheses: int = 512, top_m: int = 256,
                inlier_tau: float = 0.09, solver: str = "svd",
                vote: str = "count") -> tuple[Array, Array, Array]:
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

    `vote` picks the winner's gain: 'count' (classic inlier count) or 'msac'
    (truncated-quadratic — rewards tight clusters). Degenerate draws
    (collinear triplets) just score few inliers and lose the vote; an
    all-outlier candidate set returns the best-effort pose with its (small)
    inlier mask — compose with `kabsch_irls`/`icp_refine` after.
    """
    n = scores.shape[-1]
    s, y, cand, R_h, t_h, inl, gain = _hypothesis_pool(
        src, tgt, scores, key, hypotheses, top_m, inlier_tau, solver, vote)
    best = jnp.argmax(gain)
    R, t, w_cand = _refit(s, y, inl[best].astype(jnp.float32),
                          R_h[best], t_h[best], inlier_tau, solver)
    w = jnp.zeros((n,), jnp.float32).at[cand].set(w_cand)
    return R, t, w


def ransac_pose_branches(src: Array, tgt: Array, scores: Array, key: Array,
                         branches: int, hypotheses: int = 512,
                         top_m: int = 256, inlier_tau: float = 0.09,
                         solver: str = "svd", vote: str = "count"
                         ) -> tuple[Array, Array, Array]:
    """Top-`branches` vote winners that are mutually DISTINCT as poses.

    Greedy non-maximum suppression over the hypothesis pool: pick the top
    vote-getter, refit it on its inlier set exactly like `ransac_pose`'s
    winner, then suppress every hypothesis supported by the SAME cluster —
    one whose inlier set overlaps the pick's refit inlier set by more than
    half (inlier-set overlap is basin identity here; pose proximity is not —
    two noisy minimal draws of one cluster can sit > 30 deg apart yet refit
    to the same optimum, measured). Repeat. Returns (R [B, 3, 3], t [B, 3],
    w [B, N]).

    This exists for the low-overlap failure mode where a CONSISTENT cluster
    of wrong matches — descriptor look-alike patches related by a rigid
    motion — outvotes the true cluster: no within-candidate-set gain can
    tell them apart (measured: MSAC and fine-tau votes pick the same wrong
    winner), and verification against the pre-refinement poses is invalid
    (an unconverged true pose scores worse than a converged wrong one —
    measured 20-seed success DROPPED with pose-level verification). The
    discriminating signal only appears after each branch is refined to its
    own local optimum: registration._register_core runs IRLS + trimmed ICP
    per branch and keeps the smallest trimmed NN surface residual (measured
    1.4-2.4x higher for wrong-cluster optima, ~1.00-1.03x for correct ones).
    If fewer than `branches` distinct basins exist, later picks repeat the
    all-suppressed argmax (gain -inf everywhere → argmax returns 0); the
    duplicate branches simply tie downstream — harmless.
    """
    n = scores.shape[-1]
    s, y, cand, R_h, t_h, inl, gain = _hypothesis_pool(
        src, tgt, scores, key, hypotheses, top_m, inlier_tau, solver, vote)

    Rs, ts, ws = [], [], []
    inl_f = inl.astype(jnp.float32)                            # [K, M]
    counts = jnp.maximum(jnp.sum(inl_f, axis=-1), 1.0)         # [K]
    g = gain
    for _ in range(branches):
        bi = jnp.argmax(g)
        R_b, t_b, w_b = _refit(s, y, inl[bi].astype(jnp.float32),
                               R_h[bi], t_h[bi], inlier_tau, solver)
        Rs.append(R_b)
        ts.append(t_b)
        ws.append(jnp.zeros((n,), jnp.float32).at[cand].set(w_b))
        # suppress every hypothesis whose support comes from this pick's
        # cluster: inlier-set overlap with the refit inliers > 1/2 (one
        # [K, M] @ [M] matvec)
        overlap = (inl_f @ w_b) / counts                       # [K]
        same = overlap > 0.5
        same = jnp.logical_or(same, jnp.arange(hypotheses) == bi)
        g = jnp.where(same, -jnp.inf, g)
    return jnp.stack(Rs), jnp.stack(ts), jnp.stack(ws)
