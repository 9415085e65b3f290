"""Loss library — pure jnp functions over `RegistrationOutputs` and batch data.

Ports the reference's loss semantics (verified against
/root/reference/src/3dmatch_train_egnn_with_batch.py):
  - `correspondence_loss`  = BCE-with-logits on top-k scores vs gathered labels (:772-773)
  - `similarity_consistency_loss` = MSE of standardized post- vs pre-EGNN
    similarity (:777-781)
  - `egnn_equi_loss`       = label-masked squared chamfer under GT pose +
    cosine-feature-similarity MSE (:860-893)
  - `masked_point_and_feature_loss` = compute_losses (:799-858) recast with
    masked means instead of boolean indexing
  - `pose_loss`            = geodesic rotation angle + translation-direction
    angle (:948-962)
The 3DMatch total train loss is corr + sim + rot + trans: the driver writes
corr + rot + trans (:1120), but the head's `corr_loss` return is really
corr_loss + sim_loss fused (:796) — tests/test_train_parity.py pins the
composed gradient against the imported driver. KITTI uses corr + equi
(/root/reference/src/kitti_train_egnn_with_batch.py:1089). Weights are
explicit here so both are configs of the same engine.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.se3 import decompose_trans
from ..ops.numerics import safe_norm

Array = jax.Array


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """Numerically-stable elementwise binary cross entropy with logits, meaned."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(neg_abs))
    return jnp.mean(loss)


def correspondence_loss(scores: Array, top_labels: Array) -> Array:
    return bce_with_logits(scores, top_labels)


def similarity_consistency_loss(similarity: Array, raw_similarity: Array) -> Array:
    """MSE between globally-standardized post- and pre-EGNN similarities.

    torch.Tensor.std is UNBIASED (ddof=1) — the reference standardizes with
    it (:777-781), so ddof=1 here keeps loss parity (jnp defaults to ddof=0;
    tests/test_loss_parity.py pins this against the imported reference)."""
    def _standardize(s):
        return (s - s.mean()) / (s.std(ddof=1) + 1e-6)
    d = _standardize(similarity) - _standardize(raw_similarity)
    return jnp.mean(d * d)


def egnn_equi_loss(h_src: Array, x_src: Array, h_tgt: Array, x_tgt: Array,
                   gt_pose: Array, labels: Array) -> Array:
    """Masked chamfer under the GT pose + cosine-similarity MSE (:860-893)."""
    R_gt, t_gt = decompose_trans(gt_pose)
    x_src_tf = jnp.einsum("bij,bnj->bni", R_gt, x_src) + t_gt[:, None, :]
    sq = jnp.sum((x_src_tf - x_tgt) ** 2, axis=-1)            # [B, N]
    rotation_loss = jnp.mean(sq * labels)

    cos = jnp.sum(h_src * h_tgt, axis=-1) / (
        safe_norm(h_src) * safe_norm(h_tgt) + 1e-8
    )
    feature_loss = jnp.mean((cos - labels) ** 2)
    return rotation_loss + feature_loss


def masked_point_and_feature_loss(R: Array, t: Array, h_src: Array, x_src: Array,
                                  h_tgt: Array, x_tgt: Array,
                                  labels: Array) -> tuple[Array, Array]:
    """compute_losses (:799-858) with masked means (fixed shapes).

    point_error: per-batch mean ‖R x_src + t − x_tgt‖ over label==1 points,
    then meaned over the batch. feature_loss: mean feature L2 distance over
    all label==1 pairs (global masked mean).
    """
    x_tf = jnp.einsum("bij,bnj->bni", R, x_src) + t[:, None, :]
    dist = safe_norm(x_tf - x_tgt)                            # [B, N]
    per_batch = jnp.sum(dist * labels, axis=1) / jnp.maximum(jnp.sum(labels, axis=1), 1.0)
    point_error = jnp.mean(per_batch)

    fdist = safe_norm(h_src - h_tgt)                          # [B, N]
    feature_loss = jnp.sum(fdist * labels) / jnp.maximum(jnp.sum(labels), 1.0)
    return point_error, feature_loss


def _safe_arccos(cos: Array, eps: float = 1e-6) -> Array:
    """arccos clipped to (−1+eps, 1−eps): d/dx arccos at ±1 is ∓inf, and a
    perfectly-aligned pose (trace exactly 3) otherwise NaNs the whole gradient
    — a live landmine in the reference's pose_loss (:932, :952, :960) that we
    defuse. Worst-case angle bias is √(2eps) ≈ 0.08°."""
    return jnp.arccos(jnp.clip(cos, -1.0 + eps, 1.0 - eps))


def pose_loss(pred_R: Array, pred_t: Array, gt_pose: Array) -> tuple[Array, Array]:
    """Geodesic rotation loss + translation-direction (cosine) loss, per batch
    element [B] each (:948-962)."""
    gt_R, gt_t = decompose_trans(gt_pose)
    M = jnp.einsum("bji,bjk->bik", pred_R, gt_R)     # pred_Rᵀ @ gt_R
    trace = jnp.trace(M, axis1=-2, axis2=-1)
    rotation_loss = _safe_arccos((trace - 1.0) / 2.0)

    dot = jnp.sum(pred_t * gt_t, axis=-1)
    denom = safe_norm(pred_t) * safe_norm(gt_t)
    cos = dot / jnp.maximum(denom, 1e-8)
    translation_loss = _safe_arccos(cos)
    return rotation_loss, translation_loss


class LossWeights(NamedTuple):
    corr: float = 1.0
    sim: float = 1.0
    rot: float = 1.0
    trans: float = 1.0
    equi: float = 0.0   # 3DMatch default; KITTI config sets equi=1, rot=trans=0


class LossBreakdown(NamedTuple):
    total: Array
    corr: Array
    sim: Array
    rot: Array
    trans: Array
    equi: Array


def total_loss(outputs, gt_pose: Array, labels: Array,
               weights: LossWeights = LossWeights()) -> LossBreakdown:
    """Combine the loss family exactly as the reference train drivers do."""
    corr = correspondence_loss(outputs.scores, outputs.top_labels)
    sim = similarity_consistency_loss(outputs.similarity, outputs.raw_similarity)
    rot, trans = pose_loss(outputs.R, outputs.t, gt_pose)
    rot, trans = jnp.mean(rot), jnp.mean(trans)
    equi = egnn_equi_loss(outputs.h_src, outputs.x_src, outputs.h_tgt,
                          outputs.x_tgt, gt_pose, labels)
    total = (weights.corr * corr + weights.sim * sim + weights.rot * rot
             + weights.trans * trans + weights.equi * equi)
    return LossBreakdown(total=total, corr=corr, sim=sim, rot=rot,
                         trans=trans, equi=equi)
