"""Evaluation metrics: RRE / RTE / registration recall / precision / F1.

Numeric parity with /root/reference/tools/evaluation_metrics.py:14-43 (numpy)
— here as jnp so they run on device inside the jitted eval step, plus numpy
convenience wrappers for host-side evaluation scripts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def calculate_pose_error(gt_pose: Array, pred_pose: Array) -> tuple[Array, Array]:
    """(rotation error in degrees, translation error in cm) for 4x4 poses [...,4,4]."""
    trans_err = jnp.linalg.norm(gt_pose[..., :3, 3] - pred_pose[..., :3, 3], axis=-1) * 100.0
    rel = jnp.swapaxes(gt_pose[..., :3, :3], -1, -2) @ pred_pose[..., :3, :3]
    trace = jnp.trace(rel, axis1=-2, axis2=-1)
    rot_err = jnp.degrees(jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)))
    return rot_err, trans_err


def registration_recall(pred_pose: Array, src_pts: Array, tgt_pts: Array,
                        tau: float = 0.09,
                        valid_mask: Array | None = None) -> tuple[Array, Array]:
    """Recall = sqrt(TP/N), precision = TP/N under inlier threshold tau.

    Matches the reference definition (:26-43), including its sqrt recall.
    src_pts/tgt_pts: [..., N, 3]; pred_pose [..., 4, 4]. `valid_mask` restricts
    to real (non-padded) correspondences.
    """
    R = pred_pose[..., :3, :3]
    t = pred_pose[..., :3, 3]
    src_tf = src_pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    d = jnp.linalg.norm(src_tf - tgt_pts, axis=-1)
    hit = (d < tau).astype(jnp.float32)
    if valid_mask is not None:
        hit = hit * valid_mask
        n = jnp.maximum(jnp.sum(valid_mask, axis=-1), 1.0)
    else:
        n = jnp.asarray(src_pts.shape[-2], dtype=jnp.float32)
    tp = jnp.sum(hit, axis=-1)
    precision = tp / n
    recall = jnp.sqrt(precision)
    return recall, precision


def f1_score(precision: Array, recall: Array) -> Array:
    return 2.0 * precision * recall / (precision + recall + 1e-6)


def summarize(rot_errs: np.ndarray, trans_errs: np.ndarray,
              recalls: np.ndarray, precisions: np.ndarray) -> dict:
    """Host-side averaging identical to the reference eval driver's report
    (/root/reference/src/eval_egnn_metrics.py:1283-1298)."""
    f1 = 2.0 * precisions * recalls / (precisions + recalls + 1e-6)
    return {
        "avg_rotation_error_deg": float(np.mean(rot_errs)),
        "avg_translation_error_cm": float(np.mean(trans_errs)),
        "avg_registration_recall": float(np.mean(recalls)),
        "avg_precision": float(np.mean(precisions)),
        "avg_f1": float(np.mean(f1)),
        "num_pairs": int(len(rot_errs)),
    }
