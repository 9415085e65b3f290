"""Quaternion <-> rotation-matrix conversions, batched and branch-free.

Capability parity with /root/reference/src/3dmatch_train_egnn_with_batch.py:420-539
(`rotation_matrix_to_quaternion_batch`, `quaternion_to_matrix`) — but implemented
with `where`-selected Shepperd branches so they vmap/jit cleanly on TPU, and with
ALL four branches correct (the reference's `rotation_matrix_to_quaternion` only
handles trace>0, noted in SURVEY.md §7 as a defect not to replicate).

Quaternion convention: (w, x, y, z) scalar-first, matching the reference's
`rotation_matrix_to_quaternion_batch` output.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rotation_matrix_to_quaternion(R: Array) -> Array:
    """Rotation matrices [...,3,3] → unit quaternions [...,4] (w,x,y,z).

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select by the largest of (trace, R00, R11, R22).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Branch 0: trace dominant
    s0 = _safe_sqrt(trace + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # Branch 1: m00 dominant
    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # Branch 2: m11 dominant
    s2 = _safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # Branch 3: m22 dominant
    s3 = _safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    cond0 = (trace > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_matrix(q: Array, scalar_first: bool = True) -> Array:
    """Unit quaternions [...,4] → rotation matrices [...,3,3].

    `scalar_first=True` expects (w,x,y,z); False expects (x,y,z,w) as the
    reference's `quaternion_to_matrix` does
    (/root/reference/src/3dmatch_train_egnn_with_batch.py:499-539).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    if scalar_first:
        qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    else:
        qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (qy ** 2 + qz ** 2)
    r01 = 2 * (qx * qy - qz * qw)
    r02 = 2 * (qx * qz + qy * qw)
    r10 = 2 * (qx * qy + qz * qw)
    r11 = 1 - 2 * (qx ** 2 + qz ** 2)
    r12 = 2 * (qy * qz - qx * qw)
    r20 = 2 * (qx * qz - qy * qw)
    r21 = 2 * (qy * qz + qx * qw)
    r22 = 1 - 2 * (qx ** 2 + qy ** 2)
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def center_and_normalize(src_pts: Array, tar_pts: Array) -> tuple[Array, Array]:
    """Center point sets at origin and scale rows to unit norm.

    Parity with /root/reference/src/3dmatch_train_egnn_with_batch.py:563-582.
    src_pts/tar_pts: [B, N, 3].
    """
    src_c = src_pts - src_pts.mean(axis=-2, keepdims=True)
    tar_c = tar_pts - tar_pts.mean(axis=-2, keepdims=True)
    src_n = src_c / jnp.linalg.norm(src_c, axis=-1, keepdims=True)
    tar_n = tar_c / jnp.linalg.norm(tar_c, axis=-1, keepdims=True)
    return src_n, tar_n
