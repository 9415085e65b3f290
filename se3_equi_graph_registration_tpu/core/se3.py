"""SE(3) pose algebra as pure jnp functions.

TPU-native re-implementation of the reference's L0 layer
(/root/reference/datasets/ThreeDMatch.py:18-125, duplicated in
/root/reference/datasets/KITTI.py:19-126 and /root/reference/utils/SE3.py:5-112):
``rotation_matrix``, ``translation_matrix``, ``transform``, ``integrate_trans``,
``decompose_trans``, ``concatenate`` — here written once, batched, jit/vmap-safe,
and with explicit `jax.random` keys instead of global numpy RNG state.

All functions accept either single poses ``[4,4]`` / points ``[N,3]`` or batched
``[..., 4, 4]`` / ``[..., N, 3]`` via leading broadcast dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def integrate_trans(R: Array, t: Array) -> Array:
    """Assemble a 4x4 homogeneous transform from R [...,3,3] and t [...,3] or [...,3,1]."""
    if t.shape[-1] == 1:
        t = t[..., 0]
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # [...,3,4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def decompose_trans(trans: Array) -> tuple[Array, Array]:
    """Split a 4x4 transform into (R [...,3,3], t [...,3])."""
    return trans[..., :3, :3], trans[..., :3, 3]


def transform(pts: Array, trans: Array) -> Array:
    """Apply a homogeneous transform to points.

    pts: [..., N, 3]; trans: [..., 4, 4] (broadcastable). Returns [..., N, 3].
    """
    R, t = decompose_trans(trans)
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def concatenate(trans1: Array, trans2: Array) -> Array:
    """Compose two transforms: result = trans1 ∘ trans2 (apply trans2 first)."""
    return trans1 @ trans2


def inverse(trans: Array) -> Array:
    """Closed-form inverse of a rigid transform (R^T, -R^T t)."""
    R, t = decompose_trans(trans)
    Rt = jnp.swapaxes(R, -1, -2)
    return integrate_trans(Rt, -(Rt @ t[..., :, None])[..., 0])


def rotation_matrix(key: Array, num_axis: int, augment_rotation: float,
                    dtype=jnp.float32) -> Array:
    """Random rotation for augmentation.

    Mirrors the reference semantics (/root/reference/datasets/ThreeDMatch.py:18-42):
    - num_axis == 0: identity
    - num_axis == 1: rotation about ONE randomly chosen axis (x, y or z) by
      angle ~ U(0, 2π·augment_rotation)
    - num_axis == 3: Rx @ Ry @ Rz, the reference's composition order
      (/root/reference/utils/SE3.py:27-30).
    """
    if num_axis == 0:
        return jnp.eye(3, dtype=dtype)
    k_angle, k_axis = jax.random.split(key)
    angles = jax.random.uniform(k_angle, (3,), dtype=dtype) * (2.0 * jnp.pi * augment_rotation)

    def _axis_rot(angle, axis):
        c, s = jnp.cos(angle), jnp.sin(angle)
        o, z = jnp.ones_like(c), jnp.zeros_like(c)
        flat = {
            0: [o, z, z, z, c, -s, z, s, c],   # Rx
            1: [c, z, s, z, o, z, -s, z, c],   # Ry
            2: [c, -s, z, s, c, z, z, z, o],   # Rz
        }[axis]
        return jnp.stack(flat).reshape(3, 3).astype(dtype)

    if num_axis == 1:
        idx = jax.random.randint(k_axis, (), 0, 3)
        return jax.lax.switch(
            idx,
            [lambda a=a: _axis_rot(angles[a], a) for a in range(3)],
        )
    if num_axis == 3:
        return _axis_rot(angles[0], 0) @ _axis_rot(angles[1], 1) @ _axis_rot(angles[2], 2)
    raise ValueError(f"num_axis must be 0, 1 or 3, got {num_axis}")


def translation_matrix(key: Array, augment_translation: float,
                       dtype=jnp.float32) -> Array:
    """Random translation ~ U(0, 1) * augment_translation, shape [3] — the
    reference draws rand(3)·t, not a gaussian
    (/root/reference/datasets/ThreeDMatch.py:45-52)."""
    return jax.random.uniform(key, (3,), dtype=dtype) * augment_translation


def random_pose(key: Array, num_axis: int = 3, augment_rotation: float = 1.0,
                augment_translation: float = 0.5, dtype=jnp.float32) -> Array:
    """Random rigid transform [4,4] for augmentation / synthetic data."""
    k_r, k_t = jax.random.split(key)
    R = rotation_matrix(k_r, num_axis, augment_rotation, dtype)
    t = translation_matrix(k_t, augment_translation, dtype)
    return integrate_trans(R, t)


def rotation_geodesic_angle(R1: Array, R2: Array) -> Array:
    """Geodesic angle (radians) between two rotations [...,3,3]."""
    R = jnp.swapaxes(R1, -1, -2) @ R2
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))


def pose_error(gt_pose: Array, pred_pose: Array) -> tuple[Array, Array]:
    """(rotation error in degrees, translation error in centimetres).

    Matches /root/reference/tools/evaluation_metrics.py:14-24.
    """
    rot_err = jnp.degrees(
        rotation_geodesic_angle(gt_pose[..., :3, :3], pred_pose[..., :3, :3])
    )
    trans_err = jnp.linalg.norm(
        gt_pose[..., :3, 3] - pred_pose[..., :3, 3], axis=-1
    ) * 100.0
    return rot_err, trans_err


def skew(v: Array) -> Array:
    """Skew-symmetric matrix [...,3,3] of a vector [...,3]."""
    z = jnp.zeros_like(v[..., 0])
    rows = jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)
    return rows


def matrix_exp_so3(w: Array) -> Array:
    """Rodrigues exponential map: axis-angle vector [...,3] → rotation
    [...,3,3]. Branch-free inverse of `matrix_log_so3`; NaN-safe at θ→0
    (the sin θ/θ and (1−cos θ)/θ² coefficients switch to their Taylor
    limits through `where` on a guarded θ, so gradients stay finite).
    No reference analog — used by the point-to-plane ICP pose update
    (ops/icp.py)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def matrix_log_so3(R: Array) -> Array:
    """Branch-free matrix logarithm of rotations [...,3,3] → [...,3,3].

    Matches /root/reference/src/3dmatch_train_egnn_with_batch.py:542-560 semantics
    (returns 0 for near-identity) but uses `where` instead of boolean indexing.
    """
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    theta = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
    small = jnp.abs(theta) < 1e-6
    safe_theta = jnp.where(small, 1.0, theta)
    coef = safe_theta / (2.0 * jnp.sin(safe_theta))
    log_R = coef[..., None, None] * (R - jnp.swapaxes(R, -1, -2))
    return jnp.where(small[..., None, None], jnp.zeros_like(R), log_R)
