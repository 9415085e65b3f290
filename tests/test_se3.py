"""Property tests for core SE(3) pose algebra (reference L0 parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_equi_graph_registration_tpu.core import quaternions, se3


def test_integrate_decompose_roundtrip(rng):
    R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    t = rng.standard_normal(3)
    T = se3.integrate_trans(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
    R2, t2 = se3.decompose_trans(T)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)
    assert T.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(T[3]), [0, 0, 0, 1])


def test_transform_matches_manual(rng):
    pts = jnp.asarray(rng.standard_normal((10, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    T = se3.random_pose(key)
    out = se3.transform(pts, T)
    R, t = se3.decompose_trans(T)
    expected = np.asarray(pts) @ np.asarray(R).T + np.asarray(t)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_transform_batched(rng):
    pts = jnp.asarray(rng.standard_normal((4, 10, 3)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    Ts = jax.vmap(se3.random_pose)(keys)
    out = se3.transform(pts, Ts)
    for b in range(4):
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(se3.transform(pts[b], Ts[b])), atol=1e-5)


def test_inverse_composition():
    key = jax.random.PRNGKey(2)
    T = se3.random_pose(key)
    I = se3.concatenate(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)


def test_rotation_matrix_is_orthonormal():
    for num_axis in (0, 1, 3):
        R = se3.rotation_matrix(jax.random.PRNGKey(3), num_axis, 1.0)
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
        assert float(jnp.linalg.det(R)) == pytest.approx(1.0, abs=1e-5)


def test_pose_error_zero_for_identical():
    T = se3.random_pose(jax.random.PRNGKey(4))
    rot_err, trans_err = se3.pose_error(T, T)
    assert float(rot_err) == pytest.approx(0.0, abs=1e-3)
    assert float(trans_err) == pytest.approx(0.0, abs=1e-4)


def test_pose_error_known_angle():
    angle = np.deg2rad(30.0)
    R = np.array([[np.cos(angle), -np.sin(angle), 0],
                  [np.sin(angle), np.cos(angle), 0],
                  [0, 0, 1]], dtype=np.float32)
    T1 = jnp.eye(4)
    T2 = se3.integrate_trans(jnp.asarray(R), jnp.asarray([0.0, 0.0, 0.05]))
    rot_err, trans_err = se3.pose_error(T1, T2)
    assert float(rot_err) == pytest.approx(30.0, abs=1e-3)
    assert float(trans_err) == pytest.approx(5.0, abs=1e-3)  # cm


def test_quaternion_roundtrip(rng):
    # random rotations incl. near-180° cases the reference mishandles
    qs = rng.standard_normal((64, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    R = quaternions.quaternion_to_matrix(jnp.asarray(qs))
    q2 = np.asarray(quaternions.rotation_matrix_to_quaternion(R))
    # q and -q are the same rotation
    sign = np.sign(np.sum(q2 * qs, axis=1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, qs, atol=1e-4)


def test_quaternion_180deg_branches():
    # 180° rotations around each axis exercise the three non-trace branches
    for axis in range(3):
        R = -np.eye(3, dtype=np.float32)
        R[axis, axis] = 1.0
        q = quaternions.rotation_matrix_to_quaternion(jnp.asarray(R))
        R2 = quaternions.quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)


def test_matrix_log_so3():
    angle = 0.7
    R = np.array([[np.cos(angle), -np.sin(angle), 0],
                  [np.sin(angle), np.cos(angle), 0],
                  [0, 0, 1]], dtype=np.float32)
    logR = np.asarray(se3.matrix_log_so3(jnp.asarray(R)[None]))[0]
    np.testing.assert_allclose(logR[1, 0], angle, atol=1e-5)
    np.testing.assert_allclose(np.asarray(se3.matrix_log_so3(jnp.eye(3)[None]))[0],
                               np.zeros((3, 3)), atol=1e-7)
