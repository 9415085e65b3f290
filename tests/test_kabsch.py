"""Tests for the weighted Kabsch pose solve."""
import jax
import jax.numpy as jnp
import numpy as np

from se3_equi_graph_registration_tpu.data.synthetic import random_rotation
from se3_equi_graph_registration_tpu.ops import kabsch


def _random_pose(rng):
    R = random_rotation(rng).astype(np.float32)
    t = rng.standard_normal(3).astype(np.float32) * 0.5
    return R, t


def test_exact_recovery_uniform_weights(rng):
    src = rng.standard_normal((1, 100, 3)).astype(np.float32)
    R, t = _random_pose(rng)
    tgt = src @ R.T + t
    w = np.ones((1, 100), np.float32)
    R_hat, t_hat = kabsch.kabsch_weighted(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R_hat)[0], R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_hat)[0], t, atol=1e-4)


def test_outliers_zero_weight(rng):
    src = rng.standard_normal((1, 200, 3)).astype(np.float32)
    R, t = _random_pose(rng)
    tgt = src @ R.T + t
    tgt[0, 150:] = rng.standard_normal((50, 3)) * 10  # corrupt outliers
    w = np.ones((1, 200), np.float32)
    w[0, 150:] = 0.0
    R_hat, t_hat = kabsch.kabsch_weighted(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R_hat)[0], R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_hat)[0], t, atol=1e-4)


def test_empty_weights_identity():
    src = jnp.zeros((2, 10, 3))
    tgt = jnp.ones((2, 10, 3))
    w = jnp.zeros((2, 10))
    R, t = kabsch.kabsch_weighted(src, tgt, w)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.zeros((2, 3)), atol=1e-6)


def test_reflection_fix(rng):
    # degenerate planar points can induce det<0 without the fix
    src = rng.standard_normal((1, 50, 3)).astype(np.float32)
    src[0, :, 2] = 0.0
    R, t = _random_pose(rng)
    tgt = src @ R.T + t
    w = np.ones((1, 50), np.float32)
    R_hat, _ = kabsch.kabsch_weighted(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    assert float(jnp.linalg.det(R_hat[0])) > 0.99


def test_batched_and_differentiable(rng):
    src = rng.standard_normal((4, 64, 3)).astype(np.float32)
    Rs, ts, tgts = [], [], []
    for b in range(4):
        R, t = _random_pose(rng)
        Rs.append(R); ts.append(t)
        tgts.append(src[b] @ R.T + t)
    tgt = np.stack(tgts)
    w = np.ones((4, 64), np.float32)

    R_hat, t_hat = kabsch.kabsch_weighted(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    for b in range(4):
        np.testing.assert_allclose(np.asarray(R_hat)[b], Rs[b], atol=1e-4)

    # gradient flows through the SVD (reference backprops through Kabsch)
    def loss(s):
        R_, t_ = kabsch.kabsch_weighted(s, jnp.asarray(tgt), jnp.asarray(w))
        return jnp.sum((R_ - jnp.asarray(np.stack(Rs))) ** 2) + jnp.sum(t_ ** 2)

    g = jax.grad(loss)(jnp.asarray(src))
    assert np.all(np.isfinite(np.asarray(g)))


def test_masked_softmax():
    scores = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    mask = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    w = np.asarray(kabsch.masked_softmax(scores, mask))
    assert w[0, 1] == 0 and w[0, 3] == 0
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
    e = np.exp([1.0, 3.0])
    np.testing.assert_allclose(w[0, [0, 2]], e / e.sum(), atol=1e-6)
    # all-masked row → zeros, no NaN
    w2 = np.asarray(kabsch.masked_softmax(scores, jnp.zeros((1, 4))))
    np.testing.assert_allclose(w2, 0.0)


def test_kabsch_from_features_uses_labels(rng):
    src = rng.standard_normal((1, 100, 3)).astype(np.float32)
    R, t = _random_pose(rng)
    tgt = src @ R.T + t
    tgt[0, 60:] += 5.0  # corrupt the label-0 region
    labels = np.zeros((1, 100), np.float32)
    labels[0, :60] = 1.0
    feats = rng.standard_normal((1, 100, 8)).astype(np.float32)
    R_hat, t_hat = kabsch.kabsch_from_features(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(feats), jnp.asarray(feats),
        jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(R_hat)[0], R, atol=1e-3)


def test_irls_recovers_pose_under_outliers(rng):
    """40% corrupted correspondences with UNIFORM prior weights: the plain
    weighted solve is dragged off the pose; kabsch_irls recovers it (the
    robustness upgrade the reference's single-solve eval head lacks)."""
    src = rng.standard_normal((2, 200, 3)).astype(np.float32)
    R, t = _random_pose(rng)
    tgt = src @ R.T + t
    tgt[:, 120:] = rng.standard_normal((2, 80, 3)) * 5  # 40% outliers
    w = np.ones((2, 200), np.float32)

    R_plain, t_plain = kabsch.kabsch_weighted(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    assert np.abs(np.asarray(R_plain)[0] - R).max() > 0.05  # off the pose

    for kernel in ("geman", "cauchy", "huber"):
        R_hat, t_hat, w_hat = kabsch.kabsch_irls(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w), iters=5,
            kernel=kernel)
        np.testing.assert_allclose(np.asarray(R_hat)[0], R, atol=2e-3,
                                   err_msg=kernel)
        np.testing.assert_allclose(np.asarray(t_hat)[0], t, atol=2e-3,
                                   err_msg=kernel)
        # outliers got down-weighted relative to inliers
        w_hat = np.asarray(w_hat)
        assert w_hat[:, 120:].mean() < 0.1 * w_hat[:, :120].mean()


def test_irls_jit_and_degenerate(rng):
    """Fixed-length scan jits cleanly; all-zero weights degrade to (I, 0);
    unknown kernel raises."""
    src = rng.standard_normal((1, 64, 3)).astype(np.float32)
    f = jax.jit(lambda s, tg, w: kabsch.kabsch_irls(s, tg, w, iters=3))
    R, t, _ = f(jnp.asarray(src), jnp.asarray(src + 0.1),
                jnp.zeros((1, 64), jnp.float32))
    np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t)[0], 0.0, atol=1e-6)
    import pytest
    with pytest.raises(ValueError, match="IRLS kernel"):
        kabsch.kabsch_irls(src, src, np.ones((1, 64), np.float32),
                           kernel="nope")
