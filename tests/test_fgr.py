"""Fast Global Registration (ops/fgr.py) — graduated non-convexity coarse
stage. The reference has no robust solver; this is the TPU-native recast of
the open3d `registration_fgr_based_on_feature_matching` capability
(fixed-shape tuple test + annealed Geman-McClure line process)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se3_equi_graph_registration_tpu.data.synthetic import random_rotation
from se3_equi_graph_registration_tpu.ops.fgr import fgr_pose, tuple_test


def _rot_deg(Ra, Rb):
    d = np.linalg.norm(Ra - Rb) / np.sqrt(2.0)
    return np.degrees(2.0 * np.arcsin(np.clip(d / 2.0, 0.0, 1.0)))


@pytest.fixture(scope="module")
def bumpy_surface():
    """Gaussian-bump height field (locally distinctive geometry — same
    construction as tests/test_global_registration.py's fixture)."""
    rng = np.random.default_rng(0)
    centers = rng.uniform(-1.6, 1.6, (30, 2))
    amps = rng.uniform(-0.35, 0.35, 30)
    widths = rng.uniform(0.08, 0.3, 30)

    def surf(rng2, n, x0, x1):
        xy = np.stack([rng2.uniform(x0, x1, n), rng2.uniform(-1, 1, n)], -1)
        z = np.zeros(n)
        for (cx, cy), a, w in zip(centers, amps, widths):
            z += a * np.exp(-((xy[:, 0] - cx) ** 2 + (xy[:, 1] - cy) ** 2) / w)
        pts = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
        return pts + rng2.standard_normal(pts.shape).astype(np.float32) * 0.002

    return surf


def _corrupted_pair(rng, n=400, inliers=120, noise=0.0):
    src = rng.standard_normal((n, 3)).astype(np.float32)
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * 0.3).astype(np.float32)
    tgt = src @ R.T + t
    if noise:
        tgt += rng.standard_normal(tgt.shape).astype(np.float32) * noise
    tgt[inliers:] = rng.standard_normal((n - inliers, 3)).astype(np.float32) * 2
    return src, tgt, R, t


def test_fgr_pose_low_inlier_recovery(rng):
    """30% inliers, uniform prior: the tuple test prunes most junk and the
    GNC anneal locks onto the inlier consensus — no all-inlier minimal
    sample needed (RANSAC's requirement), no single-shot eigenvector
    commitment (spectral's failure mode)."""
    src, tgt, R, t = _corrupted_pair(np.random.default_rng(0))
    scores = np.ones(400, np.float32)

    Rh, th, w = fgr_pose(jnp.asarray(src), jnp.asarray(tgt),
                         jnp.asarray(scores), jax.random.PRNGKey(0),
                         top_m=400, delta=0.05)
    assert _rot_deg(np.asarray(Rh), R) < 0.5
    assert np.linalg.norm(np.asarray(th) - t) < 5e-3
    w = np.asarray(w)
    # the final line process concentrates on true inliers: a tuple-covered
    # true inlier carries full weight (r ~ 0 -> l ~ 1) while junk is crushed
    # by (mu/(mu+r^2))^2. Coverage is probabilistic — an inlier row is kept
    # only if some sampled triplet pairs it with two other inliers
    # (P(miss) ~ (1-p^2)^(3T/M) ~ 0.5 at p=0.3) — so assert on the covered
    # fraction, not on every row.
    assert (w[:120] > 0.9).mean() > 0.35
    assert w[120:].max() < 0.1


def test_fgr_pose_noisy_inliers(rng):
    """5 mm inlier noise at 50% inliers: the delta floor keeps noisy inliers
    weighted while still rejecting the junk."""
    src, tgt, R, t = _corrupted_pair(np.random.default_rng(3), inliers=200,
                                     noise=0.005)
    scores = np.ones(400, np.float32)
    Rh, th, _ = fgr_pose(jnp.asarray(src), jnp.asarray(tgt),
                         jnp.asarray(scores), jax.random.PRNGKey(1),
                         top_m=400, delta=0.05)
    assert _rot_deg(np.asarray(Rh), R) < 0.5
    assert np.linalg.norm(np.asarray(th) - t) < 1e-2


def test_tuple_test_filters_length_violations(rng):
    """Inlier rows (rigid-consistent) are kept, junk rows participate in no
    length-preserving triplet; the no-pass fallback returns all ones."""
    src, tgt, _, _ = _corrupted_pair(np.random.default_rng(1), n=200,
                                     inliers=80)
    mask = np.asarray(tuple_test(jnp.asarray(src), jnp.asarray(tgt),
                                 jax.random.PRNGKey(0), tuples=2048))
    assert mask[:80].mean() > 0.8          # inliers overwhelmingly kept
    assert mask[80:].mean() < 0.2          # junk overwhelmingly dropped

    # all-junk pairs: no triplet passes -> all-ones fallback, not empty
    r2 = np.random.default_rng(2)
    a = r2.standard_normal((64, 3)).astype(np.float32)
    b = r2.standard_normal((64, 3)).astype(np.float32) * 5
    mask2 = np.asarray(tuple_test(jnp.asarray(a), jnp.asarray(b),
                                  jax.random.PRNGKey(0), tuples=64,
                                  scale=0.999))
    assert mask2.min() == 1.0


def test_register_fpfh_coarse_fgr(bumpy_surface):
    """End-to-end through registration.register_fpfh with coarse='fgr' on
    independently-sampled surfaces (full overlap)."""
    from se3_equi_graph_registration_tpu.registration import register_fpfh

    rng = np.random.default_rng(4)
    src = bumpy_surface(rng, 1024, -1.0, 1.0)
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * 0.3).astype(np.float32)
    tgt = bumpy_surface(rng, 1024, -1.0, 1.0) @ R.T + t

    Rh, th, info = register_fpfh(src, tgt, n_points=1024, coarse="fgr")
    assert _rot_deg(Rh, R) < 0.5
    assert np.linalg.norm(th - t) < 5e-3
    assert np.all(np.isfinite(info["pose_covariance"]))


def test_fgr_auto_schedule_covers_large_diameter(rng):
    """Regression: the fixed classic schedule (1.4 every 4 steps, 48 iters)
    anneals mu by only ~57x — on a large-diameter cloud mu never approaches
    the delta^2 floor, so near-miss outliers keep O(1) Geman-McClure weight
    and the pose is dragged off. The default data-sized geometric schedule
    must reach the floor for ANY diameter within the same fixed scan."""
    src, tgt, R, t = _corrupted_pair(np.random.default_rng(3), noise=0.0)
    src, tgt, t = src * 30.0, tgt * 30.0, t * 30.0   # D/delta ~ 2300
    scores = np.ones(len(src), np.float32)

    Rh, th, _ = fgr_pose(jnp.asarray(src), jnp.asarray(tgt),
                         jnp.asarray(scores), jax.random.PRNGKey(0),
                         top_m=400, tuples=2048, delta=0.09)
    assert _rot_deg(np.asarray(Rh), R) < 1.0
    np.testing.assert_allclose(np.asarray(th), t, atol=0.5)

    # the classic explicit schedule stays available (and on a unit-scale
    # problem, where 57x covers D/delta, it still converges)
    src2, tgt2, R2, t2 = _corrupted_pair(np.random.default_rng(4))
    Rc, tc, _ = fgr_pose(jnp.asarray(src2), jnp.asarray(tgt2),
                         jnp.asarray(np.ones(len(src2), np.float32)),
                         jax.random.PRNGKey(0), top_m=400, tuples=2048,
                         div_factor=1.4, anneal_every=4, delta=0.09)
    assert _rot_deg(np.asarray(Rc), R2) < 1.0


def test_anneal_every_without_div_factor_raises(rng):
    """ADVICE r3: under the data-sized auto schedule (div_factor=None) an
    explicit anneal_every was silently ignored; it must fail loudly."""
    src = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    scores = jnp.ones(64)
    with pytest.raises(ValueError, match="anneal_every"):
        fgr_pose(src, src, scores, jax.random.PRNGKey(0), top_m=32,
                 anneal_every=4)
