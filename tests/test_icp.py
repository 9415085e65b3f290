"""Tests for the jittable batched point-to-point ICP (ops/icp.py).

The reference ships no refinement stage (its eval head is a single weighted
solve, /root/reference/src/eval_egnn_metrics.py:594-827); users run open3d's
registration_icp afterwards. These tests pin the TPU-native equivalent:
NN re-association, robust trimming, convergence from a perturbed pose, and
composition through the eval step and the Registrar.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_equi_graph_registration_tpu.data.synthetic import random_rotation
from se3_equi_graph_registration_tpu.ops import icp


def _pose(rng, scale=0.5):
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * scale).astype(np.float32)
    return R, t


def _rot_angle_deg(Ra, Rb):
    # Frobenius small-angle metric (BASELINE.md: arccos amplifies fp noise)
    d = np.linalg.norm(Ra - Rb) / np.sqrt(2.0)
    return np.degrees(2.0 * np.arcsin(np.clip(d / 2.0, 0.0, 1.0)))


def _perturb(R, t, rng, deg=8.0, trans=0.1):
    axis = rng.standard_normal(3)
    axis /= np.linalg.norm(axis)
    a = np.radians(deg)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]], np.float32)
    dR = np.eye(3, dtype=np.float32) + np.sin(a) * K + (1 - np.cos(a)) * K @ K
    return (dR @ R).astype(np.float32), (t + rng.standard_normal(3).astype(np.float32) * trans)


def test_nearest_neighbor_exact(rng):
    q = rng.standard_normal((2, 64, 3)).astype(np.float32)
    p = rng.standard_normal((2, 96, 3)).astype(np.float32)
    idx, d2 = icp.nearest_neighbor(jnp.asarray(q), jnp.asarray(p))
    ref = np.linalg.norm(q[:, :, None, :] - p[:, None, :, :], axis=-1) ** 2
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(-1))
    np.testing.assert_allclose(np.asarray(d2), ref.min(-1), atol=1e-4)


def test_icp_converges_from_perturbed_pose(rng):
    """Same cloud under a GT pose, init off by ~8 deg / 10 cm: ICP recovers
    the pose to sub-0.1-deg / sub-mm (exact correspondences exist)."""
    src = rng.standard_normal((2, 256, 3)).astype(np.float32)
    poses = [_pose(rng) for _ in range(2)]
    tgt = np.stack([s @ R.T + t for s, (R, t) in zip(src, poses)])
    init = [_perturb(R, t, rng) for (R, t) in poses]
    R0 = jnp.asarray(np.stack([p[0] for p in init]))
    t0 = jnp.asarray(np.stack([p[1] for p in init]))

    R, t, w = jax.jit(lambda *a: icp.icp_refine(*a, iters=15))(
        jnp.asarray(src), jnp.asarray(tgt), R0, t0)
    for b, (Rg, tg) in enumerate(poses):
        assert _rot_angle_deg(np.asarray(R)[b], Rg) < 0.1
        assert np.linalg.norm(np.asarray(t)[b] - tg) < 1e-3
    assert np.all(np.isfinite(np.asarray(w)))


def test_icp_trimmed_partial_overlap(rng):
    """Target has 40% junk points far away; hard tau gate (trimmed ICP)
    still recovers the pose from the overlapping region."""
    src = rng.standard_normal((1, 200, 3)).astype(np.float32)
    R, t = _pose(rng)
    good = src[0] @ R.T + t
    junk = rng.standard_normal((133, 3)).astype(np.float32) * 30 + 50
    tgt = np.concatenate([good, junk])[None]
    R0, t0 = _perturb(R, t, rng, deg=5.0, trans=0.05)

    Rh, th, w = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                               jnp.asarray(R0[None]), jnp.asarray(t0[None]),
                               iters=15, tau=0.5)
    assert _rot_angle_deg(np.asarray(Rh)[0], R) < 0.1
    assert np.linalg.norm(np.asarray(th)[0] - t) < 1e-3


def test_icp_adaptive_kernel_with_outlier_sources(rng):
    """30% of SOURCE points have no true counterpart; the MAD-scaled Welsch
    weighting suppresses them without a hand-tuned radius."""
    src = rng.standard_normal((1, 200, 3)).astype(np.float32)
    R, t = _pose(rng)
    tgt = (src[0, :140] @ R.T + t)[None]  # only the first 140 have matches
    R0, t0 = _perturb(R, t, rng, deg=5.0, trans=0.05)

    Rh, th, w = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                               jnp.asarray(R0[None]), jnp.asarray(t0[None]),
                               iters=15, kernel="welsch")
    assert _rot_angle_deg(np.asarray(Rh)[0], R) < 0.5
    assert np.linalg.norm(np.asarray(th)[0] - t) < 5e-3


def test_icp_all_rejected_keeps_init_pose(rng):
    """Every NN distance beyond the gate -> all weights zero -> the refiner
    returns the INITIAL pose, not (I, 0)."""
    src = rng.standard_normal((1, 64, 3)).astype(np.float32)
    tgt = src + 100.0
    R0, t0 = _pose(rng)
    R, t, w = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                             jnp.asarray(R0[None]), jnp.asarray(t0[None]),
                             iters=3, tau=0.01)
    np.testing.assert_allclose(np.asarray(R)[0], R0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t)[0], t0, atol=1e-6)
    assert np.all(np.asarray(w) == 0)


def test_icp_rejects_unknown_kernel(rng):
    src = jnp.zeros((1, 8, 3))
    with pytest.raises(ValueError, match="unknown ICP kernel"):
        icp.icp_refine(src, src, jnp.eye(3)[None], jnp.zeros((1, 3)),
                       kernel="bogus")


def test_eval_step_with_icp_runs(rng):
    """EngineConfig.icp_iters composes through make_eval_step: metrics stay
    finite, and on synthetic pairs (where the head already lands in the
    right basin) ICP does not blow up the pose error."""
    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    from se3_equi_graph_registration_tpu.train import engine

    b, n, k, c = 2, 256, 8, 16
    pb = make_pair_batch(rng, batch=b, n=n, feat_dim=c, noise=0.005)
    batch = engine.batch_to_device((pb.corr, pb.labels, pb.src_pts,
                                    pb.tgt_pts, pb.src_feat, pb.tgt_feat,
                                    pb.gt_pose))
    cfg = engine.EngineConfig(num_nodes=n, k=k, in_node_nf=c, top_k=64,
                              icp_iters=4)
    model = engine.build_model(cfg, head_mode="eval_fusion")
    nbr = jnp.zeros((b, n, k), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["src_feat"], batch["src_pts"], nbr,
        batch["tgt_feat"], batch["tgt_pts"], nbr, batch["labels"])
    m = engine.make_eval_step(model, cfg)(params, batch)
    for key, v in m.items():
        assert np.all(np.isfinite(np.asarray(v))), key
