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


def test_matrix_exp_so3_roundtrip(rng):
    """exp is the inverse of the log map (core/se3), exact rotations come
    out orthonormal, and theta -> 0 is NaN-free including gradients."""
    from se3_equi_graph_registration_tpu.core import se3

    w = rng.standard_normal((8, 3)).astype(np.float32)
    R = se3.matrix_exp_so3(jnp.asarray(w))
    RtR = np.einsum("bij,bik->bjk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (8, 3, 3)),
                               atol=1e-5)
    # log(exp(w)) recovers the skew of w (angles drawn well below pi)
    w_small = 0.3 * w / np.linalg.norm(w, axis=-1, keepdims=True)
    logR = se3.matrix_log_so3(se3.matrix_exp_so3(jnp.asarray(w_small)))
    K = np.asarray(se3.skew(jnp.asarray(w_small)))
    np.testing.assert_allclose(np.asarray(logR), K, atol=1e-5)

    # zero vector: identity, finite gradient
    z = jnp.zeros((3,))
    np.testing.assert_allclose(np.asarray(se3.matrix_exp_so3(z)), np.eye(3),
                               atol=1e-7)
    g = jax.grad(lambda v: jnp.sum(se3.matrix_exp_so3(v)))(z)
    assert np.all(np.isfinite(np.asarray(g)))


def test_estimate_normals_plane(rng):
    """Points on a tilted noisy plane: every PCA normal aligns with the
    plane normal (up to sign)."""
    n_true = np.array([1.0, 2.0, -0.5])
    n_true /= np.linalg.norm(n_true)
    basis = np.linalg.qr(rng.standard_normal((3, 3)))[0]
    u, v = basis[:, 0], basis[:, 1] - basis[:, 1].dot(n_true) * n_true
    u = u - u.dot(n_true) * n_true
    u /= np.linalg.norm(u)
    v /= np.linalg.norm(v)
    ab = rng.uniform(-1, 1, (2, 400, 2)).astype(np.float32)
    pts = (ab[..., :1] * u + ab[..., 1:] * v
           + rng.standard_normal((2, 400, 3)) * 1e-3).astype(np.float32)

    nrm = np.asarray(icp.estimate_normals(jnp.asarray(pts), k=12))
    align = np.abs(nrm @ n_true)
    assert align.min() > 0.99, align.min()
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)

    # degenerate: all-identical points stay finite and unit
    same = np.zeros((1, 32, 3), np.float32)
    nd = np.asarray(icp.estimate_normals(jnp.asarray(same), k=8))
    assert np.all(np.isfinite(nd))
    np.testing.assert_allclose(np.linalg.norm(nd, axis=-1), 1.0, atol=1e-5)


def _surface_points(rng, n):
    # height field z = 0.5 sin(2x) cos(2y): normal variation in every
    # direction, so all 6 pose DOF are observable (a sphere would leave
    # rotation about its center unconstrained)
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    z = 0.5 * np.sin(2.0 * xy[:, 0]) * np.cos(2.0 * xy[:, 1])
    return np.concatenate([xy, z[:, None]], -1).astype(np.float32)


def test_icp_plane_mode_differently_sampled_surface(rng):
    """The scan-matching regime: src and tgt sample the SAME surface at
    DIFFERENT points, so no exact counterparts exist. Plane mode lands well
    inside the sampling density (measured 0.02 deg / 0.2 mm); point mode
    stalls an order of magnitude coarser on the identical problem — the
    classic reason point-to-plane exists."""
    src = _surface_points(rng, 512)[None]
    R, t = _pose(rng, scale=0.1)
    tgt = (_surface_points(rng, 512) @ R.T + t)[None]
    R0, t0 = _perturb(R, t, rng, deg=6.0, trans=0.05)

    Rp, tp, _ = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                               jnp.asarray(R0[None]), jnp.asarray(t0[None]),
                               iters=20, mode="plane", normals_k=12)
    rot_p = _rot_angle_deg(np.asarray(Rp)[0], R)
    trans_p = np.linalg.norm(np.asarray(tp)[0] - t)
    assert rot_p < 0.2, rot_p
    assert trans_p < 2e-3, trans_p

    Rq, tq, _ = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                               jnp.asarray(R0[None]), jnp.asarray(t0[None]),
                               iters=20, mode="point")
    trans_q = np.linalg.norm(np.asarray(tq)[0] - t)
    assert trans_p < trans_q / 5, (trans_p, trans_q)


def test_icp_plane_all_rejected_keeps_pose(rng):
    src = _surface_points(rng, 64)[None]
    tgt = src + 50.0
    R0, t0 = _pose(rng)
    R, t, w = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                             jnp.asarray(R0[None]), jnp.asarray(t0[None]),
                             iters=3, tau=0.01, mode="plane")
    np.testing.assert_allclose(np.asarray(R)[0], R0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t)[0], t0, atol=1e-5)
    assert np.all(np.asarray(w) == 0)


def test_icp_rejects_unknown_mode(rng):
    src = jnp.zeros((1, 8, 3))
    with pytest.raises(ValueError, match="unknown ICP mode"):
        icp.icp_refine(src, src, jnp.eye(3)[None], jnp.zeros((1, 3)),
                       mode="bogus")


def test_icp_auto_trim_estimates_overlap(rng):
    """trim='auto' (Chetverikov TrICP objective over all sorted-residual
    prefixes) recovers the pose at ~50% overlap without being told the
    fraction — and stays harmless at full overlap."""
    src = _surface_points(rng, 400)[None]
    R, t = _pose(rng, scale=0.1)
    # target covers only the x > 0 half: ~half the source has no counterpart
    half = src[0][src[0, :, 0] > 0]
    tgt = (half @ R.T + t)[None]
    R0, t0 = _perturb(R, t, rng, deg=5.0, trans=0.05)

    Rh, th, w = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                               jnp.asarray(R0[None]), jnp.asarray(t0[None]),
                               iters=20, trim="auto", mode="point")
    assert _rot_angle_deg(np.asarray(Rh)[0], R) < 0.5
    assert np.linalg.norm(np.asarray(th)[0] - t) < 5e-3
    # the estimated inlier set is roughly the overlapping half
    frac = float(np.asarray(w).sum()) / src.shape[1]
    assert 0.25 < frac < 0.75, frac

    # full overlap: auto-trim keeps most points and converges tightly
    tgt2 = (src[0] @ R.T + t)[None]
    R2, t2, w2 = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt2),
                                jnp.asarray(R0[None]), jnp.asarray(t0[None]),
                                iters=15, trim="auto", mode="point")
    assert _rot_angle_deg(np.asarray(R2)[0], R) < 0.1

    with pytest.raises(ValueError, match="trim"):
        icp.icp_refine(src, src, jnp.eye(3)[None], jnp.zeros((1, 3)),
                       trim="bogus")


def test_icp_gicp_mode_differently_sampled_surface(rng):
    """Generalized ICP (plane-to-plane Mahalanobis): converges on
    differently-sampled surfaces like plane mode (measured 0.009 deg vs
    point mode's 0.43 deg stall on the same problem), and the covariance
    helper returns plane-shaped PSD matrices."""
    src = _surface_points(rng, 512)[None]
    R, t = _pose(rng, scale=0.1)
    tgt = (_surface_points(rng, 512) @ R.T + t)[None]
    R0, t0 = _perturb(R, t, rng, deg=6.0, trans=0.05)

    Rh, th, _ = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                               jnp.asarray(R0[None]), jnp.asarray(t0[None]),
                               iters=20, mode="gicp", normals_k=12)
    assert _rot_angle_deg(np.asarray(Rh)[0], R) < 0.2
    assert np.linalg.norm(np.asarray(th)[0] - t) < 2e-3

    C = np.asarray(icp.point_covariances(jnp.asarray(src), k=12))
    assert C.shape == (1, 512, 3, 3)
    np.testing.assert_allclose(C, np.swapaxes(C, -1, -2), atol=1e-5)
    ev = np.linalg.eigvalsh(C.reshape(-1, 3, 3))
    np.testing.assert_allclose(ev[:, 2], 1.0, atol=1e-4)   # surface dirs
    np.testing.assert_allclose(ev[:, 0], 1e-3, atol=1e-4)  # normal dir


def test_icp_gicp_all_rejected_keeps_pose(rng):
    src = _surface_points(rng, 64)[None]
    tgt = src + 50.0
    R0, t0 = _pose(rng)
    R, t, w = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                             jnp.asarray(R0[None]), jnp.asarray(t0[None]),
                             iters=3, tau=0.01, mode="gicp")
    np.testing.assert_allclose(np.asarray(R)[0], R0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t)[0], t0, atol=1e-5)
    assert np.all(np.asarray(w) == 0)


def test_icp_symmetric_mode_differently_sampled_surface(rng):
    """Rusinkiewicz's symmetric objective (combined source+target normals):
    converges on differently-sampled surfaces at the same sub-0.1-deg /
    sub-mm level as plane mode (measured 0.01-0.05 deg across seeds), and
    from a 20-deg-off init in the same fixed iteration budget."""
    src = _surface_points(rng, 512)[None]
    R, t = _pose(rng, scale=0.1)
    tgt = (_surface_points(rng, 512) @ R.T + t)[None]

    for deg, iters in ((6.0, 20), (20.0, 30)):
        R0, t0 = _perturb(R, t, rng, deg=deg, trans=0.05)
        Rs, ts, _ = icp.icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                                   jnp.asarray(R0[None]),
                                   jnp.asarray(t0[None]),
                                   iters=iters, mode="symmetric",
                                   normals_k=12)
        rot_s = _rot_angle_deg(np.asarray(Rs)[0], R)
        trans_s = np.linalg.norm(np.asarray(ts)[0] - t)
        assert rot_s < 0.2, (deg, rot_s)
        assert trans_s < 2e-3, (deg, trans_s)


def test_icp_symmetric_invariant_to_normal_signs(rng):
    """PCA normals are unoriented; the per-pair sign alignment makes the
    symmetric solve exactly invariant to independent sign flips of either
    precomputed normal field (the combined normal flips as a unit, and the
    Gauss-Newton system is quadratic in it)."""
    src = _surface_points(rng, 256)[None]
    R, t = _pose(rng, scale=0.1)
    tgt = (_surface_points(rng, 256) @ R.T + t)[None]
    R0, t0 = _perturb(R, t, rng, deg=5.0, trans=0.04)

    n_src = icp.estimate_normals(jnp.asarray(src), k=12)
    n_tgt = icp.estimate_normals(jnp.asarray(tgt), k=12)
    flip_s = jnp.asarray(rng.choice([-1.0, 1.0], size=(1, 256, 1))
                         .astype(np.float32))
    flip_t = jnp.asarray(rng.choice([-1.0, 1.0], size=(1, 256, 1))
                         .astype(np.float32))

    args = (jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(R0[None]),
            jnp.asarray(t0[None]))
    Ra, ta, _ = icp.icp_refine(*args, iters=8, mode="symmetric",
                               src_normals=n_src, tgt_normals=n_tgt)
    Rb, tb, _ = icp.icp_refine(*args, iters=8, mode="symmetric",
                               src_normals=n_src * flip_s,
                               tgt_normals=n_tgt * flip_t)
    np.testing.assert_allclose(np.asarray(Ra), np.asarray(Rb),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ta), np.asarray(tb),
                               rtol=0, atol=1e-5)


def test_point_covariances_reuse_normals(rng):
    """point_covariances is a rank-one shaping of the PCA normal field:
    passing a precomputed `normals` must reproduce the from-scratch result
    (same k), letting callers skip the duplicate k-NN/PCA pass."""
    src = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    src[:, 2] = 0.1 * src[:, 0] * src[:, 1]
    n = icp.estimate_normals(jnp.asarray(src), k=12)
    C_direct = np.asarray(icp.point_covariances(jnp.asarray(src), k=12))
    C_reused = np.asarray(icp.point_covariances(jnp.asarray(src), normals=n))
    np.testing.assert_allclose(C_direct, C_reused, atol=1e-6)


def test_icp_plane_gn_step_guard_keeps_finite(rng):
    """Degenerate plane-mode system: every target normal identical (the
    weighted 6x6 is rank-deficient, damped only by the ~1e-8-scale Tikhonov
    term) and a far-off start. The unguarded GN solve emits a ~1/damp
    near-null-space step; one such step overflows the fp32 positions, the
    next NN pass reads inf, and every later iteration is NaN (observed on
    TPU with a junk branch pose under verified multi-branch selection —
    ops/icp._guard_step docstring). The guard must keep every iterate
    finite, with rotation/translation steps inside the trust region."""
    n = 256
    src = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    src[:, 2] = 0.0
    tgt = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    tgt[:, 2] = 0.0
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    R0 = np.eye(3, dtype=np.float32)
    t0 = np.array([50.0, -30.0, 20.0], np.float32)   # far-off junk start

    for iters in (1, 5, 20):
        R, t, w = icp.icp_refine(jnp.asarray(src)[None], jnp.asarray(tgt)[None],
                                 jnp.asarray(R0)[None], jnp.asarray(t0)[None],
                                 iters=iters, mode="plane", trim=0.35,
                                 tgt_normals=jnp.asarray(normals)[None])
        assert np.isfinite(np.asarray(R)).all(), iters
        assert np.isfinite(np.asarray(t)).all(), iters
        # the translation can move at most ~iters * trust radius
        assert np.linalg.norm(np.asarray(t)) < np.linalg.norm(t0) + iters * 8.0
