"""Checkpoint-free classic global registration (registration.py).

Pins the FPFH -> mutual matching -> spectral -> IRLS -> ICP pipeline the
reference's users currently assemble from open3d
(/root/reference/data_preprocess/process_kitti.py:21-38 uses open3d only
for this descriptor stage) — here composed entirely from the framework's
TPU-native ops and jitted as one program.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from se3_equi_graph_registration_tpu.data.synthetic import random_rotation
from se3_equi_graph_registration_tpu.registration import (match_features,
                                                          register_fpfh)


def _rot_deg(Ra, Rb):
    d = np.linalg.norm(Ra - Rb) / np.sqrt(2.0)
    return np.degrees(2.0 * np.arcsin(np.clip(d / 2.0, 0.0, 1.0)))


@pytest.fixture(scope="module")
def bumpy():
    """Gaussian-bump height field: locally DISTINCTIVE geometry (a periodic
    sin/cos surface is self-similar, which makes partial-overlap matching
    genuinely ill-posed for any geometry-only method)."""
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


def test_match_features_mutual_consistency(rng):
    a = rng.standard_normal((64, 16)).astype(np.float32)
    # target = permuted copy: every match must be found and mutual
    perm = rng.permutation(64)
    j, mutual, dist = match_features(jnp.asarray(a), jnp.asarray(a[perm]))
    np.testing.assert_array_equal(np.asarray(j), np.argsort(perm))
    assert np.all(np.asarray(mutual))
    # identical descriptors: distance is pure fp cancellation noise of the
    # |a|^2 - 2ab + |b|^2 expansion (~sqrt(eps) on unit-scale features)
    np.testing.assert_allclose(np.asarray(dist), 0.0, atol=1e-2)


def test_register_fpfh_independent_sampling(bumpy):
    """Full overlap, src and tgt sample the surface at DIFFERENT points —
    the regime with no exact counterparts. Default knobs recover sub-0.5-deg
    / sub-0.5-cm (measured 0.13 deg / 0.06 cm)."""
    rng = np.random.default_rng(3)
    src = bumpy(rng, 1024, -1.0, 1.0)
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * 0.3).astype(np.float32)
    tgt = bumpy(rng, 1024, -1.0, 1.0) @ R.T + t

    Rh, th, info = register_fpfh(src, tgt, n_points=1024)
    assert _rot_deg(Rh, R) < 0.5
    assert np.linalg.norm(th - t) < 5e-3
    assert info["pose_covariance"].shape == (6, 6)
    assert np.all(np.isfinite(info["pose_covariance"]))


def test_register_fpfh_window_method(bumpy):
    """knn_method='window' (Hilbert-window candidates + banded-MXU SPFH
    accumulation): same pose as the default path, and the per-point weights
    come back in ORIGINAL point order (the pipeline runs in curve-sorted
    space — a missing unsort would scramble them against the approx run)."""
    rng = np.random.default_rng(3)
    src = bumpy(rng, 1024, -1.0, 1.0)
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * 0.3).astype(np.float32)
    tgt = bumpy(rng, 1024, -1.0, 1.0) @ R.T + t

    Rw, tw, info_w = register_fpfh(src, tgt, n_points=1024,
                                   knn_method="window", window=512)
    assert _rot_deg(Rw, R) < 0.5
    assert np.linalg.norm(tw - t) < 5e-3
    # weights must come back in ORIGINAL point order: permuting the input
    # rows must permute the weights identically (the curve-sorted space is
    # the same either way, so a missing unsort would return IDENTICAL
    # vectors for both calls instead). Quantized-code sort ties can swap a
    # few window sets between the two orderings — demand 99% agreement.
    p = np.random.default_rng(7).permutation(len(src))
    _, _, info_p = register_fpfh(src[p], tgt, n_points=1024,
                                 knn_method="window", window=512)
    # map both weight vectors back to original src rows via 'indices'
    w_by_row = np.zeros(len(src)); w_by_row[info_w["indices"]] = info_w["weights"]
    wp_by_row = np.zeros(len(src)); wp_by_row[p[info_p["indices"]]] = info_p["weights"]
    close = np.isclose(wp_by_row, w_by_row, rtol=1e-3, atol=1e-5)
    assert close.mean() > 0.99, close.mean()
    ww = info_w["weights"]
    # and they should still track the unsorted-space (approx) run loosely
    _, _, info_a = register_fpfh(src, tgt, n_points=1024,
                                 knn_method="approx")
    assert np.corrcoef(info_a["weights"], ww)[0, 1] > 0.5

    with pytest.raises(ValueError, match="multiples of"):
        register_fpfh(src, tgt, n_points=1000, knn_method="window")

    # 'fused' = same window structure through the Pallas kernels (knn sweeps
    # + SPFH Darboux/histogram; interpret mode on CPU): same pose
    Rf, tf, _ = register_fpfh(src, tgt, n_points=1024,
                              knn_method="fused", window=512)
    assert _rot_deg(Rf, R) < 0.5
    assert np.linalg.norm(tf - t) < 5e-3


def test_register_fpfh_partial_overlap_trimmed(bumpy):
    """40% overlap: MOST source points have no counterpart — only ~1-2% of
    putative matches are geometrically correct, and the MAD scale inside
    plain ICP is corrupted. The default RANSAC coarse stage + overlap-
    fraction trimming (icp_trim) recovers the pose on BOTH coarse stages'
    worst-case draws (the single-shot spectral eigenvector fails this regime
    5/5 seeds — ops/ransac.py's reason to exist; the frame-dependent
    'viewpoint' normal orientation produced ZERO correct matches here, which
    is why the pipeline uses orient='local')."""
    rng = np.random.default_rng(0)
    src = bumpy(rng, 1024, -1.0, 1.0)
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * 0.3).astype(np.float32)
    tgt = bumpy(rng, 1024, 0.2, 2.2) @ R.T + t   # overlap x in [0.2, 1.0]

    Rh, th, _ = register_fpfh(src, tgt, n_points=1024, top_m=256,
                              icp_trim=0.35, icp_iters=20)
    assert _rot_deg(Rh, R) < 1.0, _rot_deg(Rh, R)
    assert np.linalg.norm(th - t) < 1.5e-2

    # spectral coarse stage also holds on THIS draw (its success case;
    # pinned so both code paths stay covered)
    Rs, ts, _ = register_fpfh(src, tgt, n_points=1024, top_m=256,
                              icp_trim=0.35, icp_iters=20, coarse="spectral")
    assert _rot_deg(Rs, R) < 1.0, _rot_deg(Rs, R)

    with pytest.raises(ValueError, match="unknown coarse"):
        register_fpfh(src, tgt, n_points=1024, coarse="bogus")


def test_ransac_pose_low_inlier_recovery(rng):
    """ops/ransac.py standalone: 20% inliers in the putative set — the
    batched minimal-sample vote finds the pose (P(all-inlier triplet in
    1024 draws) > 99.9% at uniform sampling) and the inlier mask is clean."""
    from se3_equi_graph_registration_tpu.ops.ransac import ransac_pose
    import jax

    n = 400
    src = rng.standard_normal((n, 3)).astype(np.float32)
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * 0.3).astype(np.float32)
    tgt = src @ R.T + t
    tgt[80:] = rng.standard_normal((n - 80, 3)).astype(np.float32) * 2  # 80% junk
    scores = np.ones(n, np.float32)

    Rh, th, w = ransac_pose(jnp.asarray(src), jnp.asarray(tgt),
                            jnp.asarray(scores), jax.random.PRNGKey(0),
                            hypotheses=1024, top_m=400, inlier_tau=0.05)
    assert _rot_deg(np.asarray(Rh), R) < 0.5
    assert np.linalg.norm(np.asarray(th) - t) < 5e-3
    w = np.asarray(w)
    assert w[:80].sum() >= 70          # finds nearly all true inliers
    assert w[80:].sum() <= 5           # and nearly no junk


def test_ransac_pose_branches_contains_truth(rng):
    """ops/ransac.ransac_pose_branches: construct a candidate set where a
    CONSISTENT wrong-match cluster outvotes the true cluster (60 junk pairs
    related by a second rigid motion vs 40 true pairs) — the single-winner
    vote picks the junk pose, but the branch stack must contain BOTH basins
    so downstream verified selection can recover (registration.py picks by
    trimmed surface residual after refining each branch)."""
    import jax

    from se3_equi_graph_registration_tpu.ops.ransac import (
        ransac_pose, ransac_pose_branches)

    n = 400
    src = rng.standard_normal((n, 3)).astype(np.float32)
    R_true = random_rotation(rng).astype(np.float32)
    t_true = (rng.standard_normal(3) * 0.3).astype(np.float32)
    R_junk = random_rotation(rng).astype(np.float32)
    t_junk = (rng.standard_normal(3) * 0.3).astype(np.float32)
    tgt = src @ R_true.T + t_true
    tgt[80:200] = src[80:200] @ R_junk.T + t_junk       # bigger junk cluster
    tgt[200:] = rng.standard_normal((n - 200, 3)).astype(np.float32) * 2
    scores = np.ones(n, np.float32)

    kw = dict(hypotheses=1024, top_m=400, inlier_tau=0.05)
    Rh, th, _ = ransac_pose(jnp.asarray(src), jnp.asarray(tgt),
                            jnp.asarray(scores), jax.random.PRNGKey(0), **kw)
    assert _rot_deg(np.asarray(Rh), R_junk) < 0.5       # vote picks junk

    Rb, tb, wb = ransac_pose_branches(jnp.asarray(src), jnp.asarray(tgt),
                                      jnp.asarray(scores),
                                      jax.random.PRNGKey(0), branches=4, **kw)
    assert Rb.shape == (4, 3, 3) and tb.shape == (4, 3) and wb.shape == (4, n)
    errs_true = [_rot_deg(np.asarray(Rb[i]), R_true) for i in range(4)]
    errs_junk = [_rot_deg(np.asarray(Rb[i]), R_junk) for i in range(4)]
    assert errs_junk[0] < 0.5                            # branch 0 = junk
    assert min(errs_true) < 0.5, errs_true               # truth is in the stack
    # and the true branch's mask finds the true cluster
    i_true = int(np.argmin(errs_true))
    w_true = np.asarray(wb[i_true])
    assert w_true[:80].sum() >= 70
    assert w_true[80:200].sum() <= 5


def test_register_fpfh_branches_recovers_outvoted_truth(bumpy):
    """End-to-end verified branch selection: at 40% overlap some seeds flip
    to a consistent wrong-match cluster; ransac_branches=4 must keep the
    quality of the winning seed-0 draw (a regression canary for the
    branch-stack refactor of _register_core, not a statistics claim — the
    20-seed table in BASELINE.md carries those)."""
    rng = np.random.default_rng(0)
    src = bumpy(rng, 1024, -1.0, 1.0)
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * 0.3).astype(np.float32)
    tgt = bumpy(rng, 1024, 0.2, 2.2) @ R.T + t

    Rh, th, _ = register_fpfh(src, tgt, n_points=1024, top_m=256,
                              icp_trim=0.35, icp_iters=20, ransac_branches=4)
    assert _rot_deg(Rh, R) < 1.0, _rot_deg(Rh, R)
    assert np.linalg.norm(th - t) < 1.5e-2


def test_branch_verify_requests_fp32():
    """The branch-verification distance expansion (_branch_verify_ms) must
    request Precision.HIGHEST on BOTH contractions: the ‖p‖² − 2p·y + ‖y‖²
    cancellation leaves a ~1e-3 trimmed-MS signal and a DEFAULT-precision
    TPU matmul (bf16-rounded operands) injects ~4e-3 of noise — measured to
    flip the verified-branch pick on most 40%-overlap seeds while every CPU
    value test stays green (same bug class as the banded-FPFH matmuls,
    tests/test_fpfh.py::test_window_banded_matmuls_request_fp32). CPU
    executes fp32 at either setting, so this pins the JAXPR."""
    import jax

    from se3_equi_graph_registration_tpu.registration import _branch_verify_ms

    R = jnp.zeros((4, 3, 3), jnp.float32)
    t = jnp.zeros((4, 3), jnp.float32)
    src = jnp.zeros((256, 3), jnp.float32)
    tgt = jnp.zeros((256, 3), jnp.float32)
    jx = jax.make_jaxpr(lambda *a: _branch_verify_ms(*a, n_keep=64))(
        R, t, src, tgt)

    precs = [eqn.params.get("precision") for eqn in jx.jaxpr.eqns
             if eqn.primitive.name == "dot_general"]
    assert len(precs) >= 2, "verification contractions changed shape?"
    hi = jax.lax.Precision.HIGHEST
    assert all(p == (hi, hi) for p in precs), precs


def test_register_fpfh_ragged_inputs(bumpy):
    """Arbitrary input sizes sample/pad to the compiled n_points (the
    Registrar contract) and still register."""
    rng = np.random.default_rng(5)
    src = bumpy(rng, 700, -1.0, 1.0)     # < n_points: pads
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * 0.2).astype(np.float32)
    tgt = bumpy(rng, 1500, -1.0, 1.0) @ R.T + t   # > n_points: samples

    Rh, th, info = register_fpfh(src, tgt, n_points=512, seed=1)
    assert _rot_deg(Rh, R) < 1.0
    assert np.linalg.norm(th - t) < 1e-2
    assert info["indices"].shape == (512,)


def test_icp_trim_validation():
    from se3_equi_graph_registration_tpu.ops import icp
    src = jnp.zeros((1, 8, 3))
    with pytest.raises(ValueError, match="trim"):
        icp.icp_refine(src, src, jnp.eye(3)[None], jnp.zeros((1, 3)),
                       trim=1.5)


def test_registrar_register_raw(bumpy):
    """Raw clouds -> on-device FPFH-33 -> descriptor matching -> the learned
    model's correspondence path. With the same surface sampling shuffled in
    the target, matching must re-pair the clouds so the eval-fusion head
    (whose Kabsch weights derive from the pre-EGNN raw similarity) recovers
    the pose even at random init — correctness here comes from the
    descriptor stage, which is exactly what register_raw adds."""
    import jax
    from se3_equi_graph_registration_tpu import serving
    from se3_equi_graph_registration_tpu.train import engine

    n = 256
    rng = np.random.default_rng(7)
    src = bumpy(rng, n, -1.0, 1.0)
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * 0.2).astype(np.float32)
    tgt = (src @ R.T + t)[rng.permutation(n)]   # same surface, scrambled rows

    cfg = engine.EngineConfig(num_nodes=n, k=8, in_node_nf=33, top_k=64)
    model = engine.build_model(cfg, head_mode="eval_fusion")
    opt = engine.build_optimizer(cfg)
    dummy = {"src_feat": jnp.zeros((1, n, 33)), "src_pts": jnp.zeros((1, n, 3)),
             "tgt_feat": jnp.zeros((1, n, 33)), "tgt_pts": jnp.zeros((1, n, 3)),
             "labels": jnp.zeros((1, n))}
    params = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0),
                               dummy).params
    reg = serving.Registrar(params, cfg, head_mode="eval_fusion")

    Rh, th, info = reg.register_raw(src, tgt)
    assert _rot_deg(Rh, R) < 1.0, _rot_deg(Rh, R)
    assert np.linalg.norm(th - t) < 1e-2
    assert info["pose_covariance"].shape == (6, 6)

    # a 32-feature model cannot take FPFH-33
    cfg32 = engine.EngineConfig(num_nodes=n, k=8, in_node_nf=32, top_k=64)
    model32 = engine.build_model(cfg32, head_mode="eval_fusion")
    dummy32 = dict(dummy, src_feat=jnp.zeros((1, n, 32)),
                   tgt_feat=jnp.zeros((1, n, 32)))
    params32 = engine.init_state(model32, opt, cfg32, jax.random.PRNGKey(0),
                                 dummy32).params
    reg32 = serving.Registrar(params32, cfg32, head_mode="eval_fusion")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="in_node_nf=32"):
        reg32.register_raw(src, tgt)


def test_register_fpfh_batch_matches_single(bumpy):
    """The vmapped batch API returns the same poses as per-pair calls (same
    per-pair PRNG keys), at batch shapes."""
    from se3_equi_graph_registration_tpu.registration import register_fpfh_batch

    rng = np.random.default_rng(11)
    n, b = 512, 3
    srcs, tgts, gts = [], [], []
    for _ in range(b):
        s = bumpy(rng, n, -1.0, 1.0)
        R = random_rotation(rng).astype(np.float32)
        t = (rng.standard_normal(3) * 0.2).astype(np.float32)
        srcs.append(s)
        tgts.append(bumpy(rng, n, -1.0, 1.0) @ R.T + t)
        gts.append((R, t))

    Rb, tb, info = register_fpfh_batch(np.stack(srcs), np.stack(tgts))
    assert Rb.shape == (b, 3, 3) and info["pose_covariance"].shape == (b, 6, 6)
    for i, (R, t) in enumerate(gts):
        assert _rot_deg(Rb[i], R) < 0.5, (i, _rot_deg(Rb[i], R))
        assert np.linalg.norm(tb[i] - t) < 5e-3

    with pytest.raises(TypeError, match="unknown register_fpfh_batch"):
        register_fpfh_batch(np.stack(srcs), np.stack(tgts), n_points=512)


def test_register_fpfh_batch_mesh_matches_single_device(bumpy):
    """mesh= shards the pair axis over the virtual 8-device mesh; poses
    match the unsharded batch call exactly (each pair is independent)."""
    from se3_equi_graph_registration_tpu.parallel.mesh import local_mesh_for_testing
    from se3_equi_graph_registration_tpu.registration import register_fpfh_batch

    rng = np.random.default_rng(2)
    n, b = 256, 8
    srcs, tgts = [], []
    for _ in range(b):
        s = bumpy(rng, n, -1.0, 1.0)
        R = random_rotation(rng).astype(np.float32)
        t = (rng.standard_normal(3) * 0.2).astype(np.float32)
        srcs.append(s)
        tgts.append(s @ R.T + t)
    src, tgt = np.stack(srcs), np.stack(tgts)

    kw = dict(icp_iters=4, hypotheses=128, top_m=128)
    R0, t0, _ = register_fpfh_batch(src, tgt, **kw)
    R1, t1, _ = register_fpfh_batch(src, tgt,
                                    mesh=local_mesh_for_testing(8), **kw)
    np.testing.assert_allclose(R1, R0, atol=2e-5)
    np.testing.assert_allclose(t1, t0, atol=2e-5)


def test_export_compiled_roundtrip(bumpy, tmp_path):
    """AOT export (jax.export / StableHLO) of the checkpoint-free pipeline:
    the serialized program reloads WITHOUT framework code and reproduces
    the live jitted call bit-exactly — the deployment story
    serving.Registrar.export_compiled gives the learned path, here with no
    weights at all (the program is self-contained)."""
    import os

    import jax

    from se3_equi_graph_registration_tpu import registration as reg

    rng = np.random.default_rng(5)
    n, b = 256, 2
    srcs, tgts = [], []
    for _ in range(b):
        s = bumpy(rng, n, -1.0, 1.0)
        R = random_rotation(rng).astype(np.float32)
        t = (rng.standard_normal(3) * 0.2).astype(np.float32)
        srcs.append(s)
        tgts.append(bumpy(rng, n, -1.0, 1.0) @ R.T + t)
    src, tgt = jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(tgts))
    keys = jax.random.split(jax.random.PRNGKey(0), b)

    kw = dict(icp_iters=4, hypotheses=128, top_m=128)
    path = str(tmp_path / "register.jaxexport")
    size = reg.export_compiled(path, batch=b, n_points=n, **kw)
    assert size > 0 and os.path.getsize(path) == size

    live = jax.device_get(reg._CORE_BATCH(
        src, tgt, keys, k_normals=30, k_fpfh=60, sigma=0.09,
        spectral_iters=12, refine_iters=5, icp_mode="plane", icp_tau=0.0,
        icp_trim=0.0, icp_voxels=(), coarse="ransac", knn_method="approx",
        solver="quaternion", window=768, **kw))
    fn = reg.load_exported(path)
    loaded = jax.device_get(fn(src, tgt, keys))
    for a, c in zip(live, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    with pytest.raises(TypeError, match="unknown export_compiled"):
        reg.export_compiled(path, batch=b, n_points=n, bogus=1)
