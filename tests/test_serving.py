"""Serving API and debugging-helper tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_equi_graph_registration_tpu.utils import debugging

CKPT = "/root/reference/checkpoints/checkpoint-3dmatch.pth"


@pytest.mark.skipif(not os.path.exists(CKPT), reason="reference ckpt absent")
def test_registrar_identity_translation(rng):
    from se3_equi_graph_registration_tpu.serving import Registrar
    reg = Registrar.from_checkpoint(CKPT, fast=False, num_nodes=256, k=8,
                                    top_k=64)
    src = rng.standard_normal((300, 3)).astype(np.float32)   # ragged: 300 -> 256
    feat = rng.standard_normal((300, 32)).astype(np.float32)
    R, t, info = reg.register(src, feat, src + 0.1, feat)
    assert R.shape == (3, 3)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-3)
    np.testing.assert_allclose(t, [0.1, 0.1, 0.1], atol=1e-3)

    # batched call with the compiled shape reuses the same jit program
    src2 = rng.standard_normal((2, 256, 3)).astype(np.float32)
    feat2 = rng.standard_normal((2, 256, 32)).astype(np.float32)
    R2, t2, _ = reg.register(src2, feat2, src2, feat2)
    assert R2.shape == (2, 3, 3)
    np.testing.assert_allclose(R2[0], np.eye(3), atol=1e-3)


def test_tree_all_finite_and_find():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert bool(debugging.tree_all_finite(good))
    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, jnp.nan])}}
    assert not bool(debugging.tree_all_finite(bad))
    paths = debugging.find_nonfinite(bad)
    assert len(paths) == 1 and "c" in paths[0]


def test_guard_fit_saves_emergency(tmp_path):
    class FakeCkpt:
        saved = None

        def save(self, step, state, metrics=None):
            FakeCkpt.saved = (step, metrics)

    class FakeState:
        step = jnp.asarray(7)

    def boom():
        raise RuntimeError("preempted")

    with pytest.raises(RuntimeError):
        debugging.guard_fit(boom, FakeCkpt(), lambda: FakeState())
    assert FakeCkpt.saved == (7, {"emergency": 1.0})


def test_guard_fit_emergency_checkpoint(tmp_path):
    """A crash inside the guarded fit must save a resumable emergency
    checkpoint of the latest state before re-raising (the failure-recovery
    story, utils/debugging.py)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from se3_equi_graph_registration_tpu.train import engine
    from se3_equi_graph_registration_tpu.train.checkpoints import TrainCheckpointer

    state = engine.TrainState(params={"w": jnp.ones((3,))},
                              opt_state=(), step=jnp.asarray(7, jnp.int32))
    ckpt = TrainCheckpointer(str(tmp_path / "emergency"))

    def crashing_fit():
        raise RuntimeError("data corruption at step 7")

    with pytest.raises(RuntimeError, match="data corruption"):
        debugging.guard_fit(crashing_fit, ckpt, lambda: state)

    restored = ckpt.restore_latest(state)
    assert restored is not None
    rstate, step = restored
    assert step == 7
    assert jnp.array_equal(rstate.params["w"], state.params["w"])


def test_pose_covariance_shrinks_with_noise(rng):
    """Covariance must be PSD, and grow with residual noise."""
    import jax.numpy as jnp

    from scipy.spatial.transform import Rotation

    from se3_equi_graph_registration_tpu.ops.kabsch import (kabsch_weighted,
                                                            pose_covariance)

    n = 256
    src = rng.standard_normal((1, n, 3)).astype(np.float32)
    R_gt = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix().astype(np.float32)
    covs = []
    for noise in (0.001, 0.05):
        tgt = src @ R_gt.T + noise * rng.standard_normal((1, n, 3)).astype(np.float32)
        w = jnp.ones((1, n)) / n
        R, t = kabsch_weighted(jnp.asarray(src), jnp.asarray(tgt), w)
        cov = np.asarray(pose_covariance(jnp.asarray(src), jnp.asarray(tgt),
                                         R, t, w))[0]
        evals = np.linalg.eigvalsh(cov)
        assert np.all(evals > -1e-12), evals      # PSD
        covs.append(np.trace(cov))
    assert covs[1] > covs[0] * 10                 # more noise, more variance


def test_registrar_clique_prefilter(rng):
    """Max-clique pruning should reject gross outlier correspondences."""
    from scipy.spatial.transform import Rotation

    from se3_equi_graph_registration_tpu import serving
    from se3_equi_graph_registration_tpu.train import engine

    n, c = 256, 16
    cfg = engine.EngineConfig(num_nodes=n, k=8, in_node_nf=c, hidden_nf=32,
                              top_k=64)
    model = engine.build_model(cfg)
    src = rng.standard_normal((n, 3)).astype(np.float32)
    R_gt = Rotation.from_euler("xyz", [0.4, 0.1, -0.3]).as_matrix().astype(np.float32)
    t_gt = np.asarray([0.2, -0.1, 0.3], np.float32)
    tgt = src @ R_gt.T + t_gt
    # corrupt 40% of correspondences
    n_bad = int(0.4 * n)
    tgt[:n_bad] = rng.standard_normal((n_bad, 3)).astype(np.float32) * 2.0
    feat = rng.standard_normal((n, c)).astype(np.float32)

    params = model.init(
        jax.random.PRNGKey(0), feat[None], src[None],
        np.zeros((1, n, 8), np.int32), feat[None], tgt[None],
        np.zeros((1, n, 8), np.int32), np.ones((1, n), np.float32))
    reg = serving.Registrar(params, cfg, head_mode="train")
    lbl = reg._clique_labels(src, tgt, tau=0.05)
    # the clique keeps (mostly) clean correspondences and drops outliers
    assert lbl[n_bad:].sum() >= 0.8 * (n - n_bad)
    assert lbl[:n_bad].sum() <= 0.1 * n_bad

    R, t, info = reg.register(src, feat, tgt, feat, clique_prefilter=True,
                              clique_tau=0.05)
    assert info["pose_covariance"].shape == (6, 6)
    assert info["clique_inliers"][0] >= 3
    assert np.all(np.isfinite(R))

    # the clique mask alone recovers the GT transform through a plain
    # weighted Kabsch (the model's learned weighting needs trained features)
    from se3_equi_graph_registration_tpu.ops.kabsch import kabsch_weighted
    Rk, tk = kabsch_weighted(jnp.asarray(src)[None], jnp.asarray(tgt)[None],
                             jnp.asarray(lbl)[None])
    Rk = np.asarray(Rk[0])
    rot_err = np.degrees(np.arccos(np.clip((np.trace(R_gt.T @ Rk) - 1) / 2, -1, 1)))
    assert rot_err < 2.0, rot_err
    np.testing.assert_allclose(np.asarray(tk[0]), t_gt, atol=0.05)


def test_batching_server_coalesces(rng):
    """Concurrent submissions resolve with per-request results."""
    from se3_equi_graph_registration_tpu import serving
    from se3_equi_graph_registration_tpu.train import engine

    n, c = 128, 16
    cfg = engine.EngineConfig(num_nodes=n, k=8, in_node_nf=c, hidden_nf=32,
                              top_k=32)
    model = engine.build_model(cfg)
    feat = rng.standard_normal((n, c)).astype(np.float32)
    src = rng.standard_normal((n, 3)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feat[None], src[None],
        np.zeros((1, n, 8), np.int32), feat[None], src[None],
        np.zeros((1, n, 8), np.int32), np.ones((1, n), np.float32))
    reg = serving.Registrar(params, cfg, head_mode="train")
    server = serving.BatchingServer(reg, max_batch=4, max_wait_ms=50)
    try:
        futs = [server.submit(src, feat,
                              src + rng.normal(0, 0.01, src.shape).astype(np.float32),
                              feat)
                for _ in range(6)]
        for f in futs:
            R, t, info = f.result(timeout=120)
            assert R.shape == (3, 3) and t.shape == (3,)
            assert info["pose_covariance"].shape == (6, 6)
            assert np.all(np.isfinite(R))
    finally:
        server.close()


def test_export_compiled_roundtrip(rng, tmp_path):
    """AOT export (jax.export / StableHLO): the serialized program reloads
    WITHOUT framework code and reproduces the live jit bit-exactly."""
    from se3_equi_graph_registration_tpu import serving
    from se3_equi_graph_registration_tpu.train import engine

    n, c = 128, 16
    cfg = engine.EngineConfig(num_nodes=n, k=8, in_node_nf=c, hidden_nf=32,
                              top_k=32)
    model = engine.build_model(cfg)
    feat = rng.standard_normal((1, n, c)).astype(np.float32)
    src = rng.standard_normal((1, n, 3)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feat, src, np.zeros((1, n, 8), np.int32),
        feat, src, np.zeros((1, n, 8), np.int32), np.ones((1, n), np.float32))
    reg = serving.Registrar(params, cfg, head_mode="train")

    path = str(tmp_path / "registrar.jaxexport")
    size = reg.export_compiled(path, batch=1)
    assert size > 0 and os.path.getsize(path) == size

    batch = {"src_pts": jnp.asarray(src), "src_feat": jnp.asarray(feat),
             "tgt_pts": jnp.asarray(src + 0.05), "tgt_feat": jnp.asarray(feat),
             "labels": jnp.ones((1, n), jnp.float32)}
    live = jax.device_get(reg._apply(reg.params, batch))
    fn = serving.Registrar.load_exported(path)
    loaded = jax.device_get(fn(reg.params, batch))
    for a, b in zip(live, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_registrar_data_parallel_mesh(rng):
    """mesh= shards the pair axis over the 8-device mesh; results match the
    single-device registrar, including a batch that needs padding (3 -> 8)."""
    from se3_equi_graph_registration_tpu import serving
    from se3_equi_graph_registration_tpu.parallel.mesh import local_mesh_for_testing
    from se3_equi_graph_registration_tpu.train import engine

    n, c = 128, 16
    cfg = engine.EngineConfig(num_nodes=n, k=8, in_node_nf=c, hidden_nf=32,
                              top_k=32)
    model = engine.build_model(cfg)
    feat = rng.standard_normal((3, n, c)).astype(np.float32)
    src = rng.standard_normal((3, n, 3)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feat[:1], src[:1],
        np.zeros((1, n, 8), np.int32), feat[:1], src[:1],
        np.zeros((1, n, 8), np.int32), np.ones((1, n), np.float32))

    single = serving.Registrar(params, cfg, head_mode="train")
    sharded = serving.Registrar(params, cfg, head_mode="train",
                                mesh=local_mesh_for_testing(8))
    tgt = src + 0.05
    R1, t1, i1 = single.register(src, feat, tgt, feat)
    R2, t2, i2 = sharded.register(src, feat, tgt, feat)
    assert R2.shape == (3, 3, 3) and t2.shape == (3, 3)
    np.testing.assert_allclose(R2, R1, atol=1e-5)
    np.testing.assert_allclose(t2, t1, atol=1e-5)
    np.testing.assert_allclose(i2["similarity_mean"], i1["similarity_mean"],
                               rtol=1e-5)
    np.testing.assert_allclose(i2["pose_covariance"], i1["pose_covariance"],
                               rtol=1e-4, atol=1e-5)

    # unbatched (squeeze) path through the mesh: pads 1 -> 8
    R3, t3, i3 = sharded.register(src[0], feat[0], tgt[0], feat[0])
    assert R3.shape == (3, 3) and i3["pose_covariance"].shape == (6, 6)
    np.testing.assert_allclose(R3, R1[0], atol=1e-5)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="reference ckpt absent")
def test_registrar_irls_refinement_recovers_outlier_pair(rng):
    """refine_iters: 30% corrupted correspondences drag the reference
    weighting off the pose; IRLS refinement inside the same jitted program
    recovers it."""
    from se3_equi_graph_registration_tpu.serving import Registrar

    n = 256
    src = rng.standard_normal((n, 3)).astype(np.float32)
    feat = rng.standard_normal((n, 32)).astype(np.float32)
    tgt = src + 0.1
    tgt[180:] = rng.standard_normal((n - 180, 3)).astype(np.float32) * 3

    base = Registrar.from_checkpoint(CKPT, fast=False, num_nodes=n, k=8,
                                     top_k=64)
    R0, t0, _ = base.register(src, feat, tgt, feat)
    err0 = max(np.abs(R0 - np.eye(3)).max(), np.abs(t0 - 0.1).max())

    ref = Registrar(base.params, base.cfg, refine_iters=5)
    R1, t1, _ = ref.register(src, feat, tgt, feat)
    err1 = max(np.abs(R1 - np.eye(3)).max(), np.abs(t1 - 0.1).max())
    assert err1 < 5e-3, (err0, err1)
    assert err1 < err0 / 10

    # clean pair: refinement must not disturb an already-correct pose
    Rc, tc, _ = ref.register(src, feat, src + 0.1, feat)
    np.testing.assert_allclose(Rc, np.eye(3), atol=1e-3)
    np.testing.assert_allclose(tc, 0.1, atol=1e-3)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="reference ckpt absent")
def test_registrar_icp_fine_registration(rng):
    """icp_iters: point-to-point ICP composes as the final serving stage.
    Half the putative correspondences are index-SCRAMBLED (the failure IRLS
    can only down-weight, never repair) while the geometry is intact — ICP
    re-associates by 1-NN and recovers the exact pose; the covariance
    (computed against NN-associated targets after re-association) stays
    finite and PSD-scaled."""
    from se3_equi_graph_registration_tpu.serving import Registrar

    n = 256
    src = rng.standard_normal((n, 3)).astype(np.float32)
    feat = rng.standard_normal((n, 32)).astype(np.float32)
    tgt = src + 0.1
    # scramble the pairing of the back half: same surface, wrong indices
    perm = np.concatenate([np.arange(128), 128 + rng.permutation(n - 128)])
    tgt, tfeat = tgt[perm], feat[perm]

    base = Registrar.from_checkpoint(CKPT, fast=False, num_nodes=n, k=8,
                                     top_k=64)
    R0, t0, _ = base.register(src, feat, tgt, tfeat)
    err0 = max(np.abs(R0 - np.eye(3)).max(), np.abs(t0 - 0.1).max())

    icp = Registrar(base.params, base.cfg, icp_iters=8)
    R1, t1, info = icp.register(src, feat, tgt, tfeat)
    err1 = max(np.abs(R1 - np.eye(3)).max(), np.abs(t1 - 0.1).max())
    assert err1 < 1e-3, (err0, err1)
    assert err1 <= err0 + 1e-6
    cov = info["pose_covariance"]
    assert cov.shape == (6, 6) and np.all(np.isfinite(cov))
    assert np.all(np.linalg.eigvalsh((cov + cov.T) / 2) > -1e-12)
