"""Orbax TrainCheckpointer round-trip: save → restore bit-equality, retention,
and resume-into-training."""
import jax
import jax.numpy as jnp
import numpy as np

from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
from se3_equi_graph_registration_tpu.train import engine
from se3_equi_graph_registration_tpu.train.checkpoints import TrainCheckpointer


def _small_state(rng):
    cfg = engine.EngineConfig(num_nodes=64, k=8, in_node_nf=16, top_k=16)
    model = engine.build_model(cfg)
    opt = engine.build_optimizer(cfg)
    pb = make_pair_batch(rng, batch=2, n=64, feat_dim=16)
    batch = engine.batch_to_device((pb.corr, pb.labels, pb.src_pts, pb.tgt_pts,
                                    pb.src_feat, pb.tgt_feat, pb.gt_pose))
    state = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0), batch)
    return cfg, model, opt, batch, state


def test_roundtrip_bit_equality(tmp_path, rng):
    cfg, model, opt, batch, state = _small_state(rng)
    ckpt = TrainCheckpointer(str(tmp_path))
    ckpt.save(3, state)
    restored, step = ckpt.restore_latest(state)
    assert step == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_empty_returns_none(tmp_path, rng):
    cfg, model, opt, batch, state = _small_state(rng)
    ckpt = TrainCheckpointer(str(tmp_path / "empty"))
    assert ckpt.restore_latest(state) is None


def test_resume_continues_training(tmp_path, rng):
    cfg, model, opt, batch, state = _small_state(rng)
    step_fn = engine.make_train_step(model, opt, cfg)
    state, _ = step_fn(state, batch)
    state, _ = step_fn(state, batch)
    ckpt = TrainCheckpointer(str(tmp_path))
    ckpt.save(int(state.step), state)

    restored, step = ckpt.restore_latest(state)
    assert step == 2 and int(restored.step) == 2
    restored2, m = step_fn(restored, batch)
    assert int(restored2.step) == 3
    assert np.isfinite(float(m["total"]))


def test_retention_keeps_latest(tmp_path, rng):
    cfg, model, opt, batch, state = _small_state(rng)
    ckpt = TrainCheckpointer(str(tmp_path), keep=2)
    for s in (1, 2, 3, 4):
        ckpt.save(s, state)
    restored, step = ckpt.restore_latest(state)
    assert step == 4
