"""Engine knob-matrix smoke test: every documented config combination must
produce a finite pose. Catches knob-interaction breakage (e.g. the morton
window clamp at small N) that single-config tests miss."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
from se3_equi_graph_registration_tpu.train import engine

MATRIX = list(itertools.product(
    ["exact", "approx", "morton"],        # knn_method ('pallas' ~= exact+kernel)
    ["svd", "quaternion"],                # kabsch_solver
    ["dot", "cosine"],                    # weight_mode
))


@pytest.mark.parametrize("knn_method,kabsch_solver,weight_mode", MATRIX)
def test_engine_config_combination(rng, knn_method, kabsch_solver,
                                   weight_mode):
    b, n, k, c = 2, 256, 8, 16
    cfg = engine.EngineConfig(
        num_nodes=n, k=k, in_node_nf=c, hidden_nf=32, top_k=32,
        knn_method=knn_method, kabsch_solver=kabsch_solver,
        weight_mode=weight_mode,
        # morton needs the canonical kernel mode; keep others on defaults
        egnn_impl="xla")
    model = engine.build_model(cfg)
    pb = make_pair_batch(rng, batch=b, n=n, feat_dim=c, noise=0.005)
    batch = engine.batch_to_device((pb.corr, pb.labels, pb.src_pts,
                                    pb.tgt_pts, pb.src_feat, pb.tgt_feat,
                                    pb.gt_pose))
    nbr0 = jnp.zeros((b, n, k), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), batch["src_feat"],
                        batch["src_pts"], nbr0, batch["tgt_feat"],
                        batch["tgt_pts"], nbr0, batch["labels"])
    out = jax.jit(lambda p, bt: engine._apply_with_graphs(model, cfg, p, bt))(
        params, batch)
    R = np.asarray(out.R)
    assert np.all(np.isfinite(R)) and np.all(np.isfinite(np.asarray(out.t)))
    # proper rotations in every configuration
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-3)


@pytest.mark.parametrize("so3_mode", ["frame", "invariant"])
@pytest.mark.parametrize("direction", ["center", "cluster"])
def test_engine_direction_so3_combinations(rng, so3_mode, direction):
    b, n, k, c = 1, 128, 8, 16
    cfg = engine.EngineConfig(num_nodes=n, k=k, in_node_nf=c, hidden_nf=32,
                              top_k=32, direction=direction,
                              so3_mode=so3_mode)
    model = engine.build_model(cfg)
    pb = make_pair_batch(rng, batch=b, n=n, feat_dim=c)
    batch = engine.batch_to_device((pb.corr, pb.labels, pb.src_pts,
                                    pb.tgt_pts, pb.src_feat, pb.tgt_feat,
                                    pb.gt_pose))
    nbr0 = jnp.zeros((b, n, k), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), batch["src_feat"],
                        batch["src_pts"], nbr0, batch["tgt_feat"],
                        batch["tgt_pts"], nbr0, batch["labels"])
    out = engine._apply_with_graphs(model, cfg, params, batch)
    assert np.all(np.isfinite(np.asarray(out.R)))


@pytest.mark.parametrize("fusion_weighting", ["reference", "sharp"])
@pytest.mark.parametrize("knn_method", ["exact", "morton"])
def test_eval_fusion_weighting_combinations(rng, knn_method, fusion_weighting):
    """The eval-fusion head's weighting knob must compose with the fast
    window path (the production serving combination)."""
    b, n, k, c = 2, 256, 8, 16
    cfg = engine.EngineConfig(
        num_nodes=n, k=k, in_node_nf=c, hidden_nf=32, top_k=32,
        knn_method=knn_method, fusion_weighting=fusion_weighting,
        egnn_impl="xla")
    model = engine.build_model(cfg, head_mode="eval_fusion")
    pb = make_pair_batch(rng, batch=b, n=n, feat_dim=c, noise=0.005)
    batch = engine.batch_to_device((pb.corr, pb.labels, pb.src_pts,
                                    pb.tgt_pts, pb.src_feat, pb.tgt_feat,
                                    pb.gt_pose))
    nbr0 = jnp.zeros((b, n, k), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), batch["src_feat"],
                        batch["src_pts"], nbr0, batch["tgt_feat"],
                        batch["tgt_pts"], nbr0, batch["labels"])
    out = jax.jit(lambda p, bt: engine._apply_with_graphs(model, cfg, p, bt))(
        params, batch)
    R = np.asarray(out.R)
    assert np.all(np.isfinite(R)) and np.all(np.isfinite(np.asarray(out.t)))
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-3)
    w = np.asarray(out.weights)
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-4)
