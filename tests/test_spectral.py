"""Spectral matching correspondence reweighting (ops/spectral.py).

Beyond-reference capability: the principal-eigenvector consistency weights
must (a) concentrate on the geometrically-consistent inlier cluster even from
a near-uniform prior — the regime where the reference's eval weighting
collapses (src/eval_egnn_metrics.py:746-774, BASELINE.md low-inlier table) —
(b) recover the pose through weighted Kabsch at outlier ratios far past the
head's, and (c) stay finite on degenerate inputs.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
from se3_equi_graph_registration_tpu.ops.kabsch import kabsch_irls, kabsch_weighted
from se3_equi_graph_registration_tpu.ops.spectral import spectral_match_weights
from se3_equi_graph_registration_tpu.train import engine


def _pose_errors(R, t, gt_pose):
    R_gt, t_gt = gt_pose[..., :3, :3], gt_pose[..., :3, 3]
    rot = np.linalg.norm(np.asarray(R) - np.asarray(R_gt)) / np.sqrt(2)
    trans = float(np.max(np.linalg.norm(np.asarray(t) - np.asarray(t_gt),
                                        axis=-1)))
    return rot, trans


def test_weights_concentrate_on_inliers():
    pb = make_pair_batch(np.random.default_rng(0), batch=2, n=512,
                         inlier_ratio=0.3, noise=0.005)
    uniform = jnp.ones(pb.labels.shape, jnp.float32)  # worst-case prior
    w = jax.jit(spectral_match_weights, static_argnames=("top_m",))(
        jnp.asarray(pb.src_pts), jnp.asarray(pb.tgt_pts), uniform, top_m=256)
    w = np.asarray(w)
    assert np.all(np.isfinite(w)) and np.all(w >= 0)
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-5)
    inlier_mass = (w * pb.labels).sum(axis=-1)
    # only ~30% of the candidates are inliers, yet consistency routes ~90%
    # of the eigenvector mass to them (outliers keep a small residual share
    # from chance distance agreements within sigma)
    assert np.all(inlier_mass > 0.85), inlier_mass


def test_pose_recovery_at_30pct_inliers_from_uniform_prior():
    pb = make_pair_batch(np.random.default_rng(1), batch=4, n=1024,
                         inlier_ratio=0.3, noise=0.005)
    src, tgt = jnp.asarray(pb.src_pts), jnp.asarray(pb.tgt_pts)
    uniform = jnp.ones(pb.labels.shape, jnp.float32)

    R_u, t_u = kabsch_weighted(src, tgt, uniform)        # collapses
    w = spectral_match_weights(src, tgt, uniform, top_m=256)
    R_s, t_s = kabsch_weighted(src, tgt, w)
    _, trans_u = _pose_errors(R_u, t_u, pb.gt_pose)
    rot_s, trans_s = _pose_errors(R_s, t_s, pb.gt_pose)
    assert trans_u > 0.05                                # uniform is lost
    assert rot_s < 0.02 and trans_s < 0.01, (rot_s, trans_s)

    # IRLS composes: polish from the spectral weights stays locked in
    R_i, t_i, _ = kabsch_irls(src, tgt, w, iters=5)
    rot_i, trans_i = _pose_errors(R_i, t_i, pb.gt_pose)
    assert rot_i < 0.02 and trans_i < 0.01, (rot_i, trans_i)


def test_degenerate_inputs_stay_finite():
    # identical clouds: every pair is perfectly consistent -> uniform weights
    p = jnp.zeros((1, 64, 3), jnp.float32)
    w = spectral_match_weights(p, p, jnp.ones((1, 64)), top_m=32)
    assert np.all(np.isfinite(np.asarray(w)))
    # top_m larger than N clamps
    w2 = spectral_match_weights(p, p, jnp.ones((1, 64)), top_m=256)
    assert w2.shape == (1, 64) and np.all(np.isfinite(np.asarray(w2)))
    # unbatched rank also works
    w3 = spectral_match_weights(p[0], p[0], jnp.ones((64,)), top_m=16)
    assert w3.shape == (64,) and np.all(np.isfinite(np.asarray(w3)))


def test_eval_step_spectral_knob():
    cfg = dataclasses.replace(engine.EngineConfig(num_nodes=256, k=8,
                                                  top_k=64),
                              spectral_topm=128, refine_iters=3)
    model = engine.build_model(cfg)
    pb = make_pair_batch(np.random.default_rng(2), batch=2, n=cfg.num_nodes,
                         inlier_ratio=0.5)
    batch = engine.batch_to_device(pb)
    opt = engine.build_optimizer(cfg)
    params = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0),
                               batch).params
    m = jax.device_get(engine.make_eval_step(model, cfg)(params, batch))
    for k, v in m.items():
        assert np.all(np.isfinite(v)), (k, v)
    # the random-init head's weights are ~uniform; spectral+IRLS should still
    # place the pose near GT (translation within a few cm on unit-scale clouds)
    assert np.mean(m["trans_err_cm"]) < 5.0, m["trans_err_cm"]


def test_serving_spectral_knob():
    from se3_equi_graph_registration_tpu.serving import Registrar
    cfg = engine.EngineConfig(num_nodes=256, k=8, top_k=64)
    model = engine.build_model(cfg)
    pb = make_pair_batch(np.random.default_rng(3), batch=1, n=cfg.num_nodes,
                         inlier_ratio=0.4)
    batch = engine.batch_to_device(pb)
    opt = engine.build_optimizer(cfg)
    params = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0),
                               batch).params
    reg = Registrar(params, cfg, head_mode="train", spectral_topm=128,
                    refine_iters=3)
    R, t, info = reg.register(pb.src_pts[0], pb.src_feat[0],
                              pb.tgt_pts[0], pb.tgt_feat[0])
    assert np.all(np.isfinite(R)) and np.all(np.isfinite(t))
    rot, trans = _pose_errors(R, t, pb.gt_pose[0])
    assert trans < 0.10, (rot, trans)

    # composes with mesh serving: the pair-axis-sharded registrar (padding
    # 1 -> 8) must reproduce the single-device spectral+IRLS pose
    if len(jax.devices()) >= 8:
        from se3_equi_graph_registration_tpu.parallel.mesh import (
            local_mesh_for_testing)
        regm = Registrar(params, cfg, head_mode="train", spectral_topm=128,
                         refine_iters=3, mesh=local_mesh_for_testing(8))
        Rm, tm, _ = regm.register(pb.src_pts[0], pb.src_feat[0],
                                  pb.tgt_pts[0], pb.tgt_feat[0])
        np.testing.assert_allclose(Rm, R, atol=1e-5)
        np.testing.assert_allclose(tm, t, atol=1e-5)
