"""bf16 stochastic-rounding training (utils/bf16_training.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from se3_equi_graph_registration_tpu.utils.bf16_training import (
    Bf16SRState, bf16_sr_optimizer, stochastic_round_to_bf16,
    tree_stochastic_round)


def test_sr_is_unbiased_and_lands_on_neighbors():
    """SR must return one of the two neighboring bf16 values with the exact
    residual probability (unbiased in expectation)."""
    # bf16 has a 7-bit stored mantissa: ulp at 1.0 is 2^-7, halfway is 1+2^-8
    x = jnp.float32(1.0 + 2 ** -8)
    lo = np.float32(1.0)
    hi = np.float32(1.0 + 2 ** -7)
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)
    vals = jax.vmap(lambda k: stochastic_round_to_bf16(k, x))(keys)
    vals = np.asarray(vals, np.float32)
    assert set(np.unique(vals)) <= {lo, hi}
    frac_up = (vals == hi).mean()
    assert 0.45 < frac_up < 0.55, frac_up                 # p = 0.5 halfway
    mean = vals.mean()
    np.testing.assert_allclose(mean, float(x), rtol=2e-3)  # unbiased


def test_sr_handles_exact_and_nonfinite():
    key = jax.random.PRNGKey(1)
    exact = jnp.asarray([0.0, 1.0, -2.0, 0.5], jnp.float32)  # bf16-exact
    out = stochastic_round_to_bf16(key, exact)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(exact))
    weird = jnp.asarray([np.inf, -np.inf, np.nan], jnp.float32)
    out = np.asarray(stochastic_round_to_bf16(key, weird), np.float32)
    assert np.isposinf(out[0]) and np.isneginf(out[1]) and np.isnan(out[2])


def test_tiny_updates_apply_in_expectation():
    """The motivating property: updates far below half a bf16 ulp still move
    the weight in expectation (round-to-nearest would freeze it forever)."""
    opt = bf16_sr_optimizer(optax.sgd(1.0), seed=0)
    p = {"w": jnp.full((512,), 1.0, jnp.bfloat16)}
    state = opt.init(p)
    g = {"w": jnp.full((512,), 2 ** -12, jnp.float32)}   # ulp at 1.0 is 2^-8
    for _ in range(20):
        upd, state = opt.update(g, state, p)
        p = optax.apply_updates(p, upd)
    # master integrated exactly; live bf16 params follow it stochastically
    np.testing.assert_allclose(np.asarray(state.master["w"]),
                               1.0 - 20 * 2 ** -12, rtol=1e-6)
    drift = 1.0 - np.asarray(p["w"], np.float32).mean()
    np.testing.assert_allclose(drift, 20 * 2 ** -12, rtol=0.35)
    # round-to-nearest comparison: the same updates freeze the weight
    frozen = jnp.bfloat16(jnp.float32(jnp.bfloat16(1.0)) - 2 ** -12)
    assert float(frozen) == 1.0


def test_bf16_model_training_converges(rng):
    """End-to-end: the RegistrationModel trains with bf16 SR params."""
    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    from se3_equi_graph_registration_tpu.train import engine, losses

    b, n, k, c = 2, 128, 8, 16
    cfg = engine.EngineConfig(num_nodes=n, k=k, in_node_nf=c, hidden_nf=32,
                              top_k=32)
    model = engine.build_model(cfg)
    pb = make_pair_batch(rng, batch=b, n=n, feat_dim=c, noise=0.005)
    batch = engine.batch_to_device((pb.corr, pb.labels, pb.src_pts, pb.tgt_pts,
                                    pb.src_feat, pb.tgt_feat, pb.gt_pose))
    state = engine.init_state(model, optax.adam(1e-3), cfg,
                              jax.random.PRNGKey(0), batch)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16),
                                    state.params)
    opt = bf16_sr_optimizer(optax.adam(1e-3), seed=0)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            out = engine._apply_with_graphs(model, cfg, pp, batch)
            return losses.total_loss(out, batch["gt_pose"],
                                     batch["labels"]).total
        l, g = jax.value_and_grad(loss_fn)(p)
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, l

    first = None
    for i in range(12):
        params, opt_state, l = step(params, opt_state)
        if first is None:
            first = float(l)
    assert all(leaf.dtype == jnp.bfloat16
               for leaf in jax.tree_util.tree_leaves(params))
    assert float(l) < first


def test_tree_round_preserves_structure_and_ints():
    tree = {"a": jnp.ones((3,), jnp.float32), "b": jnp.arange(4, dtype=jnp.int32)}
    out = tree_stochastic_round(jax.random.PRNGKey(0), tree)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out["b"]), np.arange(4))


def test_engine_bf16_params_knob(rng):
    """EngineConfig(bf16_params=True): live params are bf16, the SR master
    hides in the optimizer state, and the standard make_train_step trains."""
    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    from se3_equi_graph_registration_tpu.train import engine

    b, n, k, c = 2, 128, 8, 16
    cfg = engine.EngineConfig(num_nodes=n, k=k, in_node_nf=c, hidden_nf=32,
                              top_k=32, lr=1e-3, bf16_params=True)
    model = engine.build_model(cfg)
    opt = engine.build_optimizer(cfg)
    pb = make_pair_batch(rng, batch=b, n=n, feat_dim=c, noise=0.005)
    batch = engine.batch_to_device((pb.corr, pb.labels, pb.src_pts, pb.tgt_pts,
                                    pb.src_feat, pb.tgt_feat, pb.gt_pose))
    state = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0), batch)
    assert all(leaf.dtype == jnp.bfloat16
               for leaf in jax.tree_util.tree_leaves(state.params))
    step = engine.make_train_step(model, opt, cfg)
    first = None
    for _ in range(8):
        state, m = step(state, batch)
        if first is None:
            first = float(m["total"])
    assert np.isfinite(float(m["total"]))
    assert float(m["total"]) < first
    assert all(leaf.dtype == jnp.bfloat16
               for leaf in jax.tree_util.tree_leaves(state.params))
