"""Pallas kernel tests (interpret mode on CPU; compiled parity is exercised on
real TPU by bench/verify runs)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from se3_equi_graph_registration_tpu.models import EGNN
from se3_equi_graph_registration_tpu.ops import knn
from se3_equi_graph_registration_tpu.ops.pallas.egcl_kernel import (
    egnn_forward_pallas, params_from_tree)


def _setup(rng, b=2, n=256, k=16, c=32):
    h = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    nbr = jax.vmap(lambda p: knn.knn_graph(p, k))(x)
    model = EGNN(in_node_nf=c, direction="center", so3_mode="frame")
    params = model.init(jax.random.PRNGKey(0), h, x, nbr)
    return model, params, h, x, nbr


def test_fused_kernel_matches_flax_egnn(rng):
    model, params, h, x, nbr = _setup(rng)
    h_ref, x_ref = model.apply(params, h, x, nbr)
    h_pal, x_pal = egnn_forward_pallas(params, h, x, nbr, tile_t=64,
                                       chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=5e-5, rtol=1e-4)


def test_fused_kernel_unbatched(rng):
    model, params, h, x, nbr = _setup(rng, b=1)
    h_ref, x_ref = model.apply(params, h[0], x[0], nbr[0])
    h_pal, x_pal = egnn_forward_pallas(params, h[0], x[0], nbr[0], tile_t=64,
                                       chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=5e-4)


def _setup_window(rng, b=2, n=256, k=16, c=32, window=128, curve="hilbert"):
    """Curve-sorted clouds + window-restricted graphs (the windowed kernels'
    input contract, ops/morton.py)."""
    from se3_equi_graph_registration_tpu.ops import morton

    h = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    perm = morton.morton_perm(x, curve=curve)
    x = jnp.take_along_axis(x, perm[..., None], axis=1)
    h = jnp.take_along_axis(h, perm[..., None], axis=1)
    nbr = jax.vmap(lambda p: morton.knn_graph_window(p, k, tile=64,
                                                     window=window))(x)
    model = EGNN(in_node_nf=c, direction="center", so3_mode="frame")
    params = model.init(jax.random.PRNGKey(0), h, x, nbr)
    return model, params, h, x, nbr


def test_accurate_window_forward_chunk_cap_nonpow2_k(rng):
    """Regression: the accurate-window FORWARD's auto chunk (1024-lane cap,
    egcl_kernel.py) must DIVIDE tile_t*K — k=12 gives tk=1536, where a flat
    1024 cap breaks the kernel's chunking invariant. chunk=None exercises
    the cap loop; output must match the XLA EGNN on the same window graph."""
    from se3_equi_graph_registration_tpu.ops import morton
    b, n, k, c, W = 1, 256, 12, 32, 128
    h = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    h, x, _ = morton.sort_by_curve(h, x, "hilbert")
    # graph tile MUST equal the kernel's tile_t (shared window invariant)
    nbr = jax.vmap(lambda p: morton.knn_graph_window(p, k, tile=128,
                                                     window=W))(x)
    model = EGNN(in_node_nf=c, direction="center", so3_mode="frame")
    params = model.init(jax.random.PRNGKey(0), h, x, nbr)
    h_ref, x_ref = model.apply(params, h, x, nbr)
    h_pal, x_pal = egnn_forward_pallas(params, h, x, nbr, tile_t=128,
                                       chunk=None, interpret=True,
                                       accurate=True, window=128)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=5e-5, rtol=1e-4)


def test_windowed_kernel_matches_flax_on_window_graph(rng):
    """The windowed gather must be EXACT for graphs satisfying the window
    invariant: fused kernel (window=...) == XLA EGNN on the same graph."""
    model, params, h, x, nbr = _setup_window(rng, window=128)
    h_ref, x_ref = model.apply(params, h, x, nbr)
    h_pal, x_pal = egnn_forward_pallas(params, h, x, nbr, tile_t=64,
                                       chunk=256, interpret=True, window=128)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=5e-5, rtol=1e-4)


def test_windowed_backward_matches_xla_grads(rng):
    """Windowed fast-mode custom VJP vs XLA autodiff on the same window graph."""
    model, params, h, x, nbr = _setup_window(rng, b=1, n=128, window=128)

    def loss_xla(p):
        ho, xo = model.apply(p, h, x, nbr)
        return jnp.sum(ho ** 2) + jnp.sum(xo ** 2)

    def loss_pal(p):
        ho, xo = egnn_forward_pallas(p, h, x, nbr, tile_t=64, chunk=256,
                                     interpret=True, accurate=False,
                                     window=128)
        return jnp.sum(ho ** 2) + jnp.sum(xo ** 2)

    g_ref = jax.grad(loss_xla)(params)
    g_pal = jax.grad(loss_pal)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-2, rtol=5e-2)


def test_morton_fast_path_end_to_end(rng):
    """engine knn_method='morton': permute → window graph → windowed kernel →
    un-permute → head. Pallas(interpret) and XLA twins must agree, and the
    outputs must be properly un-permuted (match an explicit XLA EGNN on the
    sorted arrays, un-sorted by hand)."""
    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    from se3_equi_graph_registration_tpu.train import engine

    b, n, k, c = 2, 256, 16, 32
    pb = make_pair_batch(rng, batch=b, n=n, feat_dim=c)
    batch = engine.batch_to_device((pb.corr, pb.labels, pb.src_pts, pb.tgt_pts,
                                    pb.src_feat, pb.tgt_feat, pb.gt_pose))
    cfg = engine.EngineConfig(num_nodes=n, k=k, in_node_nf=c, hidden_nf=32,
                              top_k=64, knn_method="morton", egnn_window=128,
                              egnn_impl="pallas", egnn_accurate=False)
    import dataclasses
    model = engine.build_model(cfg)
    opt = engine.build_optimizer(cfg)
    state_params = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0),
                                     batch).params

    out_pal = engine._apply_with_graphs(model, cfg, state_params, batch)
    cfg_xla = dataclasses.replace(cfg, egnn_impl="xla")
    out_xla = engine._apply_with_graphs(model.clone(egnn_impl="xla"), cfg_xla,
                                        state_params, batch)
    np.testing.assert_allclose(np.asarray(out_pal.h_src),
                               np.asarray(out_xla.h_src), atol=5e-4, rtol=1e-3)
    # R amplifies tiny feature deltas through softmax weights + SVD; compare
    # at the level the downstream metrics care about (~0.3 deg)
    np.testing.assert_allclose(np.asarray(out_pal.R), np.asarray(out_xla.R),
                               atol=6e-3)
    # gradient flows through the morton train path (windowed backward kernel)
    state = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0), batch)
    step = engine.make_train_step(model, opt, cfg)
    state2, m = step(state, batch)
    assert np.isfinite(float(m["total"]))


def test_params_from_tree_blockdiag(rng):
    """The block-diagonal dense W2 must reproduce the per-head einsum."""
    model, params, h, x, nbr = _setup(rng, b=1, n=64, k=8)
    tree = params["params"]["gcl_0"]
    p = params_from_tree(tree)
    hk = np.asarray(tree["edge_mlp"]["head_kernels"])   # [H, w, w]
    y = rng.standard_normal((32,)).astype(np.float32)
    per_head = np.concatenate(
        [y.reshape(4, 8)[i] @ hk[i] for i in range(4)])
    dense = np.asarray(p.w2) @ y
    np.testing.assert_allclose(dense + 0, per_head, atol=1e-5)


def test_edge_attr_fold(rng):
    """b1 folds the edge_attr(=1) weight column: w1 row 76 + bias."""
    model, params, h, x, nbr = _setup(rng, b=1, n=64, k=8)
    tree = params["params"]["gcl_0"]
    p = params_from_tree(tree)
    w1 = np.asarray(tree["edge_mlp"]["fused_in"]["kernel"])
    b1 = np.asarray(tree["edge_mlp"]["fused_in"]["bias"])
    np.testing.assert_allclose(np.asarray(p.b1)[:, 0], b1 + w1[76], atol=1e-6)


@pytest.mark.parametrize("n,tile,window", [
    (384, 128, 384),   # the production tile at window == n (full window)
    (512, 128, 384),   # the PRODUCTION combo (fast_tpu_config defaults)
    (512, 128, 256),   # clipped windows at both ends
    (384, 64, 256),    # tile 64: pad_tiles = 1, clipped at both ends
])
def test_windowed_kernel_shape_sweep(rng, n, tile, window):
    """Window math (S(i) tile-quantization) is replicated across the graph
    builder and all three kernels — sweep tile/window combos incl. the
    production (128, 384) shape, which the fixed-shape tests above miss."""
    from se3_equi_graph_registration_tpu.ops import morton

    b, k, c = 1, 8, 8
    h = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    perm = morton.morton_perm(x)
    x = jnp.take_along_axis(x, perm[..., None], axis=1)
    h = jnp.take_along_axis(h, perm[..., None], axis=1)
    nbr = jax.vmap(lambda p: morton.knn_graph_window(
        p, k, tile=tile, window=window))(x)
    # graph builder and knn kernel agree bit-for-bit at the same tile/window
    from se3_equi_graph_registration_tpu.ops.pallas.knn_kernel import knn_pallas
    nbr_kernel = knn_pallas(x, k, tile_t=tile, window=window, interpret=True)
    np.testing.assert_array_equal(np.asarray(nbr_kernel), np.asarray(nbr))

    model = EGNN(in_node_nf=c, direction="center", so3_mode="frame",
                 n_layers=2)
    params = model.init(jax.random.PRNGKey(0), h, x, nbr)
    h_ref, x_ref = model.apply(params, h, x, nbr)
    h_pal, x_pal = egnn_forward_pallas(params, h, x, nbr, tile_t=tile,
                                       interpret=True, window=window)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=5e-5, rtol=1e-4)
