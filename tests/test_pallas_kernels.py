"""Pallas kernel tests (interpret mode on CPU; compiled parity is exercised on
real TPU by bench/verify runs)."""
import jax
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
