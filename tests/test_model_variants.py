"""Tests for the model-zoo variants (PointNet, clean EGNN, GCL family, GCN)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_equi_graph_registration_tpu.data.synthetic import random_rotation
from se3_equi_graph_registration_tpu.models import variants
from se3_equi_graph_registration_tpu.models.pointnet import PointNet
from se3_equi_graph_registration_tpu.ops import knn


def _inputs(rng, b=2, n=64, k=8, c=16):
    h = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    nbr = jax.vmap(lambda p: knn.knn_graph(p, k))(x)
    return h, x, nbr


def test_pointnet_encoder(rng):
    _, x, nbr = _inputs(rng)
    model = PointNet(hidden_channels=16, out_channels=24)
    params = model.init(jax.random.PRNGKey(0), x, nbr)
    out = model.apply(params, x, nbr)
    assert out.shape == (2, 64, 24)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pointnet_translation_invariant(rng):
    """Messages use only relative positions → translation invariance."""
    _, x, nbr = _inputs(rng, b=1)
    model = PointNet(hidden_channels=16, out_channels=24)
    params = model.init(jax.random.PRNGKey(0), x, nbr)
    out1 = model.apply(params, x, nbr)
    out2 = model.apply(params, x + 5.0, nbr)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_so3_tensor_product_rotation_invariant(rng):
    """On ORTHONORMAL frames (the layer's actual input in the reference —
    edge SO(3) frames) M Mᵀ = I, so rotating the frame (M → RM keeps
    M Mᵀ → R M Mᵀ Rᵀ = I) leaves the layer output unchanged."""
    layer = variants.SO3TensorProductLayer(3, 8)
    frames = []
    for i in range(10):
        frames.append(random_rotation(np.random.default_rng(i)).reshape(9))
    frames = jnp.asarray(np.stack(frames), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), frames)
    R = jnp.asarray(random_rotation(np.random.default_rng(1)), jnp.float32)
    M = frames.reshape(10, 3, 3)
    rotated = jnp.einsum("ij,njk->nik", R, M).reshape(10, 9)
    out1 = layer.apply(params, frames)
    out2 = layer.apply(params, rotated)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_clean_egnn_forward_and_grads(rng):
    h, x, nbr = _inputs(rng)
    model = variants.CleanEGNN(in_node_nf=16, hidden_nf=32, out_node_nf=32,
                               n_layers=2)
    params = model.init(jax.random.PRNGKey(0), h, x, nbr)
    h2, x2 = model.apply(params, h, x, nbr)
    assert h2.shape == (2, 64, 32) and x2.shape == (2, 64, 3)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, h, x, nbr)[0] ** 2))(params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))


def test_gcl_and_radial_field(rng):
    h, x, nbr = _inputs(rng)
    gcl = variants.GCL(hidden_nf=32)
    p = gcl.init(jax.random.PRNGKey(0), h, nbr)
    out = gcl.apply(p, h, nbr)
    assert out.shape == h.shape

    rf = variants.GCLrf(hidden_nf=16)
    p2 = rf.init(jax.random.PRNGKey(0), x, nbr)
    x2 = rf.apply(p2, x, nbr)
    assert x2.shape == x.shape
    # radial field is rotation-equivariant
    R = jnp.asarray(random_rotation(np.random.default_rng(2)), jnp.float32)
    x2r = rf.apply(p2, x @ R.T, nbr)
    np.testing.assert_allclose(np.asarray(x2r), np.asarray(x2 @ R.T), atol=2e-4)


def test_clof_gcl_equivariance(rng):
    h, x, nbr = _inputs(rng, b=1)
    layer = variants.ClofGCL(hidden_nf=32)
    params = layer.init(jax.random.PRNGKey(0), h, x, nbr)
    h1, x1 = layer.apply(params, h, x, nbr)
    R = jnp.asarray(random_rotation(np.random.default_rng(3)), jnp.float32)
    h2, x2 = layer.apply(params, h, x @ R.T, nbr)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1 @ R.T), atol=2e-4)


def test_legacy_gcn_path(rng):
    h, x, _ = _inputs(rng, b=2, n=32)
    adj = variants.build_gaussian_adjacency(x, sigma=0.8)
    assert adj.shape == (2, 32, 32)
    np.testing.assert_allclose(np.asarray(adj), np.asarray(adj.swapaxes(1, 2)),
                               atol=1e-5)
    layer = variants.GraphConvolution(out_features=20)
    p = layer.init(jax.random.PRNGKey(0), h, adj)
    out = layer.apply(p, h, adj)
    assert out.shape == (2, 32, 20)
    pooled = variants.GlobalPooling().apply({}, out)
    assert pooled.shape == (2, 40)


def test_egcl_vel_equivariance(rng):
    """Velocity layer: rotation-equivariant in both x and v."""
    h, x, nbr = _inputs(rng, b=1)
    v = jnp.asarray(rng.standard_normal(x.shape) * 0.1, jnp.float32)
    layer = variants.EGCLVel(hidden_nf=32)
    params = layer.init(jax.random.PRNGKey(0), h, x, v, nbr)
    h1, x1, v1 = layer.apply(params, h, x, v, nbr)
    R = jnp.asarray(random_rotation(np.random.default_rng(4)), jnp.float32)
    h2, x2, v2 = layer.apply(params, h, x @ R.T, v @ R.T, nbr)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1 @ R.T), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1 @ R.T), atol=2e-4)
