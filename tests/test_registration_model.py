"""End-to-end RegistrationModel tests on synthetic pairs."""
import jax
import jax.numpy as jnp
import numpy as np

from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
from se3_equi_graph_registration_tpu.models import RegistrationModel
from se3_equi_graph_registration_tpu.ops import knn
from se3_equi_graph_registration_tpu.train import losses, metrics


def _prep(rng, b=2, n=256, k=8, c=16):
    batch = make_pair_batch(rng, batch=b, n=n, feat_dim=c, noise=0.005)
    nbr_src = jax.vmap(lambda xx: knn.knn_graph(xx, k))(jnp.asarray(batch.src_pts))
    nbr_tgt = jax.vmap(lambda xx: knn.knn_graph(xx, k))(jnp.asarray(batch.tgt_pts))
    return batch, nbr_src, nbr_tgt


def test_forward_shapes_and_losses(rng):
    b, n, k, c = 2, 256, 8, 16
    batch, nbr_src, nbr_tgt = _prep(rng, b, n, k, c)
    model = RegistrationModel(num_nodes=n, in_node_nf=c, hidden_nf=32, top_k=64)
    args = (jnp.asarray(batch.src_feat), jnp.asarray(batch.src_pts), nbr_src,
            jnp.asarray(batch.tgt_feat), jnp.asarray(batch.tgt_pts), nbr_tgt,
            jnp.asarray(batch.labels))
    params = model.init(jax.random.PRNGKey(0), *args)
    out = jax.jit(model.apply)(params, *args)

    assert out.R.shape == (b, 3, 3)
    assert out.t.shape == (b, 3)
    assert out.scores.shape == (b, 64)
    # R must be a proper rotation
    RtR = np.asarray(jnp.einsum("bij,bik->bjk", out.R, out.R))
    for bb in range(b):
        np.testing.assert_allclose(RtR[bb], np.eye(3), atol=1e-4)
        assert float(jnp.linalg.det(out.R[bb])) > 0.99

    lb = losses.total_loss(out, jnp.asarray(batch.gt_pose), jnp.asarray(batch.labels))
    for name, v in lb._asdict().items():
        assert np.isfinite(float(v)), name


def test_eval_fusion_head_runs(rng):
    b, n, k, c = 1, 256, 8, 16
    batch, nbr_src, nbr_tgt = _prep(rng, b, n, k, c)
    model = RegistrationModel(num_nodes=n, in_node_nf=c, hidden_nf=32, top_k=64,
                              head_mode="eval_fusion")
    args = (jnp.asarray(batch.src_feat), jnp.asarray(batch.src_pts), nbr_src,
            jnp.asarray(batch.tgt_feat), jnp.asarray(batch.tgt_pts), nbr_tgt,
            jnp.asarray(batch.labels))
    params = model.init(jax.random.PRNGKey(0), *args)
    out = jax.jit(model.apply)(params, *args)
    assert out.R.shape == (b, 3, 3)
    assert np.all(np.isfinite(np.asarray(out.R)))
    assert float(jnp.linalg.det(out.R[0])) > 0.99


def test_batch_consistency(rng):
    """Batched forward must equal per-element forward — the property the
    reference's batch>1 path violates (README.md:19)."""
    b, n, k, c = 3, 128, 8, 16
    batch, nbr_src, nbr_tgt = _prep(rng, b, n, k, c)
    model = RegistrationModel(num_nodes=n, in_node_nf=c, hidden_nf=32, top_k=32)
    args = (jnp.asarray(batch.src_feat), jnp.asarray(batch.src_pts), nbr_src,
            jnp.asarray(batch.tgt_feat), jnp.asarray(batch.tgt_pts), nbr_tgt,
            jnp.asarray(batch.labels))
    params = model.init(jax.random.PRNGKey(0), *args)
    out_full = model.apply(params, *args)
    for bb in range(b):
        out_one = model.apply(
            params,
            args[0][bb:bb+1], args[1][bb:bb+1], args[2][bb:bb+1],
            args[3][bb:bb+1], args[4][bb:bb+1], args[5][bb:bb+1],
            args[6][bb:bb+1])
        np.testing.assert_allclose(np.asarray(out_one.R[0]), np.asarray(out_full.R[bb]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out_one.h_src[0]),
                                   np.asarray(out_full.h_src[bb]), atol=1e-4)


def test_training_step_reduces_loss(rng):
    """A few SGD steps on one synthetic batch should reduce the total loss."""
    import optax
    b, n, k, c = 2, 128, 8, 16
    batch, nbr_src, nbr_tgt = _prep(rng, b, n, k, c)
    model = RegistrationModel(num_nodes=n, in_node_nf=c, hidden_nf=32, top_k=32)
    args = (jnp.asarray(batch.src_feat), jnp.asarray(batch.src_pts), nbr_src,
            jnp.asarray(batch.tgt_feat), jnp.asarray(batch.tgt_pts), nbr_tgt,
            jnp.asarray(batch.labels))
    params = model.init(jax.random.PRNGKey(0), *args)
    gt = jnp.asarray(batch.gt_pose)
    lbl = jnp.asarray(batch.labels)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            out = model.apply(pp, *args)
            return losses.total_loss(out, gt, lbl).total
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    first = None
    for i in range(8):
        params, opt_state, l = step(params, opt_state)
        if first is None:
            first = float(l)
    assert float(l) < first


def test_cosine_weight_mode_avoids_softmax_saturation(rng):
    """weight_mode='cosine' bounds the Kabsch weight scores so the softmax
    cannot saturate to one-hot (which freezes R at identity through
    degenerate H — the reference's raw-dot formula does this whenever
    post-EGNN feature norms grow, measurably at init already)."""
    b, n, k, c = 2, 256, 8, 16
    batch, nbr_src, nbr_tgt = _prep(rng, b, n, k, c)
    args = (jnp.asarray(batch.src_feat), jnp.asarray(batch.src_pts), nbr_src,
            jnp.asarray(batch.tgt_feat), jnp.asarray(batch.tgt_pts), nbr_tgt,
            jnp.asarray(batch.labels))

    weights = {}
    for mode in ("dot", "cosine"):
        model = RegistrationModel(num_nodes=n, in_node_nf=c, hidden_nf=32,
                                  top_k=64, weight_mode=mode)
        params = model.init(jax.random.PRNGKey(0), *args)
        out = model.apply(params, *args)
        weights[mode] = np.asarray(out.weights)
        assert np.all(np.isfinite(np.asarray(out.R)))
    # raw dots saturate at init; cosine stays spread over the inliers
    assert weights["dot"].max() > 0.5
    assert weights["cosine"].max() < 0.1
    # cosine solves the (noisy-inlier) synthetic pose at init already
    model = RegistrationModel(num_nodes=n, in_node_nf=c, hidden_nf=32,
                              top_k=64, weight_mode="cosine")
    params = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(params, *args)
    gt_R = np.asarray(batch.gt_pose)[:, :3, :3]
    for bb in range(b):
        tr = np.clip((np.trace(gt_R[bb].T @ np.asarray(out.R[bb])) - 1) / 2, -1, 1)
        assert np.degrees(np.arccos(tr)) < 10.0


def test_top_k_equals_n_shortcut(rng):
    """KITTI head config (top_k = num_nodes, kitti driver :663): selection
    must cover every index exactly once and skip the sort."""
    b, n, k, c = 2, 128, 8, 16
    batch, nbr_src, nbr_tgt = _prep(rng, b, n, k, c)
    args = (jnp.asarray(batch.src_feat), jnp.asarray(batch.src_pts), nbr_src,
            jnp.asarray(batch.tgt_feat), jnp.asarray(batch.tgt_pts), nbr_tgt,
            jnp.asarray(batch.labels))
    model = RegistrationModel(num_nodes=n, in_node_nf=c, hidden_nf=32, top_k=n)
    params = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(params, *args)
    assert out.scores.shape == (b, n)
    for bb in range(b):
        np.testing.assert_array_equal(np.sort(np.asarray(out.top_indices[bb])),
                                      np.arange(n))
    # scores at identity order equal a full-sort gather re-sorted back
    np.testing.assert_array_equal(np.asarray(out.top_labels),
                                  np.asarray(batch.labels))


def test_full_model_rotation_equivariance(rng):
    """SO(3) property at the MODEL level (the reference only tests layers):
    rotating the target cloud by Q must transform the predicted pose as
    R' = Q R, t' = Q t, with features/similarity invariant. Requires
    so3_mode='invariant' — the reference's 'frame' mode feeds raw frame
    axes (which rotate with the input) into the edge MLP, so its h-stream
    is NOT rotation-invariant (documented in ops/edge_geometry.py); neither
    mode is translation-invariant (position dot products about the origin,
    reference :181)."""
    from scipy.spatial.transform import Rotation

    b, n, k, c = 2, 256, 8, 16
    batch, nbr_src, nbr_tgt = _prep(rng, b, n, k, c)
    model = RegistrationModel(num_nodes=n, in_node_nf=c, hidden_nf=32,
                              top_k=64, weight_mode="cosine",
                              so3_mode="invariant")
    args = (jnp.asarray(batch.src_feat), jnp.asarray(batch.src_pts), nbr_src,
            jnp.asarray(batch.tgt_feat), jnp.asarray(batch.tgt_pts), nbr_tgt,
            jnp.asarray(batch.labels))
    params = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(params, *args)

    Q = jnp.asarray(Rotation.from_euler("xyz", [0.7, -0.3, 1.1]).as_matrix(),
                    jnp.float32)
    tgt_rot = jnp.einsum("ij,bnj->bni", Q, args[4])
    # same graph: k-NN is invariant under rotation (distances preserved)
    out2 = model.apply(params, args[0], args[1], args[2],
                       args[3], tgt_rot, args[5], args[6])

    # features and similarity are rotation-INVARIANT
    np.testing.assert_allclose(np.asarray(out2.h_tgt), np.asarray(out.h_tgt),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out2.similarity),
                               np.asarray(out.similarity), atol=5e-3, rtol=1e-3)
    # the pose transforms EQUIVARIANTLY
    R_expected = np.einsum("ij,bjk->bik", np.asarray(Q), np.asarray(out.R))
    t_expected = np.einsum("ij,bj->bi", np.asarray(Q), np.asarray(out.t))
    np.testing.assert_allclose(np.asarray(out2.R), R_expected, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out2.t), t_expected, atol=2e-3)


def test_morton_fast_path_small_n_window_clamp(rng):
    """fast_tpu_config at N < default window (384): the engine clamps the
    curve window to the cloud size instead of asserting (serving at small
    compiled shapes). CPU runs the XLA window twin + interpret-mode kernels."""
    from se3_equi_graph_registration_tpu.train import engine

    b, n, c = 2, 256, 16
    cfg = engine.fast_tpu_config(num_nodes=n, k=8, in_node_nf=c, hidden_nf=32,
                                 top_k=64)
    model = engine.build_model(cfg)
    batch = make_pair_batch(rng, batch=b, n=n, feat_dim=c)
    dev = engine.batch_to_device((batch.corr, batch.labels, batch.src_pts,
                                  batch.tgt_pts, batch.src_feat,
                                  batch.tgt_feat, batch.gt_pose))
    nbr0 = jnp.zeros((b, n, cfg.k), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dev["src_feat"],
                        dev["src_pts"], nbr0, dev["tgt_feat"], dev["tgt_pts"],
                        nbr0, dev["labels"])
    out = jax.jit(lambda p, bt: engine._apply_with_graphs(model, cfg, p, bt))(
        params, dev)
    assert out.R.shape == (b, 3, 3)
    assert np.all(np.isfinite(np.asarray(out.R)))
    assert np.all(np.isfinite(np.asarray(out.t)))
