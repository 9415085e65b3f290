"""Golden parity: converted shipped checkpoints vs an independent torch oracle.

The strongest correctness evidence this framework has: load the reference's
trained `checkpoint-3dmatch.pth`, run the JAX model in 'cluster' direction
(torch_cluster edge-orientation parity), and match per-stage activations and
the final (R, t) of a plain-torch oracle of the documented reference semantics
to fp32 tolerance.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from se3_equi_graph_registration_tpu.models import EGNN, RegistrationModel  # noqa: E402
from se3_equi_graph_registration_tpu.ops import knn  # noqa: E402
from se3_equi_graph_registration_tpu.train.checkpoints import (  # noqa: E402
    convert_reference_checkpoint,
)

import torch_oracle  # noqa: E402

CKPT = "/root/reference/checkpoints/checkpoint-3dmatch.pth"
needs_ckpt = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="reference checkpoint not present")


def _synthetic_pair(rng, n=256, c=32):
    src = rng.standard_normal((n, 3)).astype(np.float32)
    tgt = rng.standard_normal((n, 3)).astype(np.float32)
    f_src = rng.standard_normal((n, c)).astype(np.float32)
    f_tgt = rng.standard_normal((n, c)).astype(np.float32)
    labels = (rng.uniform(size=n) < 0.6).astype(np.float32)
    return src, tgt, f_src, f_tgt, labels


@needs_ckpt
def test_egnn_activations_match_oracle(rng):
    n, k = 256, 16
    src, _, f_src, _, _ = _synthetic_pair(rng, n)

    sd = torch_oracle.load_state_dict(CKPT)
    xt = torch.from_numpy(src)
    ht = torch.from_numpy(f_src)
    row, col = torch_oracle.knn_edges(xt, k)
    e_attr = torch.ones(row.shape[0], 1)
    h_ref, x_ref = torch_oracle.egnn_forward(sd, ht, xt, row, col, e_attr,
                                             prefix="egnn.")

    # JAX side: same graph (from our dense knn), cluster direction
    nbr = knn.knn_graph(jnp.asarray(src), k)
    # verify both sides picked identical edge sets
    np.testing.assert_array_equal(
        np.sort(np.asarray(nbr), axis=1),
        np.sort(row.numpy().reshape(n, k), axis=1))

    params = convert_reference_checkpoint(CKPT)
    egnn_params = {"params": params["params"]["egnn"]}
    model = EGNN(direction="cluster", **{})
    h_jax, x_jax = model.apply(egnn_params, jnp.asarray(f_src), jnp.asarray(src), nbr)

    np.testing.assert_allclose(np.asarray(h_jax), h_ref.numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x_jax), x_ref.numpy(), atol=2e-4, rtol=1e-4)


@needs_ckpt
def test_full_head_matches_oracle(rng):
    n, k, top_k = 256, 16, 64
    src, tgt, f_src, f_tgt, labels = _synthetic_pair(rng, n)

    sd = torch_oracle.load_state_dict(CKPT)
    edges_s = torch_oracle.knn_edges(torch.from_numpy(src), k)
    edges_t = torch_oracle.knn_edges(torch.from_numpy(tgt), k)
    ref = torch_oracle.head_forward(
        sd, torch.from_numpy(f_src), torch.from_numpy(src), edges_s,
        torch.from_numpy(f_tgt), torch.from_numpy(tgt), edges_t,
        torch.from_numpy(labels), top_k=top_k)

    params = convert_reference_checkpoint(CKPT)
    model = RegistrationModel(num_nodes=n, in_node_nf=32, hidden_nf=32,
                              top_k=top_k, direction="cluster")
    nbr_s = knn.knn_graph(jnp.asarray(src), k)[None]
    nbr_t = knn.knn_graph(jnp.asarray(tgt), k)[None]
    out = model.apply(params, jnp.asarray(f_src)[None], jnp.asarray(src)[None], nbr_s,
                      jnp.asarray(f_tgt)[None], jnp.asarray(tgt)[None], nbr_t,
                      jnp.asarray(labels)[None])

    np.testing.assert_allclose(np.asarray(out.h_src[0]), ref["h_src"].numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.similarity[0]), ref["sim"].numpy(),
                               atol=5e-3, rtol=1e-3)
    # top-k index sets may differ on near-ties; compare score values at shared idx
    np.testing.assert_array_equal(np.asarray(out.top_indices[0]),
                                  ref["top_idx"].numpy())
    np.testing.assert_allclose(np.asarray(out.scores[0]), ref["scores"].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.R[0]), ref["R"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.t[0]), ref["t"].numpy(), atol=1e-4)


def _jax_inputs(src, tgt, f_src, f_tgt, labels, k):
    nbr_s = knn.knn_graph(jnp.asarray(src), k)[None]
    nbr_t = knn.knn_graph(jnp.asarray(tgt), k)[None]
    return (jnp.asarray(f_src)[None], jnp.asarray(src)[None], nbr_s,
            jnp.asarray(f_tgt)[None], jnp.asarray(tgt)[None], nbr_t,
            jnp.asarray(labels)[None])


@needs_ckpt
@pytest.mark.parametrize("literal", [False, True])
def test_eval_fusion_head_matches_oracle(rng, literal):
    """The eval head that produces every published metric
    (/root/reference/src/eval_egnn_metrics.py:594-827): (R, t, fused weights,
    pred scores) parity against the torch oracle with trained weights."""
    n, k, top_k = 256, 16, 128
    src, tgt, f_src, f_tgt, labels = _synthetic_pair(rng, n)

    sd = torch_oracle.load_state_dict(CKPT)
    edges_s = torch_oracle.knn_edges(torch.from_numpy(src), k)
    edges_t = torch_oracle.knn_edges(torch.from_numpy(tgt), k)
    ref = torch_oracle.eval_head_forward(
        sd, torch.from_numpy(f_src), torch.from_numpy(src), edges_s,
        torch.from_numpy(f_tgt), torch.from_numpy(tgt), edges_t,
        top_k=top_k, literal=literal)

    params = convert_reference_checkpoint(CKPT)
    model = RegistrationModel(num_nodes=n, in_node_nf=32, hidden_nf=32,
                              top_k=top_k, direction="cluster",
                              head_mode="eval_fusion", fusion_literal=literal)
    out = model.apply(params, *_jax_inputs(src, tgt, f_src, f_tgt, labels, k))

    np.testing.assert_array_equal(np.asarray(out.top_indices[0]),
                                  ref["top_idx"].numpy())
    np.testing.assert_allclose(np.asarray(out.scores[0]), ref["pred"].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.weights[0]), ref["weights"].numpy(),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.R[0]), ref["R"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.t[0]), ref["t"].numpy(), atol=1e-4)


def test_fuse_scores_covers_all_branches():
    """Unit parity of the fusion rule itself on engineered values that hit
    every branch (confident/unconfident x cond1/cond2/neither), both modes —
    the checkpoint test above can't force the trained logits into the fusion
    window."""
    from se3_equi_graph_registration_tpu.models import fuse_scores

    pred = np.array([[0.8, 0.3, 2.5, 0.9, 0.6, 25.0]], np.float32)
    raw = np.array([[0.5, 0.9, 0.1, 0.95, 0.7, 1.0]], np.float32)
    for literal in (False, True):
        got = np.asarray(fuse_scores(jnp.asarray(pred), jnp.asarray(raw),
                                     literal=literal))
        pf = np.full_like(pred, pred[0, 0]) if literal else pred
        cond = (pf > 0.5) & ((np.abs(pf - 1.0) < raw) | (pf < raw))
        np.testing.assert_array_equal(got, np.where(cond, pf, raw))
    # sanity: the engineered values really do exercise both outcomes
    assert cond.any() and (~cond).any()


# ---------------------------------------------------------------------------
# Dual oracle: the reference's OWN classes, imported read-only at test time
# (tests/reference_oracle.py), eliminate any shared-misreading risk between
# SURVEY.md, torch_oracle.py, and the JAX model.
# ---------------------------------------------------------------------------

def _ref_edges(src, tgt, k):
    es = torch_oracle.knn_edges(torch.from_numpy(src), k)
    et = torch_oracle.knn_edges(torch.from_numpy(tgt), k)
    edges_s = torch.stack([torch.stack(es)], 0)          # [1, 2, E]
    edges_t = torch.stack([torch.stack(et)], 0)
    e_attr = torch.ones(1, es[0].shape[0], 1)
    return es, et, edges_s, edges_t, e_attr


@needs_ckpt
def test_train_head_matches_reference_code(rng):
    """JAX model vs the imported reference CrossAttentionPoseRegression
    (train variant, /root/reference/src/3dmatch_train_egnn_with_batch.py:585)."""
    import reference_oracle

    n, k = 256, 16
    src, tgt, f_src, f_tgt, labels = _synthetic_pair(rng, n)
    head = reference_oracle.build_head(reference_oracle.train_module(), CKPT,
                                       num_nodes=n)
    _, _, edges_s, edges_t, e_attr = _ref_edges(src, tgt, k)
    with torch.no_grad(), reference_oracle.quiet():
        ref = head(torch.from_numpy(f_src)[None], torch.from_numpy(src)[None],
                   edges_s, e_attr,
                   torch.from_numpy(f_tgt)[None], torch.from_numpy(tgt)[None],
                   edges_t, e_attr,
                   None, torch.from_numpy(labels)[None], torch.eye(4)[None])
    R_ref, t_ref, h_src_ref, x_src_ref = ref[0], ref[1], ref[4], ref[5]

    params = convert_reference_checkpoint(CKPT)
    model = RegistrationModel(num_nodes=n, in_node_nf=32, hidden_nf=32,
                              top_k=128, direction="cluster")
    out = model.apply(params, *_jax_inputs(src, tgt, f_src, f_tgt, labels, k))

    np.testing.assert_allclose(np.asarray(out.h_src[0]), h_src_ref[0].numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.x_src[0]), x_src_ref[0].numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.R[0]), R_ref[0].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.t[0]), t_ref[0].numpy(), atol=1e-4)


@needs_ckpt
def test_eval_head_literal_matches_reference_code(rng):
    """fusion_literal=True vs the imported reference eval head
    (/root/reference/src/eval_egnn_metrics.py:594-827), trained weights."""
    import reference_oracle

    n, k = 256, 16
    src, tgt, f_src, f_tgt, labels = _synthetic_pair(rng, n)
    head = reference_oracle.build_head(reference_oracle.eval_module(), CKPT,
                                       num_nodes=n)
    _, _, edges_s, edges_t, e_attr = _ref_edges(src, tgt, k)
    with torch.no_grad(), reference_oracle.quiet():
        ref = head(torch.from_numpy(f_src)[None], torch.from_numpy(src)[None],
                   edges_s, e_attr,
                   torch.from_numpy(f_tgt)[None], torch.from_numpy(tgt)[None],
                   edges_t, e_attr,
                   None, torch.from_numpy(labels)[None], torch.eye(4)[None])
    R_ref, t_ref = ref[0], ref[1]

    params = convert_reference_checkpoint(CKPT)
    model = RegistrationModel(num_nodes=n, in_node_nf=32, hidden_nf=32,
                              top_k=128, direction="cluster",
                              head_mode="eval_fusion", fusion_literal=True)
    out = model.apply(params, *_jax_inputs(src, tgt, f_src, f_tgt, labels, k))

    np.testing.assert_allclose(np.asarray(out.R[0]), R_ref[0].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.t[0]), t_ref[0].numpy(), atol=1e-4)


@needs_ckpt
def test_torch_oracle_matches_reference_code(rng):
    """The hand-written oracle must be bit-exact against the imported
    reference train head — this pins torch_oracle.py itself."""
    import reference_oracle

    n, k = 192, 12
    src, tgt, f_src, f_tgt, labels = _synthetic_pair(rng, n)
    head = reference_oracle.build_head(reference_oracle.train_module(), CKPT,
                                       num_nodes=n)
    es, et, edges_s, edges_t, e_attr = _ref_edges(src, tgt, k)
    with torch.no_grad(), reference_oracle.quiet():
        ref = head(torch.from_numpy(f_src)[None], torch.from_numpy(src)[None],
                   edges_s, e_attr,
                   torch.from_numpy(f_tgt)[None], torch.from_numpy(tgt)[None],
                   edges_t, e_attr,
                   None, torch.from_numpy(labels)[None], torch.eye(4)[None])

    sd = torch_oracle.load_state_dict(CKPT)
    mine = torch_oracle.head_forward(
        sd, torch.from_numpy(f_src), torch.from_numpy(src), es,
        torch.from_numpy(f_tgt), torch.from_numpy(tgt), et,
        torch.from_numpy(labels), top_k=128)

    assert torch.equal(ref[4][0], mine["h_src"])
    assert torch.equal(ref[5][0], mine["x_src"])
    assert torch.equal(ref[0][0], mine["R"])
    assert torch.equal(ref[1][0], mine["t"])


@needs_ckpt
def test_no_encoder_checkpoint_also_converts():
    path = "/root/reference/checkpoints/checkpoint-3dmatch-no-encoder.pth"
    if not os.path.exists(path):
        pytest.skip("no-encoder checkpoint absent")
    params = convert_reference_checkpoint(path)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    # live parameters only: the shared EGNN + score MLP (the checkpoint's
    # extra ~75K sit in dead aux heads and a duplicated EGNN copy)
    assert 20_000 < n_params < 60_000


def test_export_reference_checkpoint_roundtrip(tmp_path):
    """flax -> .pth -> flax round-trips bit-exactly, and the exported file
    loads STRICT into the reference's own classes (the reverse-migration
    path: weights trained here flow back into the reference ecosystem)."""
    from se3_equi_graph_registration_tpu.train.checkpoints import (
        export_reference_checkpoint)

    params = convert_reference_checkpoint(CKPT)
    out = str(tmp_path / "exported.pth")
    export_reference_checkpoint(params, out, epoch=21)

    # bit-exact tensor round trip through the torch schema
    back = convert_reference_checkpoint(out)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, back)

    # key-set parity with a real reference checkpoint (strict-load superset)
    import torch
    ours = torch.load(out, map_location="cpu", weights_only=False)
    ref = torch.load(CKPT, map_location="cpu", weights_only=False)
    assert set(ours["egnn_state_dict"]) == set(ref["egnn_state_dict"])
    assert set(ours["cross_attention_state_dict"]) == \
        set(ref["cross_attention_state_dict"])
    assert ours["epoch"] == 21

    # the reference's own modules load it strict=True
    import reference_oracle
    head = reference_oracle.build_head(reference_oracle.train_module(), out,
                                       num_nodes=64)
    assert head is not None
