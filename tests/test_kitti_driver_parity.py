"""KITTI end-to-end driver parity vs the imported reference KITTI driver.

VERDICT r3 Missing #4: KITTI had bit-exact SAMPLING parity only; the driver
variant — 33-d dims end to end (kitti_train_egnn_with_batch.py:1515-1518),
1-head E_GCL (the KITTI EGNN never forwards num_heads, :311 vs :186), head
top_k=2048 (:661), BCE-only corr loss without the 3DMatch sim term
(:752-766), train loss = corr + equi (:1089) — was represented as a config
preset but never run against the imported driver the way the 3DMatch harness
(tests/test_pipeline_parity.py) is.

No KITTI checkpoint ships with the reference, so parity is pinned at SHARED
random-init weights: the reference head is built, its state dict saved in the
reference .pth schema, and converted through `convert_reference_checkpoint`
(n_layers=3, num_heads=1, hidden=33) — which simultaneously proves the
converter generalizes beyond the trained 3DMatch geometry. This test caught
three kitti-preset bugs: hidden_nf left at 32, num_heads left at 4, and a
spurious sim=1.0 loss weight.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

import reference_oracle  # noqa: E402
from test_pipeline_parity import _load_ref_kitti  # noqa: E402
from se3_equi_graph_registration_tpu.data.kitti import (  # noqa: E402
    KITTIPairDataset)
from se3_equi_graph_registration_tpu.data.synthetic import (  # noqa: E402
    write_reference_kitti_archive)
from se3_equi_graph_registration_tpu.train import (  # noqa: E402
    config as cfg_lib, engine, losses as losses_lib)
from se3_equi_graph_registration_tpu.train.checkpoints import (  # noqa: E402
    convert_reference_checkpoint)

SEED = 1234
NUM_NODE = 2048   # the KITTI head hardcodes top_k=2048 INSIDE forward (:661),
                  # so the driver can only run at N >= 2048


def _stable_knn_graph(x, k, loop=True):
    """torch_cluster.knn_graph stand-in with STABLE lowest-index tie-breaking
    (lax.top_k semantics). KITTI oversampling (num_node=2048 from smaller
    clouds, replace=True) duplicates rows, so k-NN is tie-heavy; torch.topk's
    unspecified tie order then yields different in-degree distributions under
    'cluster' aggregation than our lax.top_k graphs — a tie-ORDER artifact,
    not a semantic difference (the reference's own CUDA knn tie order is
    equally arbitrary). Pinning both stacks to stable ties isolates the
    model/loss semantics this test is about."""
    import torch as _torch
    d = _torch.cdist(x, x)
    if not loop:
        d.fill_diagonal_(float("inf"))
    order = np.argsort(d.numpy(), axis=1, kind="stable")[:, :k]
    n = x.shape[0]
    col = _torch.arange(n).repeat_interleave(k)
    row = _torch.from_numpy(np.ascontiguousarray(order.reshape(-1)))
    return _torch.stack([row, col], dim=0)


@pytest.fixture(scope="module")
def kitti_mod():
    return reference_oracle.kitti_train_module()


@pytest.fixture(scope="module")
def rand_ckpt(tmp_path_factory, kitti_mod):
    """Random-init KITTI-config model saved in the reference .pth schema."""
    torch.manual_seed(7)
    egnn = kitti_mod.EGNN(in_node_nf=33, hidden_nf=33, out_node_nf=33,
                          in_edge_nf=1, device="cpu", n_layers=3,
                          residual=True, attention=True)
    head = kitti_mod.CrossAttentionPoseRegression(egnn, num_nodes=NUM_NODE,
                                                  hidden_nf=33, device="cpu")
    path = tmp_path_factory.mktemp("kitti_ckpt") / "kitti_rand.pth"
    torch.save({"egnn_state_dict": egnn.state_dict(),
                "cross_attention_state_dict": head.state_dict()}, str(path))
    return str(path), head.eval()


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_archive")
    write_reference_kitti_archive(str(root), n_train=2, n_val=1, n_test=1,
                                  n_points=600, seed=21)
    return str(root)


def _parity_cfg():
    import dataclasses
    eng = cfg_lib.preset("kitti").engine
    return dataclasses.replace(eng, num_nodes=NUM_NODE,
                               direction="cluster", knn_method="exact")


def _reference_forward(kitti_mod, head, item):
    """One driver step-0 forward: knn_graph(k=16, loop=True) per cloud →
    get_edges_batch → head(...) exactly as the train loop composes it
    (kitti_train_egnn_with_batch.py:966-1062)."""
    tt = [torch.from_numpy(np.ascontiguousarray(np.asarray(v))).unsqueeze(0)
          for v in item]
    corr, labels, src_pts, tgt_pts, src_feat, tgt_feat, gt_pose = tt
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        g0 = _stable_knn_graph(src_pts[0], 16, loop=True)
        g1 = _stable_knn_graph(tgt_pts[0], 16, loop=True)
        e0, ea0 = kitti_mod.get_edges_batch(g0, NUM_NODE, 1)
        e1, ea1 = kitti_mod.get_edges_batch(g1, NUM_NODE, 1)
        edges_0 = torch.stack(e0, dim=0)[None]
        edges_1 = torch.stack(e1, dim=0)[None]
        with reference_oracle.quiet(), torch.no_grad():
            (R, t, corr_loss, equi_loss, h_s, x_s, h_t, x_t, _lab) = head(
                src_feat, src_pts, edges_0, ea0[None],
                tgt_feat, tgt_pts, edges_1, ea1[None], corr, labels, gt_pose)
    finally:
        torch.Tensor.cuda = orig_cuda
    rot_l, trans_l = kitti_mod.pose_loss(R, t, gt_pose)
    return {"R": R, "t": t, "corr": corr_loss.mean().item(),
            "equi": equi_loss.item(),
            "total": (corr_loss.mean() + equi_loss.mean()).item(),
            "rot": rot_l.mean().item(), "trans": trans_l.mean().item()}


def test_kitti_driver_step0_matches_reference(kitti_mod, rand_ckpt,
                                              kitti_root):
    """disk → KITTI train-split sampling → graphs → 33-d 1-head KITTI head →
    loss composition: the imported driver's step-0 corr/equi/total (and the
    R/t the GT-weighted Kabsch produces) must equal our engine's on the same
    item with the converted weights."""
    ckpt_path, head = rand_ckpt
    dsmod = _load_ref_kitti()
    ds_ref = dsmod.KITTItrainVal(kitti_root, "train", descriptor="fpfh",
                                 num_node=NUM_NODE)
    np.random.seed(SEED)
    item = [np.asarray(v) for v in ds_ref[0]]
    ref = _reference_forward(kitti_mod, head, item)

    ours_ds = KITTIPairDataset(root=kitti_root, split="train",
                               descriptor="fpfh", num_node=NUM_NODE,
                               seed=SEED, legacy_sampling_rng=True)
    tup = tuple(np.asarray(v)[None] for v in ours_ds[0])
    batch = engine.batch_to_device(tup)
    cfg = _parity_cfg()
    assert cfg.hidden_nf == 33 and cfg.num_heads == 1 and cfg.top_k == 2048
    model = engine.build_model(cfg)   # train head
    params = convert_reference_checkpoint(ckpt_path, n_layers=3, num_heads=1,
                                          hidden=33)
    out = engine._apply_with_graphs(model, cfg, params, batch)
    lb = losses_lib.total_loss(out, batch["gt_pose"], batch["labels"],
                               cfg.loss_weights)

    # GT-weighted Kabsch pose from shared weights: same R/t both stacks
    np.testing.assert_allclose(np.asarray(out.R[0]),
                               ref["R"][0].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.t[0]),
                               ref["t"][0].numpy(), atol=1e-4)
    # loss components at random-init (BCE near ln 2, unsaturated logits)
    assert np.isclose(float(lb.corr), ref["corr"], rtol=1e-3), \
        (float(lb.corr), ref["corr"])
    assert np.isclose(float(lb.equi), ref["equi"], rtol=1e-3), \
        (float(lb.equi), ref["equi"])
    # the kitti preset's weights must compose corr + equi ONLY (:1089)
    assert np.isclose(float(lb.total), ref["total"], rtol=1e-3), \
        (float(lb.total), ref["total"])
    # validate-loop loss = rot + trans means (:1246-1250): same pose terms
    assert np.isclose(float(lb.rot), ref["rot"], atol=1e-3)
    assert np.isclose(float(lb.trans), ref["trans"], atol=1e-3)


def _flax_to_ref_named_kitti(tree: dict) -> dict:
    """flax param/grad pytree → reference state-dict names at the KITTI dims
    (33-d, 1 head). Same transpose-commutes-with-d/dW argument as the 3DMatch
    harness (tests/test_train_parity.py)."""
    from se3_equi_graph_registration_tpu.train.checkpoints import (
        _export_egnn_sd, _rt)
    sd = _export_egnn_sd(tree["params"]["egnn"], prefix="egnn.", n_layers=3,
                         num_heads=1, hidden=33)
    mlp = tree["params"]["mlp"]
    for i, name in ((0, "dense_0"), (2, "dense_1"), (4, "dense_2")):
        sd[f"mlp.{i}.weight"] = _rt(mlp[name]["kernel"])
        sd[f"mlp.{i}.bias"] = np.asarray(mlp[name]["bias"])
    return sd


LR = 1e-4


def _torch_one_step_kitti(kitti_mod, ckpt_path, item):
    """The reference KITTI training step, verbatim semantics: imported head
    forward, total = corr_loss.mean() + ssim_loss.mean()
    (kitti_train_egnn_with_batch.py:1089-1094), loss.backward() (:1095),
    Adam (:1381) step."""
    # build at the KITTI dims inline (reference_oracle.build_head hardwires
    # the 3DMatch 32-d/4-head geometry): same construction as the driver
    # (:1515-1518, :1608) — EGNN never forwards num_heads, so E_GCL runs the
    # 1-head default
    ck = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    egnn = kitti_mod.EGNN(in_node_nf=33, hidden_nf=33, out_node_nf=33,
                          in_edge_nf=1, device="cpu", n_layers=3,
                          residual=True, attention=True)
    egnn.load_state_dict(
        {k: v.float() for k, v in ck["egnn_state_dict"].items()}, strict=True)
    head = kitti_mod.CrossAttentionPoseRegression(egnn, num_nodes=NUM_NODE,
                                                  hidden_nf=33, device="cpu")
    head.load_state_dict(
        {k: v.float() for k, v in ck["cross_attention_state_dict"].items()},
        strict=True)
    tt = [torch.from_numpy(np.ascontiguousarray(np.asarray(v))).unsqueeze(0)
          for v in item]
    corr, labels, src_pts, tgt_pts, src_feat, tgt_feat, gt_pose = tt
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        g0 = _stable_knn_graph(src_pts[0], 16, loop=True)
        g1 = _stable_knn_graph(tgt_pts[0], 16, loop=True)
        e0, ea0 = kitti_mod.get_edges_batch(g0, NUM_NODE, 1)
        e1, ea1 = kitti_mod.get_edges_batch(g1, NUM_NODE, 1)
        edges_0 = torch.stack(e0, dim=0)[None]
        edges_1 = torch.stack(e1, dim=0)[None]
        opt = torch.optim.Adam(head.parameters(), lr=LR)   # :1381
        opt.zero_grad()
        with reference_oracle.quiet():
            out = head(src_feat, src_pts, edges_0, ea0[None],
                       tgt_feat, tgt_pts, edges_1, ea1[None],
                       corr, labels, gt_pose)
        corr_loss, equi_loss = out[2], out[3]
        loss = corr_loss.mean() + equi_loss.mean()         # :1089-1094
        loss.backward()                                    # :1095
        grads = {name: p.grad.detach().clone()
                 for name, p in head.named_parameters() if p.grad is not None}
        opt.step()
        post = {name: p.detach().clone()
                for name, p in head.named_parameters()}
    finally:
        torch.Tensor.cuda = orig_cuda
    return float(loss), grads, post


def _jax_one_step_kitti(ckpt_path, batch):
    """Our engine at the KITTI parity knobs: explicit grads (the same loss_fn
    make_train_step differentiates) + one make_train_step Adam step."""
    import jax.numpy as jnp
    import optax

    params = convert_reference_checkpoint(ckpt_path, n_layers=3, num_heads=1,
                                          hidden=33)
    cfg = _parity_cfg()
    model = engine.build_model(cfg)

    def loss_fn(p):
        out = engine._apply_with_graphs(model, cfg, p, batch)
        lb = losses_lib.total_loss(out, batch["gt_pose"], batch["labels"],
                                   cfg.loss_weights)
        return lb.total

    loss, grads = jax.value_and_grad(loss_fn)(params)
    loss = float(loss)

    opt = optax.adam(LR)  # same (β1, β2, eps) defaults as torch.optim.Adam
    state = engine.TrainState(params=params, opt_state=opt.init(params),
                              step=jnp.zeros((), jnp.int32))
    step = engine.make_train_step(model, opt, cfg)
    new_state, _ = step(state, batch)
    return loss, grads, jax.device_get(new_state.params)


@pytest.mark.slow
def test_kitti_one_step_training_matches_reference(kitti_mod, rand_ckpt,
                                                   kitti_root):
    """VERDICT r4 #5: the KITTI gradient path — value_and_grad through the
    33-d/1-head EGNN, the top_k=2048 similarity gather, the BCE corr term and
    the equivariance term (corr + equi composition, :1089), then one Adam
    update — per tensor vs `loss.backward(); optimizer.step()` in the imported
    KITTI driver. The concat width (66 vs 64) and the head count (1 vs 4)
    exercise different gradient plumbing than the 3DMatch harness."""
    ckpt_path, _head = rand_ckpt
    dsmod = _load_ref_kitti()
    ds_ref = dsmod.KITTItrainVal(kitti_root, "train", descriptor="fpfh",
                                 num_node=NUM_NODE)
    np.random.seed(SEED)
    item = [np.asarray(v) for v in ds_ref[0]]
    t_loss, t_grads, t_post = _torch_one_step_kitti(kitti_mod, ckpt_path, item)

    ours_ds = KITTIPairDataset(root=kitti_root, split="train",
                               descriptor="fpfh", num_node=NUM_NODE,
                               seed=SEED, legacy_sampling_rng=True)
    tup = tuple(np.asarray(v)[None] for v in ours_ds[0])
    batch = engine.batch_to_device(tup)
    j_loss, j_grads, j_post = _jax_one_step_kitti(ckpt_path, batch)

    # 1) step-0 total loss (corr + equi)
    assert np.isclose(j_loss, t_loss, rtol=1e-4, atol=1e-5), (j_loss, t_loss)

    # 2) per-tensor gradients: exactly the live parameter set gets gradient
    # on both sides (egnn + corr mlp; the head's dead aux modules get None in
    # torch and have no flax counterpart)
    j_named = _flax_to_ref_named_kitti(j_grads)
    assert set(t_grads) == set(j_named), (set(t_grads) ^ set(j_named))
    for name, tg in t_grads.items():
        a = np.asarray(j_named[name], np.float64).ravel()
        b = tg.numpy().astype(np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        scale = max(na, nb)
        assert scale > 0 or na == nb == 0, name
        if scale == 0:
            continue
        cos = float(np.dot(a, b) / (na * nb))
        rel = float(np.linalg.norm(a - b) / scale)
        assert cos >= 1 - 1e-5, (name, cos)
        assert rel <= 2e-3, (name, rel)

    # 3) post-Adam parameters: step-1 Adam updates are ≈ ±lr per weight, so
    # fp-noise sign flips on near-zero gradients bound divergence at 2·lr
    post_named = _flax_to_ref_named_kitti(j_post)
    deltas = []
    for name, tensor in post_named.items():
        d = np.abs(np.asarray(tensor, np.float64)
                   - t_post[name].numpy().astype(np.float64))
        deltas.append(d.max())
        assert d.max() <= 2.0 * LR * 1.05, (name, d.max())
    assert np.median(deltas) <= 0.5 * LR, np.median(deltas)


def test_kitti_cli_eval_runs_on_reference_archive(kitti_root, rand_ckpt,
                                                  tmp_path):
    """`cli eval --preset kitti` consumes the reference-schema KITTI archive
    with a converted 33-d checkpoint end to end (the driver-facing seam; the
    metric math itself is pinned by the 3DMatch harness, which shares the
    implementation)."""
    from se3_equi_graph_registration_tpu.train import cli

    ckpt_path, _head = rand_ckpt
    out = str(tmp_path / "evaluation_results.txt")
    cli.main([
        "eval", "--preset", "kitti", "--checkpoint", ckpt_path, "--set",
        f"data.root={kitti_root}", "data.num_node=256",
        "engine.num_nodes=256", "engine.top_k=256", "data.batch_size=1",
        "data.num_workers=1", f"data.seed={SEED}",
        "engine.direction=cluster", "engine.knn_method=exact",
        f"run.eval_output={out}",
    ])
    lines = open(out).read().strip().splitlines()
    got = {ln.split(":")[0]: float(ln.split(":")[1].split()[0])
           for ln in lines}
    assert np.isfinite(got["Average Rotation Error"])
    assert np.isfinite(got["Average Translation Error"])
