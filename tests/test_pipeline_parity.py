"""Pipeline-vs-pipeline parity harness (VERDICT r2 'Next round' #1).

The one seam no unit test covered: disk pkl → dataset sampling → k-NN graph →
eval-fusion head → per-pair metrics → report aggregation, through BOTH
implementations end to end. A synthesized archive in the reference's exact
on-disk schema (data/synthetic.py write_reference_*_archive) feeds

  (a) the IMPORTED reference pipeline: datasets/ThreeDMatch.py Test/TrainVal
      classes + src/eval_egnn_metrics.py evaluate_model with the shipped
      checkpoint (tests/reference_oracle.py import machinery), and
  (b) this framework's pipeline: ThreeDMatchPairDataset → engine eval step /
      `cli eval` with the parity knobs (direction=cluster, knn_method=exact,
      fusion_literal, legacy_sampling_rng) and the converted checkpoint.

Seeded sampling is matched EXACTLY (not bypassed): our legacy_sampling_rng
mode replays the reference's np.random call sequence per item, so
np.random.seed(seed+i) on the reference side and RandomState(seed+i) on ours
yield identical sampled indices — asserted bit-exact below, then the per-pair
RRE/RTE/recall/precision and the evaluation_results.txt summaries must agree
at fp32 tolerance.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

import reference_oracle  # noqa: E402
from se3_equi_graph_registration_tpu.data.synthetic import (  # noqa: E402
    write_reference_test_archive, write_reference_train_archive)
from se3_equi_graph_registration_tpu.data.threedmatch import (  # noqa: E402
    ThreeDMatchPairDataset)
from se3_equi_graph_registration_tpu.train import engine  # noqa: E402
from se3_equi_graph_registration_tpu.train.checkpoints import (  # noqa: E402
    convert_reference_checkpoint)

CKPT = "/root/reference/checkpoints/checkpoint-3dmatch.pth"
needs_ckpt = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="reference checkpoint not present")

NUM_NODE = 256      # sample_size through both pipelines (2048 in production)
SEED = 1234         # per-item sampling seed base on both sides
N_PAIRS = 4


def _load_ref_datasets():
    """Import the reference dataset module (read-only, test-time import)."""
    alias = "ref_datasets_threedmatch"
    if alias in sys.modules:
        return sys.modules[alias]
    spec = importlib.util.spec_from_file_location(
        alias, "/root/reference/datasets/ThreeDMatch.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[alias] = mod
    spec.loader.exec_module(mod)
    return mod


def _torch_knn_graph(x, k, loop=True, **_kw):
    """torch_cluster.knn_graph semantics (flow='source_to_target'):
    edge_index[0] = neighbor/source, edge_index[1] = center/target; loop=True
    keeps self-edges. The CPU stand-in for the CUDA dependency the reference
    eval loop calls (src/eval_egnn_metrics.py:1155-1158)."""
    d = torch.cdist(x, x)
    if not loop:
        d.fill_diagonal_(float("inf"))
    idx = torch.topk(d, k, largest=False).indices
    n = x.shape[0]
    col = torch.arange(n).repeat_interleave(k)
    row = idx.reshape(-1)
    return torch.stack([row, col], dim=0)


@pytest.fixture(scope="module")
def archive_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_archive")
    write_reference_test_archive(str(root), n_pairs=N_PAIRS, n_points=400,
                                 seed=7)
    write_reference_train_archive(str(root), n_train=3, n_val=1, n_points=400,
                                  seed=11)
    return str(root)


# ---------------------------------------------------------------------------
# Seam 1: the sampling/gather/remap stage — must match EXACTLY.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("split", ["test", "train", "val"])
def test_sampling_matches_reference_exactly(archive_root, split):
    dsmod = _load_ref_datasets()
    if split == "test":
        ref_ds = dsmod.ThreeDMatchTest(archive_root, "test",
                                       descriptor="fcgf", num_node=NUM_NODE)
    else:
        ref_ds = dsmod.ThreeDMatchTrainVal(archive_root, split,
                                           descriptor="fcgf",
                                           num_node=NUM_NODE)
    ours = ThreeDMatchPairDataset(root=archive_root, split=split,
                                  descriptor="fcgf", num_node=NUM_NODE,
                                  seed=SEED, legacy_sampling_rng=True)
    assert len(ref_ds) == len(ours)
    from se3_equi_graph_registration_tpu.data.sampling import (
        remap_correspondences)
    for i in range(len(ours)):
        np.random.seed(SEED + i)           # reference uses global np.random
        ref = [np.asarray(v) for v in ref_ds[i]]
        got = [np.asarray(v) for v in ours[i]]
        # corr: the reference TEST split returns the UNREMAPPED sampled rows
        # (ThreeDMatch.py:761 returns sampled_corr; the computed remapped_corr
        # is dropped) while TrainVal returns the remapped ones (:404). Ours
        # always remaps (the corr output is unused downstream in eval); pin
        # the exact relationship either way.
        if split == "test":
            np.testing.assert_array_equal(
                got[0], remap_correspondences(
                    ref[0].astype(np.int64)).astype(np.float32))
        else:
            np.testing.assert_array_equal(got[0], ref[0])
        for j in range(1, 7):              # labels, pts, feats, gt_pose
            np.testing.assert_array_equal(got[j], ref[j], err_msg=f"field {j}")


# ---------------------------------------------------------------------------
# Seam 2+3: full eval pipeline + metric aggregation.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def reference_eval(archive_root, tmp_path_factory):
    """Run the reference's OWN evaluate_model end-to-end on the archive:
    dataset sampling → knn_graph → get_edges_batch → score-fusion head →
    calculate_pose_error / registration_recall → evaluation_results.txt.
    Records per-pair metrics by wrapping the metric functions."""
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint not present")
    save_dir = str(tmp_path_factory.mktemp("ref_eval_out"))
    ref_eval = reference_oracle.eval_module()
    dsmod = _load_ref_datasets()
    ds = dsmod.ThreeDMatchTest(archive_root, "test", descriptor="fcgf",
                               num_node=NUM_NODE)
    model = reference_oracle.build_head(ref_eval, CKPT, num_nodes=NUM_NODE)

    per_pair = {"rre": [], "rte": [], "recall": [], "precision": []}
    orig = (ref_eval.knn_graph, ref_eval.calculate_pose_error,
            ref_eval.registration_recall, torch.Tensor.cuda)

    def rec_cpe(gt, pred):
        r = orig[1](gt, pred)
        per_pair["rre"].append(float(r[0]))
        per_pair["rte"].append(float(r[1]))
        return r

    def rec_rr(gt, pred, s, t):
        r = orig[2](gt, pred, s, t)
        per_pair["recall"].append(float(r[0]))
        per_pair["precision"].append(float(r[1]))
        return r

    def loader():
        for i in range(len(ds)):
            np.random.seed(SEED + i)
            item = ds[i]
            yield tuple(torch.from_numpy(np.ascontiguousarray(v)).unsqueeze(0)
                        for v in item)

    ref_eval.knn_graph = _torch_knn_graph
    ref_eval.calculate_pose_error = rec_cpe
    ref_eval.registration_recall = rec_rr
    # get_edges_batch hardcodes .cuda() (:397); run it on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with reference_oracle.quiet():
            with torch.no_grad():
                avg = ref_eval.evaluate_model(CKPT, save_dir, model, loader(),
                                              torch.device("cpu"))
    finally:
        (ref_eval.knn_graph, ref_eval.calculate_pose_error,
         ref_eval.registration_recall, torch.Tensor.cuda) = orig
    assert len(per_pair["rre"]) == N_PAIRS
    return {"avg": avg, "per_pair": per_pair,
            "results_txt": os.path.join(save_dir, "evaluation_results.txt")}


def _parity_cfg():
    return engine.EngineConfig(
        num_nodes=NUM_NODE, in_node_nf=32, top_k=128,
        direction="cluster", knn_method="exact", fusion_literal=True)


@needs_ckpt
def test_eval_pipeline_matches_reference_per_pair(archive_root, reference_eval):
    """disk → sampling → graph → eval-fusion head → per-pair metrics through
    OUR pipeline must reproduce the reference pipeline pair by pair."""
    cfg = _parity_cfg()
    model = engine.build_model(cfg, head_mode="eval_fusion")
    params = convert_reference_checkpoint(CKPT)
    eval_step = engine.make_eval_step(model, cfg)

    ds = ThreeDMatchPairDataset(root=archive_root, split="test",
                                descriptor="fcgf", num_node=NUM_NODE,
                                seed=SEED, legacy_sampling_rng=True)
    ours = {"rre": [], "rte": [], "recall": [], "precision": []}
    for i in range(len(ds)):
        tup = tuple(np.asarray(v)[None] for v in ds[i])
        m = eval_step(params, engine.batch_to_device(tup))
        ours["rre"].append(float(m["rot_err_deg"][0]))
        ours["rte"].append(float(m["trans_err_cm"][0]))
        ours["recall"].append(float(m["recall"][0]))
        ours["precision"].append(float(m["precision"][0]))

    ref = reference_eval["per_pair"]
    np.testing.assert_allclose(ours["rre"], ref["rre"], atol=0.05)      # deg
    np.testing.assert_allclose(ours["rte"], ref["rte"], atol=0.05)      # cm
    np.testing.assert_allclose(ours["recall"], ref["recall"], atol=2e-3)
    np.testing.assert_allclose(ours["precision"], ref["precision"], atol=2e-3)


@needs_ckpt
def test_cli_eval_summary_matches_reference_results(archive_root,
                                                    reference_eval, tmp_path):
    """The CLI end-to-end (`cli eval` with the parity knobs) must produce an
    evaluation_results.txt whose summary numbers equal the reference
    pipeline's — the report-aggregation seam (eval_egnn_metrics.py:1283-1298)."""
    from se3_equi_graph_registration_tpu.train import cli

    out = str(tmp_path / "evaluation_results.txt")
    cli.main([
        "eval", "--preset", "3dmatch", "--checkpoint", CKPT, "--set",
        f"data.root={archive_root}", f"data.num_node={NUM_NODE}",
        f"engine.num_nodes={NUM_NODE}", "data.batch_size=1",
        "data.num_workers=1", f"data.seed={SEED}",
        "data.legacy_sampling_rng=true", "engine.direction=cluster",
        "engine.knn_method=exact", "engine.fusion_literal=true",
        f"run.eval_output={out}",
    ])
    lines = open(out).read().strip().splitlines()
    got = {ln.split(":")[0]: float(ln.split(":")[1].split()[0])
           for ln in lines}
    avg = reference_eval["avg"]
    assert np.isclose(got["Average Rotation Error"],
                      avg["Average Rotation Error"], atol=0.05)
    assert np.isclose(got["Average Translation Error"],
                      avg["Average Translation Error"], atol=0.05)
    assert np.isclose(got["Average Registration Recall"],
                      avg["Average Recall"], atol=2e-3)
    assert np.isclose(got["Average F1 Score"],
                      avg["Average F1 Score"], atol=2e-3)


# ---------------------------------------------------------------------------
# KITTI family: same bit-exact sampling treatment.
# ---------------------------------------------------------------------------

class _NpCompat:
    """numpy proxy emulating the pre-1.16.3 `allow_pickle=True` np.load
    default the reference ran under: KITTItrainVal calls `np.load(f)` on a
    pickled dict inside a with-block and uses `.get()` after close
    (KITTI.py:229-243) — that only ever worked through np.load's EAGER pickle
    fallback, which modern numpy gates behind allow_pickle."""

    def __getattr__(self, name):
        return getattr(np, name)

    @staticmethod
    def load(f, **kw):
        kw.setdefault("allow_pickle", True)
        return np.load(f, **kw)


def _load_ref_kitti():
    alias = "ref_datasets_kitti"
    if alias in sys.modules:
        return sys.modules[alias]
    spec = importlib.util.spec_from_file_location(
        alias, "/root/reference/datasets/KITTI.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[alias] = mod
    spec.loader.exec_module(mod)
    mod.np = _NpCompat()
    return mod


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    from se3_equi_graph_registration_tpu.data.synthetic import (
        write_reference_kitti_archive)
    root = tmp_path_factory.mktemp("kitti_archive")
    write_reference_kitti_archive(str(root), n_train=3, n_val=1, n_test=3,
                                  n_points=400, seed=13)
    return str(root)


@pytest.mark.parametrize("split", ["test", "train", "val"])
def test_kitti_sampling_matches_reference_exactly(kitti_root, split):
    from se3_equi_graph_registration_tpu.data.kitti import KITTIPairDataset
    from se3_equi_graph_registration_tpu.data.sampling import (
        remap_correspondences)

    dsmod = _load_ref_kitti()
    if split == "test":
        # the reference KITTItest IGNORES its num_node arg and hardcodes
        # sample_num = 2048 inside __getitem__ (KITTI.py:522); ours honors
        # num_node, so compare at the hardcoded value
        ref_ds = dsmod.KITTItest(kitti_root, "test", descriptor="fpfh",
                                 num_node=64)
        num_node = 2048
    else:
        ref_ds = dsmod.KITTItrainVal(kitti_root, split, descriptor="fpfh",
                                     num_node=64)
        num_node = 64
    ours = KITTIPairDataset(root=kitti_root, split=split, descriptor="fpfh",
                            num_node=num_node, seed=SEED,
                            legacy_sampling_rng=True)
    assert len(ref_ds) == len(ours)
    for i in range(len(ours)):
        np.random.seed(SEED + i)
        ref = [np.asarray(v) for v in ref_ds[i]]
        got = [np.asarray(v) for v in ours[i]]
        # test split: reference returns the UNREMAPPED sampled corr rows
        # (KITTI.py:551 mirrors the 3DMatch test quirk); ours remaps
        if split == "test":
            np.testing.assert_array_equal(
                got[0], remap_correspondences(
                    ref[0].astype(np.int64)).astype(np.float32))
        else:
            np.testing.assert_array_equal(got[0], ref[0])
        for j in range(1, 7):
            np.testing.assert_array_equal(got[j], ref[j], err_msg=f"field {j}")


# ---------------------------------------------------------------------------
# Training-side pipeline parity: step-0 loss through BOTH stacks.
# ---------------------------------------------------------------------------

@needs_ckpt
def test_train_pipeline_loss_matches_reference(archive_root):
    """disk → train-split sampling → graphs → TRAIN head → loss composition:
    the reference driver's step-0 total (corr+sim from the head, + rot + trans
    means; 3dmatch_train_egnn_with_batch.py:1092-1120) must equal our
    engine's total_loss with the default LossWeights on the same item and the
    same converted checkpoint."""
    ref_train = reference_oracle.train_module()
    dsmod = _load_ref_datasets()
    ds_ref = dsmod.ThreeDMatchTrainVal(archive_root, "train",
                                       descriptor="fcgf", num_node=NUM_NODE)
    model_t = reference_oracle.build_head(ref_train, CKPT, num_nodes=NUM_NODE)

    np.random.seed(SEED)
    item = [np.asarray(v) for v in ds_ref[0]]
    tt = [torch.from_numpy(np.ascontiguousarray(v)).unsqueeze(0)
          for v in item]
    corr, labels, src_pts, tgt_pts, src_feat, tgt_feat, gt_pose = tt

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        g0 = _torch_knn_graph(src_pts[0], 16, loop=True)
        g1 = _torch_knn_graph(tgt_pts[0], 16, loop=True)
        e0, ea0 = ref_train.get_edges_batch(g0, NUM_NODE, 1)
        e1, ea1 = ref_train.get_edges_batch(g1, NUM_NODE, 1)
        edges_0 = torch.stack(e0, dim=0)[None]
        edges_1 = torch.stack(e1, dim=0)[None]
        with reference_oracle.quiet(), torch.no_grad():
            (rot_mat, translation, corr_sim_loss, equi_loss, h_s, x_s, h_t,
             x_t, _lab) = model_t(src_feat, src_pts, edges_0, ea0[None],
                                  tgt_feat, tgt_pts, edges_1, ea1[None],
                                  corr, labels, gt_pose)
        rot_l, trans_l = ref_train.pose_loss(rot_mat, translation, gt_pose)
        want_total = (corr_sim_loss.mean() + rot_l.mean()
                      + trans_l.mean()).item()
    finally:
        torch.Tensor.cuda = orig_cuda

    from se3_equi_graph_registration_tpu.data.threedmatch import (
        ThreeDMatchPairDataset)
    from se3_equi_graph_registration_tpu.train import losses as losses_lib
    ours_ds = ThreeDMatchPairDataset(root=archive_root, split="train",
                                     descriptor="fcgf", num_node=NUM_NODE,
                                     seed=SEED, legacy_sampling_rng=True)
    tup = tuple(np.asarray(v)[None] for v in ours_ds[0])
    batch = engine.batch_to_device(tup)
    cfg = engine.EngineConfig(num_nodes=NUM_NODE, in_node_nf=32, top_k=128,
                              direction="cluster", knn_method="exact")
    model = engine.build_model(cfg)   # train head
    params = convert_reference_checkpoint(CKPT)
    out = engine._apply_with_graphs(model, cfg, params, batch)
    lb = losses_lib.total_loss(out, batch["gt_pose"], batch["labels"],
                               cfg.loss_weights)
    # component tolerances: rot/trans/equi are tight (fp32 accumulation);
    # corr rides SATURATED BCE logits (mean ~22 on this random-feature data:
    # the loss is ~linear in |logit| where the sign is wrong, so torch-vs-jax
    # fp32 activation deltas pass through at full scale) — relative bound.
    # The top-128 selection itself matches the torch head EXACTLY (verified:
    # 128/128 overlap), so this is arithmetic noise, not a semantic gap.
    assert np.isclose(float(lb.rot), rot_l.mean().item(), atol=1e-3)
    assert np.isclose(float(lb.trans), trans_l.mean().item(), atol=1e-3)
    assert np.isclose(float(lb.equi), equi_loss.item(), atol=1e-3)
    assert np.isclose(float(lb.corr) + float(lb.sim), corr_sim_loss.mean().item(),
                      rtol=2e-3), (float(lb.corr), float(lb.sim))
    assert np.isclose(float(lb.total), want_total, rtol=2e-3), \
        (float(lb.total), want_total)
