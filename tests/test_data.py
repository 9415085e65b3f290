"""Data-layer tests: sampling policies, dataset readers over synthetic pkl
fixtures matching the reference on-disk contracts, pipeline loader,
trajectory I/O, preprocessing core."""
import os
import pickle

import numpy as np
import pytest

from se3_equi_graph_registration_tpu.data import sampling
from se3_equi_graph_registration_tpu.data.kitti import KITTIPairDataset
from se3_equi_graph_registration_tpu.data.pipeline import PairLoader, collate
from se3_equi_graph_registration_tpu.data.preprocess import pairs as prep
from se3_equi_graph_registration_tpu.data.preprocess.split import split_dataset
from se3_equi_graph_registration_tpu.data.threedmatch import ThreeDMatchPairDataset
from se3_equi_graph_registration_tpu.utils.trajectory import (
    read_trajectory_log, write_trajectory_log)


def test_balanced_sample_pos_cap(rng):
    labels = np.zeros(1000)
    labels[:800] = 1
    idx = sampling.balanced_sample(labels, 100, 0.7, rng)
    assert len(idx) == 100
    assert labels[idx].sum() == 70          # positives capped at 70%
    assert np.all(np.diff(idx) >= 0)        # sorted


def test_balanced_sample_scarce_positives(rng):
    labels = np.zeros(1000)
    labels[:5] = 1
    idx = sampling.balanced_sample(labels, 100, 0.7, rng)
    assert len(idx) == 100
    assert labels[idx].sum() == 5           # keeps all available positives


def test_remap_correspondences():
    corr = np.array([[10, 500], [10, 7], [42, 500]])
    remapped = sampling.remap_correspondences(corr)
    assert remapped.max() < 3
    # same original index → same remapped index
    assert remapped[0, 0] == remapped[1, 0]
    assert remapped[0, 1] == remapped[2, 1]


def _write_synthetic_root(tmp_path, n_pairs=3, n_pts=300, feat_dim=32,
                          torch_format=True, kitti=False):
    import torch
    root = tmp_path
    subdir = "train_kitti" if kitti else "train_3dmatch"
    (root / subdir).mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(n_pairs):
        src = rng.standard_normal((n_pts, 3)).astype(np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.1, 0.2, 0.3]
        tgt = src + pose[:3, 3]
        feat = rng.standard_normal((n_pts, feat_dim)).astype(np.float32)
        corr = np.stack([np.arange(n_pts), np.arange(n_pts)], 1).astype(np.float32)
        labels = (rng.uniform(size=n_pts) < 0.5).astype(np.float32)
        name = f"pair_{i}.pkl"
        names.append(name)
        if torch_format:
            d = {"src_keypts": torch.from_numpy(src[None]),
                 "tgt_keypts": torch.from_numpy(tgt[None]),
                 "src_features": torch.from_numpy(feat[None]),
                 "tgt_features": torch.from_numpy(feat[None]),
                 "corr": torch.from_numpy(corr[None]),
                 "gt_labels": torch.from_numpy(labels[None]),
                 "gt_pose": torch.from_numpy(pose[None])}
        else:
            d = {"xyz_0": src, "xyz_1": tgt, "feat_0": feat, "feat_1": feat,
                 "corr": corr, "labels": labels, "gt_pose": pose}
        with open(root / subdir / name, "wb") as f:
            pickle.dump(d, f)
    for split in ("train", "val", "test"):
        (root / f"{split}_files.txt").write_text("\n".join(names) + "\n")
    return str(root)


def test_threedmatch_train_reader(tmp_path, rng):
    pytest.importorskip("torch")
    root = _write_synthetic_root(tmp_path, torch_format=True)
    ds = ThreeDMatchPairDataset(root=root, split="train", num_node=128)
    assert len(ds) == 3
    corr, labels, src, tgt, sf, tf, pose = ds[0]
    assert corr.shape == (128, 2) and labels.shape == (128,)
    assert src.shape == (128, 3) and sf.shape == (128, 32)
    assert pose.shape == (4, 4)
    assert all(a.dtype == np.float32 for a in (corr, labels, src, tgt, sf, tf, pose))
    # positives capped at 70%
    assert labels.sum() <= 0.7 * 128 + 1


def test_threedmatch_test_reader(tmp_path, rng):
    root = _write_synthetic_root(tmp_path, torch_format=False)
    os.rename(os.path.join(root, "train_3dmatch"),
              os.path.join(root, "test_3dmatch"))
    ds = ThreeDMatchPairDataset(root=root, split="test", num_node=64,
                                descriptor="fcgf")
    corr, labels, src, tgt, sf, tf, pose = ds[0]
    assert sf.shape == (64, 32)  # fcgf truncates to 32


def test_threedmatch_synthetic_pose_mode(tmp_path, rng):
    pytest.importorskip("torch")
    root = _write_synthetic_root(tmp_path, torch_format=True)
    ds = ThreeDMatchPairDataset(root=root, split="train", num_node=64,
                                synthetic_pose=True)
    corr, labels, src, tgt, sf, tf, pose = ds[0]
    assert labels.sum() == 64  # all inliers by construction
    from se3_equi_graph_registration_tpu.core import se3_np
    warped = se3_np.transform(src, pose)
    assert np.abs(warped - tgt).max() < 0.02  # jitter-level agreement


def test_kitti_readers(tmp_path, rng):
    root = _write_synthetic_root(tmp_path, torch_format=False, kitti=True,
                                 feat_dim=33)
    ds = KITTIPairDataset(root=root, split="train", num_node=64)
    corr, labels, src, tgt, sf, tf, pose = ds[0]
    assert sf.shape == (64, 33)
    # fpfh rows are L2-normalized
    np.testing.assert_allclose(np.linalg.norm(sf, axis=1), 1.0, atol=1e-3)

    os.rename(os.path.join(root, "train_kitti"), os.path.join(root, "test_kitti"))
    ds_test = KITTIPairDataset(root=root, split="test", num_node=64)
    corr, labels, src, tgt, sf, tf, pose = ds_test[0]
    assert labels.sum() == 64  # inlier-only sampling


def test_pair_loader_batches(tmp_path, rng):
    pytest.importorskip("torch")
    root = _write_synthetic_root(tmp_path, n_pairs=5, torch_format=True)
    ds = ThreeDMatchPairDataset(root=root, split="train", num_node=32)
    loader = PairLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    for b in batches:
        assert b[2].shape == (2, 32, 3)


def test_split_tool(tmp_path):
    d = tmp_path / "train_3dmatch"
    d.mkdir()
    for i in range(20):
        (d / f"p{i}.pkl").write_bytes(b"x")
    out = split_dataset(str(tmp_path), "train_3dmatch", val_fraction=0.2)
    assert len(out["val"]) == 4 and len(out["train"]) == 16
    assert (tmp_path / "train_files.txt").exists()
    assert set(out["val"]).isdisjoint(out["train"])


def test_trajectory_roundtrip(tmp_path):
    T = {"0_1": np.arange(16, dtype=float).reshape(4, 4),
         "1_2": np.eye(4)}
    path = str(tmp_path / "gt.log")
    write_trajectory_log(path, T, num_fragments=3)
    back = read_trajectory_log(path)
    assert set(back) == {"0_1", "1_2"}
    np.testing.assert_allclose(back["0_1"], T["0_1"])


def test_preprocess_pair_build(rng):
    n = 200
    src = rng.standard_normal((n, 3)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.05, 0.0, 0.0]
    tgt = src + pose[:3, 3]
    feat = rng.standard_normal((n, 32)).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    pair = prep.build_pair(src, tgt, feat, feat, pose, inlier_threshold=0.10)
    # identical features → identity correspondence; all within threshold
    np.testing.assert_array_equal(pair["corr"][:, 1], np.arange(n))
    assert pair["labels"].sum() == n
    # corrupting features breaks correspondences and labels drop
    feat2 = rng.standard_normal((n, 32)).astype(np.float32)
    pair2 = prep.build_pair(src, tgt, feat, feat2, pose, inlier_threshold=0.10)
    assert pair2["labels"].sum() < n


def test_augment_target_consistency(rng):
    tgt = rng.standard_normal((100, 3)).astype(np.float32)
    aug_pts, pose = prep.augment_target(tgt, rng, jitter=0.0)
    from se3_equi_graph_registration_tpu.core import se3_np
    np.testing.assert_allclose(se3_np.transform(tgt, pose), aug_pts, atol=1e-5)
