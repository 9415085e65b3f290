"""Aux subsystem tests: logging, viz, stats, collate, Redwood reader,
preprocessing CLIs over synthetic fixtures."""
import json
import os
import pickle

import numpy as np
import pytest

from se3_equi_graph_registration_tpu.data.pipeline import collate_min_clip
from se3_equi_graph_registration_tpu.data.redwood import (
    RedwoodDataset, mutual_nn_correspondences)
from se3_equi_graph_registration_tpu.tools import stats, viz
from se3_equi_graph_registration_tpu.utils.logging import MetricsLogger


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(str(tmp_path), stdout=False, tensorboard=False)
    logger.log(1, {"loss": 2.5, "acc": 0.5})
    logger.log(2, {"loss": 2.0, "acc": 0.6}, prefix="train")
    logger.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 1 and rec["loss"] == 2.5
    assert (tmp_path / "metrics.csv").exists()


def test_viz_outputs(tmp_path, rng):
    pytest.importorskip("matplotlib")
    src = rng.standard_normal((100, 3)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.1, 0, 0]
    tgt = src + pose[:3, 3]
    labels = (rng.uniform(size=100) < 0.5).astype(np.float32)
    p1 = viz.plot_registration(src, tgt, pose, pose, str(tmp_path / "reg.png"))
    p2 = viz.plot_correspondences(src, tgt, labels, str(tmp_path / "corr.png"))
    p3 = viz.plot_feature_tsne(rng.standard_normal((50, 16)), labels[:50],
                               str(tmp_path / "tsne.png"))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000


def test_inlier_ratio_stats(rng):
    def fake_dataset():
        for _ in range(5):
            labels = (rng.uniform(size=100) < 0.4).astype(np.float32)
            yield (None, labels, np.zeros((100, 3)), None, None, None, None)

    s = stats.inlier_ratio_stats(fake_dataset())
    assert s["num_pairs"] == 5
    assert 0.2 < s["mean"] < 0.6
    assert sum(s["histogram"].values()) == 5


def test_collate_min_clip(rng):
    def sample(n):
        return (np.zeros((n, 2), np.float32), np.zeros(n, np.float32),
                rng.standard_normal((n, 3)).astype(np.float32),
                rng.standard_normal((n, 3)).astype(np.float32),
                rng.standard_normal((n, 8)).astype(np.float32),
                rng.standard_normal((n, 8)).astype(np.float32),
                np.eye(4, dtype=np.float32))

    batch = collate_min_clip([sample(100), sample(80), sample(90)])
    assert batch[2].shape == (3, 80, 3)
    assert batch[6].shape == (3, 4, 4)  # poses unclipped


def test_mutual_nn_correspondences(rng):
    f = rng.standard_normal((50, 16)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    corr = mutual_nn_correspondences(f, f, use_mutual=True)
    # identical feature sets → identity correspondence, all mutual
    np.testing.assert_array_equal(corr[:, 0], corr[:, 1])
    assert len(corr) == 50


def _write_redwood_root(tmp_path, rng, scene="livingroom1-simulated", n_frag=3):
    frag_dir = tmp_path / scene / "fragments"
    frag_dir.mkdir(parents=True)
    base = rng.standard_normal((200, 3)).astype(np.float32)
    feat = rng.standard_normal((200, 33)).astype(np.float32)
    for i in range(n_frag):
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.1, 0, 0]
        np.save(frag_dir / f"fragment_{i:03d}.npy", pose)
        # fragments live in LOCAL frames; pose_i maps local -> world, so the
        # local cloud is inv(pose_i) @ world = base - i*0.1
        np.savez(frag_dir / f"fragment_{i:03d}_fpfh.npz",
                 xyz=base - np.asarray([i * 0.1, 0, 0], np.float32),
                 feature=feat)
    return str(tmp_path)


def test_redwood_dataset(tmp_path, rng):
    root = _write_redwood_root(tmp_path, rng)
    ds = RedwoodDataset(root=root, select_scene="livingroom1-simulated",
                        num_node=150, descriptor="fpfh")
    assert len(ds) == 3  # 3 fragments → 3 ordered pairs
    corr_pos, src, tgt, gt, labels, key = ds[0]
    assert corr_pos.shape[1] == 6
    assert gt.shape == (4, 4)
    assert key.startswith("livingroom1-simulated@")
    # identical features shifted by GT translation → high inlier rate
    assert labels.mean() > 0.9


def test_threedmatch_preprocess_cli(tmp_path, rng):
    from se3_equi_graph_registration_tpu.data.preprocess import threedmatch_cli
    frag_dir = tmp_path / "frags"
    frag_dir.mkdir()
    for name in ("a.npz", "b.npz"):
        xyz = rng.standard_normal((150, 3)).astype(np.float32)
        feat = rng.standard_normal((150, 32)).astype(np.float32)
        feat /= np.linalg.norm(feat, axis=1, keepdims=True)
        np.savez(frag_dir / name, xyz=xyz, feature=feat)
    pair_list = tmp_path / "pairs.txt"
    pair_list.write_text("a.npz b.npz 0.5\n")
    out_dir = tmp_path / "out"
    n = threedmatch_cli.make_training_pairs(str(frag_dir), str(pair_list),
                                            str(out_dir), seed=0)
    assert n == 1
    pkl = list(out_dir.glob("*.pkl"))[0]
    with open(pkl, "rb") as f:
        d = pickle.load(f)
    assert set(d) == {"xyz_0", "xyz_1", "feat_0", "feat_1", "corr", "labels",
                      "gt_pose", "file_0", "file_1"}
    assert d["corr"].shape == (150, 2)


def test_kitti_poses_parser(tmp_path):
    from se3_equi_graph_registration_tpu.data.preprocess.kitti_cli import (
        load_kitti_poses)
    rows = np.hstack([np.eye(3), np.array([[1.0], [2.0], [3.0]])]).reshape(1, -1)
    path = tmp_path / "poses.txt"
    np.savetxt(path, np.repeat(rows, 4, axis=0))
    poses = load_kitti_poses(str(path))
    assert poses.shape == (4, 4, 4)
    np.testing.assert_allclose(poses[0, :3, 3], [1, 2, 3])
    np.testing.assert_allclose(poses[0, 3], [0, 0, 0, 1])


def test_persistent_compilation_cache(tmp_path):
    """enable_compilation_cache: a fresh process writes compiled executables
    to the cache dir; a second process reuses them (cold-start fix for the
    20-240 s production compiles). Subprocesses, because jit caches are
    per-process in-memory."""
    import subprocess
    import sys

    prog = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from se3_equi_graph_registration_tpu.utils import "
        "enable_compilation_cache\n"
        f"enable_compilation_cache({str(tmp_path)!r}, "
        "min_compile_time_secs=0.0)\n"
        "import jax.numpy as jnp\n"
        "print(float(jax.jit(lambda x: (x @ x).sum())"
        "(jnp.ones((64, 64)))))\n"
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r1 = subprocess.run([sys.executable, "-c", prog], env=env,
                        capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr
    entries = list(tmp_path.iterdir())
    assert entries, "cache dir is empty after first compile"
    r2 = subprocess.run([sys.executable, "-c", prog], env=env,
                        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr
    assert r1.stdout == r2.stdout
