"""3DMatch offline preprocessing CLI.

Capability parity with /root/reference/data_preprocess/3DMatch_Feature.py:
turn per-fragment descriptor .npz files (FCGF or FPFH, keys xyz + feature)
into the per-pair .pkl contract consumed by the dataset layer.

train mode (:39-233): overlap-filtered pair list → optional jitter + random
SE(3) augmentation of the target (axis 3, rot 1.0, trans 0.5) → feature-NN
correspondences → inlier labels at 0.10 m → pkl.
test mode (:241-365): the 8 standard scenes, gt.log inverse poses, no augment.

Descriptor extraction itself needs open3d/FCGF on a workstation — this CLI
consumes their .npz outputs (same as the reference).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ...core import se3_np
from ...utils.trajectory import read_trajectory_log
from . import pairs

TEST_SCENES = (
    "7-scenes-redkitchen",
    "sun3d-home_at-home_at_scan1_2013_jan_1",
    "sun3d-home_md-home_md_scan9_2012_sep_30",
    "sun3d-hotel_uc-scan3",
    "sun3d-hotel_umd-maryland_hotel1",
    "sun3d-hotel_umd-maryland_hotel3",
    "sun3d-mit_76_studyroom-76-1studyroom2",
    "sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika",
)

INLIER_THRESHOLD = 0.10  # meters (reference :63, :260)


def _load_fragment(path: str) -> tuple[np.ndarray, np.ndarray]:
    d = np.load(path)
    xyz_key = "xyz" if "xyz" in d else "pcd"
    feat_key = "feature" if "feature" in d else "feat"
    return np.asarray(d[xyz_key], np.float32), np.asarray(d[feat_key], np.float32)


def make_training_pairs(fragment_dir: str, pair_list_file: str, out_dir: str,
                        jitter: float = 0.005, augment: bool = True,
                        seed: int = 0) -> int:
    """pair_list_file lines: `<frag_a.npz> <frag_b.npz> [overlap]`."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    with open(pair_list_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            src_xyz, src_feat = _load_fragment(os.path.join(fragment_dir, parts[0]))
            tgt_xyz, tgt_feat = _load_fragment(os.path.join(fragment_dir, parts[1]))
            if jitter:
                src_xyz = src_xyz + rng.random(src_xyz.shape).astype(np.float32) * jitter
            if augment:
                tgt_xyz, gt_pose = pairs.augment_target(
                    tgt_xyz, rng, augment_axis=3, augment_rotation=1.0,
                    augment_translation=0.5, jitter=jitter)
            else:
                gt_pose = np.eye(4, dtype=np.float32)
            pair = pairs.build_pair(src_xyz, tgt_xyz, src_feat, tgt_feat,
                                    gt_pose, INLIER_THRESHOLD)
            name = f"{os.path.splitext(parts[0])[0]}@{os.path.splitext(parts[1])[0]}.pkl"
            pairs.save_pair(os.path.join(out_dir, name.replace('/', '_')), pair)
            count += 1
    return count


def make_test_pairs(root: str, out_dir: str, scenes=TEST_SCENES) -> int:
    """Per scene: read gt.log, build pairs with orig_trans = inv(gt) (:306)."""
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for scene in scenes:
        gt = read_trajectory_log(
            os.path.join(root, "gt_result", f"{scene}-evaluation", "gt.log"))
        for key, trans in gt.items():
            a, b = key.split("_")
            try:
                src_xyz, src_feat = _load_fragment(
                    os.path.join(root, "fragments", scene,
                                 f"cloud_bin_{a}.npz"))
                tgt_xyz, tgt_feat = _load_fragment(
                    os.path.join(root, "fragments", scene,
                                 f"cloud_bin_{b}.npz"))
            except FileNotFoundError:
                continue
            gt_pose = np.linalg.inv(trans).astype(np.float32)
            pair = pairs.build_pair(src_xyz, tgt_xyz, src_feat, tgt_feat,
                                    gt_pose, INLIER_THRESHOLD)
            pairs.save_pair(os.path.join(out_dir, f"{scene}@{key}.pkl"), pair)
            count += 1
    return count


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode", required=True)
    tr = sub.add_parser("train")
    tr.add_argument("fragment_dir")
    tr.add_argument("pair_list")
    tr.add_argument("out_dir")
    tr.add_argument("--no-augment", action="store_true")
    te = sub.add_parser("test")
    te.add_argument("root")
    te.add_argument("out_dir")
    args = ap.parse_args()
    if args.mode == "train":
        n = make_training_pairs(args.fragment_dir, args.pair_list, args.out_dir,
                                augment=not args.no_augment)
    else:
        n = make_test_pairs(args.root, args.out_dir)
    print(f"wrote {n} pairs")


if __name__ == "__main__":
    main()
