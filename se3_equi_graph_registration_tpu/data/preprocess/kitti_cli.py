"""KITTI odometry preprocessing CLI.

Capability parity with /root/reference/data_preprocess/process_kitti.py:
sequential LiDAR frames → FPFH descriptors (extract_fpfh via open3d,
:21-38) → GT relative poses from the odometry poses file → feature-NN
correspondences → inlier labels at 0.60 m (:175) → per-pair pkl files.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from . import pairs

INLIER_THRESHOLD = 0.60  # meters (reference :175)


def load_kitti_poses(path: str) -> np.ndarray:
    """KITTI odometry poses file: one 3x4 row-major matrix per line → [N,4,4]."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    out = np.tile(np.eye(4, dtype=np.float64), (len(rows), 1, 1))
    out[:, :3, :4] = rows
    return out


def load_velodyne_bin(path: str) -> np.ndarray:
    """KITTI .bin scan: float32 x,y,z,reflectance → [N,3]."""
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return pts[:, :3]


def make_sequence_pairs(velodyne_dir: str, poses_file: str, out_dir: str,
                        frame_step: int = 10, voxel_size: float = 0.30,
                        max_pairs: int | None = None) -> int:
    """Pairs of frames `frame_step` apart with GT relative pose
    inv(pose_j) @ pose_i (src frame i → tgt frame j)."""
    poses = load_kitti_poses(poses_file)
    scans = sorted(f for f in os.listdir(velodyne_dir) if f.endswith(".bin"))
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for i in range(0, len(scans) - frame_step, frame_step):
        j = i + frame_step
        src_raw = load_velodyne_bin(os.path.join(velodyne_dir, scans[i]))
        tgt_raw = load_velodyne_bin(os.path.join(velodyne_dir, scans[j]))
        src_xyz, src_feat = pairs.extract_fpfh(src_raw, voxel_size=voxel_size)
        tgt_xyz, tgt_feat = pairs.extract_fpfh(tgt_raw, voxel_size=voxel_size)
        # the reference L2-normalizes FPFH after extraction (:196-197)
        src_feat = pairs.normalize_descriptors(src_feat)
        tgt_feat = pairs.normalize_descriptors(tgt_feat)
        gt_pose = (np.linalg.inv(poses[j]) @ poses[i]).astype(np.float32)
        pair = pairs.build_pair(src_xyz, tgt_xyz, src_feat, tgt_feat, gt_pose,
                                INLIER_THRESHOLD)
        pairs.save_pair(os.path.join(out_dir, f"pair_{i:06d}_{j:06d}.pkl"), pair)
        count += 1
        if max_pairs is not None and count >= max_pairs:
            break
    return count


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("velodyne_dir")
    ap.add_argument("poses_file")
    ap.add_argument("out_dir")
    ap.add_argument("--frame-step", type=int, default=10)
    ap.add_argument("--voxel-size", type=float, default=0.30)
    ap.add_argument("--max-pairs", type=int, default=None)
    args = ap.parse_args()
    n = make_sequence_pairs(args.velodyne_dir, args.poses_file, args.out_dir,
                            args.frame_step, args.voxel_size, args.max_pairs)
    print(f"wrote {n} pairs")


if __name__ == "__main__":
    main()
