"""Quickstart: register two RAW point clouds with no learned model.

The reference has no answer when you lack a usable checkpoint — its users
fall back to open3d (FPFH + RANSAC + ICP). This framework ships that classic
pipeline natively (`registration.register_fpfh`): FPFH-33 descriptors,
mutual feature matching, spectral consistency, IRLS, and trimmed
point-to-plane ICP — one jitted TPU program, no open3d, no torch.

  python examples/global_registration.py                 # synthetic surfaces
  python examples/global_registration.py --npz pair.npz  # your clouds
                                                         # (keys: src, tgt)
  python examples/global_registration.py --overlap 0.4   # harder: 40% overlap

The coarse stage defaults to fixed-shape batched RANSAC (ops/ransac.py);
with --overlap below ~0.5 the script also enables overlap-fraction trimmed
ICP (printed below) — MOST source points have no counterpart there, which
corrupts the default adaptive trim scale.
"""
from __future__ import annotations

import argparse

import numpy as np


def make_surfaces(rng, n, overlap):
    """Two independent samplings of a bumpy height field, second one rigidly
    moved; `overlap` is the shared fraction of the x-extent."""
    centers = rng.uniform(-1.6, 1.6, (30, 2))
    amps = rng.uniform(-0.35, 0.35, 30)
    widths = rng.uniform(0.08, 0.3, 30)

    def surf(n_pts, x0, x1):
        xy = np.stack([rng.uniform(x0, x1, n_pts),
                       rng.uniform(-1, 1, n_pts)], -1)
        z = np.zeros(n_pts)
        for (cx, cy), a, w in zip(centers, amps, widths):
            z += a * np.exp(-((xy[:, 0] - cx) ** 2 + (xy[:, 1] - cy) ** 2) / w)
        pts = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
        return pts + rng.standard_normal(pts.shape).astype(np.float32) * 0.002

    from se3_equi_graph_registration_tpu.data.synthetic import random_rotation
    R = random_rotation(rng).astype(np.float32)
    t = (rng.standard_normal(3) * 0.3).astype(np.float32)
    shift = 2.0 * (1.0 - overlap)          # slide the target window along x
    src = surf(n, -1.0, 1.0)
    tgt = surf(n, -1.0 + shift, 1.0 + shift) @ R.T + t
    return src, tgt, R, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", help="npz with 'src' and 'tgt' [N, 3] arrays")
    ap.add_argument("--n-points", type=int, default=1024)
    ap.add_argument("--overlap", type=float, default=1.0,
                    help="synthetic only: shared fraction of the surfaces")
    ap.add_argument("--voxel", type=float, default=0.0)
    args = ap.parse_args()

    from se3_equi_graph_registration_tpu.registration import register_fpfh

    rng = np.random.default_rng(0)
    gt = None
    if args.npz:
        d = np.load(args.npz)
        src, tgt = np.asarray(d["src"], np.float32), np.asarray(d["tgt"], np.float32)
    else:
        src, tgt, R_gt, t_gt = make_surfaces(rng, args.n_points, args.overlap)
        gt = (R_gt, t_gt)

    # partial overlap: trimmed-ICP finish with AUTOMATIC overlap estimation
    # (Chetverikov TrICP objective — no need to know the overlap fraction)
    kw = {}
    if args.overlap < 0.6:
        kw = dict(top_m=256, icp_trim="auto", icp_iters=20)
        print(f"partial-overlap settings: {kw}")

    R, t, info = register_fpfh(src, tgt, n_points=args.n_points,
                               voxel=args.voxel, **kw)
    print("R =\n", np.round(R, 4))
    print("t =", np.round(t, 4))
    print("pose sigma (rot axes, deg):",
          np.round(np.degrees(np.sqrt(np.diag(info["pose_covariance"])[:3])), 4))
    if gt is not None:
        d = np.linalg.norm(R - gt[0]) / np.sqrt(2.0)
        rot_err = np.degrees(2.0 * np.arcsin(np.clip(d / 2.0, 0.0, 1.0)))
        print(f"vs ground truth: {rot_err:.3f} deg / "
              f"{np.linalg.norm(t - gt[1]) * 100:.3f} cm")


if __name__ == "__main__":
    main()
