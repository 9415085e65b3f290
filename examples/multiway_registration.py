"""Multiway registration: a fragment sequence to one consistent trajectory.

The full checkpoint-free stack end to end, the workflow open3d documents as
"multiway registration" — here every stage is this framework's own TPU ops:

  1. pairwise registration of consecutive fragments (+ a few loop-closure
     candidates) with `registration.register_fpfh`
     (FPFH -> matching -> RANSAC -> IRLS -> trimmed plane ICP);
  2. per-edge confidence from the pose covariance;
  3. `ops.pose_graph.optimize_trajectory` fuses the pairwise estimates into
     globally consistent absolute poses (jitted Gauss-Newton).

  python examples/multiway_registration.py [--fragments 6] [--n-points 1024]

The demo corrupts ONE odometry link (simulating a failed pairwise
registration mid-sequence — at these overlaps one of the skip-2 closures
genuinely fails on its own too) and shows the robust pose graph repairing
the drifted trajectory from the surviving loop closures, rejecting the bad
edges by residual instead of trusting their (confidently wrong)
covariances. Prints max per-fragment pose error: ground truth vs the
corrupted odometry chain vs the optimized trajectory.
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fragments", type=int, default=6)
    ap.add_argument("--n-points", type=int, default=1024)
    args = ap.parse_args()

    import jax.numpy as jnp

    from se3_equi_graph_registration_tpu.core.se3 import matrix_exp_so3
    from se3_equi_graph_registration_tpu.ops.pose_graph import optimize_trajectory
    from se3_equi_graph_registration_tpu.registration import register_fpfh

    rng = np.random.default_rng(0)
    V, n = args.fragments, args.n_points

    # one shared bumpy terrain; fragment i sees a window of it from pose i
    centers = rng.uniform(-2.0, 2.0 + 0.5 * V, (12 * V, 2))
    amps = rng.uniform(-0.35, 0.35, 12 * V)
    widths = rng.uniform(0.08, 0.3, 12 * V)

    def sample_window(x0):
        xy = np.stack([rng.uniform(x0, x0 + 2.0, n),
                       rng.uniform(-1, 1, n)], -1)
        z = np.zeros(n)
        for (cx, cy), a, w in zip(centers, amps, widths):
            z += a * np.exp(-((xy[:, 0] - cx) ** 2 + (xy[:, 1] - cy) ** 2) / w)
        pts = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
        return pts + rng.standard_normal(pts.shape).astype(np.float32) * 0.002

    # ground-truth fragment poses (gentle motion so windows overlap ~70%)
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, V):
        w = rng.standard_normal(3).astype(np.float32) * 0.05
        d = np.eye(4, dtype=np.float32)
        d[:3, :3] = np.asarray(matrix_exp_so3(jnp.asarray(w)))
        d[:3, 3] = [0.4, 0, 0] + rng.standard_normal(3) * 0.02
        gt.append(gt[-1] @ d)
    gt = np.stack(gt)

    # fragment i's LOCAL cloud: world window seen from pose i
    frags = []
    for i in range(V):
        world = sample_window(0.4 * i - 1.0)
        Rw, tw = gt[i, :3, :3], gt[i, :3, 3]
        frags.append((world - tw) @ Rw)   # world -> local (R^T (p - t))

    # pairwise edges: odometry chain + skip-2/skip-3 loop candidates —
    # REDUNDANCY is what lets a robust graph out-vote a corrupted link: a
    # single spanning closure merely ties with the bad edge (two equally
    # self-consistent interpretations)
    edge_list = [(i, i + 1) for i in range(V - 1)]
    edge_list += [(i, i + 2) for i in range(V - 2)]
    edge_list += [(i, i + 3) for i in range(V - 3)]
    rels = []
    for i, j in edge_list:
        # register fragment j onto fragment i: T_ij maps j-local -> i-local
        R, t, _ = register_fpfh(frags[j], frags[i], n_points=n,
                                top_m=256, icp_trim="auto", icp_iters=15,
                                seed=i * 100 + j)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        rels.append(T)
    rels = np.stack(rels)
    # uniform weights + robust kernel beats covariance weighting here: a
    # confidently-WRONG registration has a small covariance, and the honest
    # 50%-overlap closures would be muted ~40x below the chain edges —
    # outlier rejection must come from graph-residual consensus, not from
    # per-edge self-confidence
    weights = np.ones(len(edge_list), np.float32)

    # simulate a failed pairwise registration mid-chain: corrupt one
    # odometry link by 5 deg / 30 cm (its covariance still looks confident)
    bad = (V - 1) // 2
    w_bad = np.float32([0.087, 0, 0])
    rels[bad, :3, :3] = (np.asarray(matrix_exp_so3(jnp.asarray(w_bad)))
                         @ rels[bad, :3, :3])
    rels[bad, :3, 3] += [0.3, 0, 0]

    # odometry-integrated initial trajectory (chain edges only) — the
    # corrupted link kinks everything after it
    init = [np.eye(4, dtype=np.float32)]
    for i in range(V - 1):
        init.append(init[-1] @ rels[i])
    init = np.stack(init)

    opt = np.asarray(optimize_trajectory(jnp.asarray(init),
                                         np.asarray(edge_list, np.int32),
                                         jnp.asarray(rels),
                                         weights=jnp.asarray(weights),
                                         robust="geman", iters=30))

    def errs(traj):
        rot, trans = [], []
        for i in range(V):
            d = np.linalg.norm(traj[i, :3, :3] - gt[i, :3, :3]) / np.sqrt(2)
            rot.append(np.degrees(2 * np.arcsin(np.clip(d / 2, 0, 1))))
            trans.append(np.linalg.norm(traj[i, :3, 3] - gt[i, :3, 3]) * 100)
        return max(rot), max(trans)

    r0, t0 = errs(init)
    r1, t1 = errs(opt)
    print(f"odometry chain : max {r0:.3f} deg / {t0:.3f} cm")
    print(f"optimized graph: max {r1:.3f} deg / {t1:.3f} cm")


if __name__ == "__main__":
    main()
