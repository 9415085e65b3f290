"""Quickstart: register one point-cloud pair end to end.

Replaces the reference's 1.4k-line eval script as the "how do I run this"
example (/root/reference/src/eval_egnn_metrics.py). Three ways in:

  python examples/register_pair.py                       # synthetic pair
  python examples/register_pair.py --pkl pair.pkl        # a 3DMatch test pkl
  python examples/register_pair.py --checkpoint checkpoint-3dmatch.pth

Runs on CPU or TPU (whatever JAX exposes). With no checkpoint, the model runs
at random init — the pose from random features is meaningless, but the
pipeline (k-NN graphs -> shared EGNN -> weighted Kabsch) is the production
one; with GT labels on synthetic data the Kabsch head alone recovers the pose.
"""
from __future__ import annotations

import argparse
import pickle

import numpy as np


def load_pair(args, rng):
    if args.pkl:
        with open(args.pkl, "rb") as f:
            d = pickle.load(f)
        # 3DMatch test pkl schema (data_preprocess/3DMatch_Feature.py:206-214)
        corr = np.asarray(d["corr"], np.int64)
        src = np.asarray(d["xyz_0"], np.float32)[corr[:, 0]]
        tgt = np.asarray(d["xyz_1"], np.float32)[corr[:, 1]]
        fs = np.asarray(d["feat_0"], np.float32)[corr[:, 0]][:, :32]
        ft = np.asarray(d["feat_1"], np.float32)[corr[:, 1]][:, :32]
        gt = d.get("gt_pose")
        gt = np.asarray(gt, np.float32) if gt is not None else None
        return src, fs, tgt, ft, gt
    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    pb = make_pair_batch(rng, batch=1, n=args.n, feat_dim=32)
    return (pb.src_pts[0], pb.src_feat[0], pb.tgt_pts[0], pb.tgt_feat[0],
            pb.gt_pose[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pkl", default=None, help="a 3DMatch-format pair pkl")
    ap.add_argument("--checkpoint", default=None,
                    help=".pth (reference) or orbax dir; random init if unset")
    ap.add_argument("--n", type=int, default=1024,
                    help="compiled point count (inputs are padded/sampled)")
    ap.add_argument("--parity", action="store_true",
                    help="exact/svd checkpoint-parity path instead of fast")
    ap.add_argument("--robust", action="store_true",
                    help="sharp weighting + spectral reweighting + IRLS "
                         "(rescues low-inlier pairs; BASELINE.md tables)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    src_pts, src_feat, tgt_pts, tgt_feat, gt_pose = load_pair(args, rng)

    from se3_equi_graph_registration_tpu.serving import Registrar
    if args.checkpoint:
        reg = Registrar.from_checkpoint(args.checkpoint, fast=not args.parity,
                                        robust=args.robust, num_nodes=args.n)
    else:
        import jax
        from se3_equi_graph_registration_tpu.train import engine
        base = (engine.robust_eval_config if args.robust
                else engine.EngineConfig if args.parity
                else engine.fast_tpu_config)
        cfg = base(num_nodes=args.n, top_k=128)
        model = engine.build_model(cfg, head_mode="eval_fusion")
        k = np.zeros((1, args.n, cfg.k), np.int32)
        z = lambda *s: np.zeros(s, np.float32)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), z(1, args.n, 32), z(1, args.n, 3), k,
            z(1, args.n, 32), z(1, args.n, 3), k, z(1, args.n))
        reg = Registrar(params, cfg)

    # unbatched [N, .] inputs -> unbatched R [3,3], t [3]
    R, t, info = reg.register(src_pts, src_feat, tgt_pts, tgt_feat)
    print("R =\n", np.asarray(R).round(4))
    print("t =", np.asarray(t).round(4))
    print("similarity_mean =", float(info["similarity_mean"]))

    if gt_pose is not None:
        from se3_equi_graph_registration_tpu.train import metrics
        pred = np.eye(4, dtype=np.float32)
        pred[:3, :3], pred[:3, 3] = np.asarray(R), np.asarray(t)
        rre, rte = metrics.calculate_pose_error(gt_pose[None], pred[None])
        print(f"vs GT: rotation error {float(np.asarray(rre)[0]):.2f} deg, "
              f"translation error {float(np.asarray(rte)[0]):.2f} cm")


if __name__ == "__main__":
    main()
