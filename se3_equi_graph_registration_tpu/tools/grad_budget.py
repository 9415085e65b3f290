"""On-TPU per-tensor gradient budget for the fast training path.

The forward already has a measured accuracy budget (BASELINE.md: fast-vs-exact
on the shipped checkpoint at N=2048, on chip). Training's analog was indirect —
torch parity runs at exact/cluster knobs and N=256, Pallas-backward parity runs
in interpret mode on CPU, and the banded-FPFH episode proved CPU value tests
are structurally blind to TPU bf16 matmul rounding. This tool closes that loop:
it differentiates the SAME loss make_train_step differentiates, once under the
shipped fast config (Pallas backward, 1-pass bf16 kernels, bf16 one-hot h
permutes, packed k-NN keys) and once under the accurate twin (3-pass ~fp32
Pallas kernels, exact gathers/sorts, exact extraction keys) on the SAME batch
and converted reference checkpoint, then reports per-tensor gradient cosine and
relative L2. Run ON the chip: `python tools/grad_budget.py` (CPU runs execute
interpret-mode kernels at fp32 — they cannot see what this measures).

The two programs share the Hilbert-window graph structure; `packed` key
near-ties can still swap a few neighbors, so the budget measures the shipped
config as users run it (numerics + tie churn), exactly like the inference
budget's approx-kNN column. Expected-scale reference: BASELINE.md's
"fast-training gradient budget" table (worst tensors named there).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def flatten_named(tree, prefix=""):
    """dict pytree -> {dotted/name: leaf} (flax param trees are nested dicts)."""
    out = {}
    for k, v in tree.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_named(v, name + "/"))
        else:
            out[name] = np.asarray(v, np.float64)
    return out


def grad_table(n=2048, batch=8, k=16, c=32, seed=0, ckpt=None,
               fast_overrides=None):
    """Returns (rows, fast_cfg, acc_cfg): rows = [(name, cosine, rel_l2)]
    sorted worst-cosine-first.

    fast_overrides: extra EngineConfig fields for the FAST side only — e.g.
    ``{"knn_packed": False}`` isolates kernel NUMERICS from extraction-key
    tie churn (packed near-tie swaps change the GRAPH between the two
    programs; a handful of swapped edges moves small-tensor gradient
    cosines far more than any bf16 rounding — measured in BASELINE.md's
    budget table)."""
    import jax

    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    from se3_equi_graph_registration_tpu.train import engine
    from se3_equi_graph_registration_tpu.train import losses as losses_lib

    rng = np.random.default_rng(seed)
    pb = make_pair_batch(rng, batch=batch, n=n, feat_dim=c)
    batch_d = engine.batch_to_device(
        (pb.corr, pb.labels, pb.src_pts, pb.tgt_pts, pb.src_feat,
         pb.tgt_feat, pb.gt_pose))

    fast_cfg = engine.fast_tpu_config(num_nodes=n, k=k, in_node_nf=c,
                                      hidden_nf=32, top_k=128,
                                      **(fast_overrides or {}))
    # accurate twin: same window-graph structure, 3-pass ~fp32 kernels, exact
    # gathers (no bf16 one-hot permutes), exact extraction keys
    acc_cfg = engine.fast_tpu_config(num_nodes=n, k=k, in_node_nf=c,
                                     hidden_nf=32, top_k=128,
                                     egnn_accurate=True,
                                     onehot_h_permute=False, knn_packed=False)

    if ckpt:
        from se3_equi_graph_registration_tpu.train.checkpoints import (
            convert_reference_checkpoint)
        params = convert_reference_checkpoint(ckpt)
    else:
        model0 = engine.build_model(fast_cfg)
        opt0 = engine.build_optimizer(fast_cfg)
        params = engine.init_state(model0, opt0, fast_cfg,
                                   jax.random.PRNGKey(0), batch_d).params

    def grads_for(cfg):
        model = engine.build_model(cfg)

        def loss_fn(p):
            out = engine._apply_with_graphs(model, cfg, p, batch_d)
            lb = losses_lib.total_loss(out, batch_d["gt_pose"],
                                       batch_d["labels"], cfg.loss_weights)
            return lb.total
        return jax.device_get(jax.jit(jax.grad(loss_fn))(params))

    g_fast = flatten_named(grads_for(fast_cfg)["params"])
    g_acc = flatten_named(grads_for(acc_cfg)["params"])
    assert set(g_fast) == set(g_acc)

    rows = []
    for name in sorted(g_fast):
        a, b = g_fast[name].ravel(), g_acc[name].ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        scale = max(na, nb)
        if scale == 0:
            rows.append((name, 1.0, 0.0))
            continue
        cos = float(np.dot(a, b) / max(na * nb, 1e-300))
        rel = float(np.linalg.norm(a - b) / scale)
        rows.append((name, cos, rel))
    rows.sort(key=lambda r: r[1])
    return rows, fast_cfg, acc_cfg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ckpt",
                    default="/root/reference/checkpoints/checkpoint-3dmatch.pth")
    ap.add_argument("--random-init", action="store_true",
                    help="random-init params instead of the converted ckpt")
    ap.add_argument("--same-graph", action="store_true",
                    help="fast side uses exact extraction keys "
                         "(knn_packed=False): isolates kernel numerics "
                         "from packed-key tie churn in the graph")
    args = ap.parse_args(argv)

    import jax
    if jax.default_backend() != "tpu":
        print("WARNING: not on TPU — interpret-mode kernels run fp32 at both "
              "settings, so this run measures nothing", file=sys.stderr)

    rows, _, _ = grad_table(n=args.n, batch=args.batch,
                            ckpt=None if args.random_init else args.ckpt,
                            fast_overrides=({"knn_packed": False}
                                            if args.same_graph else None))
    print(f"{'tensor':<48s} {'cosine':>10s} {'rel L2':>10s}")
    for name, cos, rel in rows:
        print(f"{name:<48s} {cos:10.7f} {rel:10.2e}")
    worst_cos = min(r[1] for r in rows)
    worst_rel = max(r[2] for r in rows)
    med_rel = float(np.median([r[2] for r in rows]))
    print(f"\nworst cosine {worst_cos:.7f}  worst rel {worst_rel:.2e}  "
          f"median rel {med_rel:.2e}  ({len(rows)} tensors, fast vs accurate)")


if __name__ == "__main__":
    main()
