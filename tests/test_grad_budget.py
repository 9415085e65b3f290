"""Training gradient-budget tool (tools/grad_budget.py).

The measured fast-vs-accurate budget itself must run ON the TPU (CPU executes
interpret-mode kernels at fp32 in both configs, so it cannot see what the
budget measures — BASELINE.md carries the chip numbers). What CPU can pin:

- the tool's machinery — both configs build, differentiate the engine loss,
  and produce one row per shared parameter tensor;
- the fp32 ground truth — with no bf16 anywhere (CPU), the fast and accurate
  programs compute the SAME gradients up to tie churn in the k-NN keys, so
  cosines must sit at ~1. A machinery bug (wrong config twin, mismatched
  batch, missing stop-gradient) shows up here as a gross cosine drop long
  before any TPU run.
"""
import numpy as np


def test_grad_table_cpu_machinery():
    from se3_equi_graph_registration_tpu.tools.grad_budget import grad_table

    rows, fast_cfg, acc_cfg = grad_table(n=256, batch=2, k=8, c=16, seed=0,
                                         ckpt=None)
    assert len(rows) > 10                       # one row per param tensor
    names = [r[0] for r in rows]
    assert len(set(names)) == len(names)
    assert any("gcl" in n for n in names)       # EGNN layer params present
    # the two configs really are the fast/accurate twins
    assert not fast_cfg.egnn_accurate and acc_cfg.egnn_accurate
    assert fast_cfg.onehot_h_permute and not acc_cfg.onehot_h_permute
    worst_cos = min(r[1] for r in rows)
    worst_rel = max(r[2] for r in rows)
    # CPU = fp32 both sides; only k-NN extraction-key tie churn may differ
    assert worst_cos > 0.99, rows[:3]
    assert np.isfinite(worst_rel)
