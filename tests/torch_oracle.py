"""Independent PyTorch oracle of the reference model semantics.

Written from the documented behavior in SURVEY.md §2.1/§3.5 (E_GCL edge concat
order, segment aggregation onto edge_index[0], weighted Kabsch) using only
plain torch ops — no torch_cluster / torch_geometric — so golden-parity tests
can compare the JAX implementation against the trained `.pth` weights without
importing reference code. Edge convention is torch_cluster's
flow='source_to_target': row = neighbor j, col = center i; aggregation onto row.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def knn_edges(x: torch.Tensor, k: int) -> tuple[torch.Tensor, torch.Tensor]:
    """k-NN with self-loops: returns (row=neighbor, col=center), each [N*k]."""
    d = torch.cdist(x, x)
    idx = torch.topk(d, k, largest=False).indices          # [N, k]
    n = x.shape[0]
    col = torch.arange(n).repeat_interleave(k)
    row = idx.reshape(-1)
    return row, col


def so3_features(x: torch.Tensor, row: torch.Tensor, col: torch.Tensor) -> torch.Tensor:
    eps, thr = 1e-8, 1e-6
    xi, xk = x[row], x[col]
    rel = xi - xk
    a = rel / (rel.norm(dim=1, keepdim=True) + eps)
    cr = torch.cross(xi, xk, dim=1)
    b = cr / (cr.norm(dim=1, keepdim=True) + eps)
    c = torch.cross(a, b, dim=1)
    mask = (a.norm(dim=1) < thr) | (b.norm(dim=1) < thr) | (c.norm(dim=1) < thr)
    M = torch.stack([a, b, c], dim=2)
    M[mask] = torch.eye(3)
    return M.reshape(-1, 9)


def _seg_sum(data: torch.Tensor, ids: torch.Tensor, n: int) -> torch.Tensor:
    out = data.new_zeros((n, data.shape[1]))
    return out.index_add_(0, ids, data)


def egcl_forward(sd: dict, prefix: str, h, x, row, col, edge_attr, num_heads=4):
    n = h.shape[0]
    coord_diff = x[row] - x[col]
    radial = (coord_diff ** 2).sum(-1, keepdim=True)

    rel = x[row] - x[col]
    dist = rel.norm(dim=1, keepdim=True)
    dot = (x[row] * x[col]).sum(dim=1, keepdim=True)
    so3 = so3_features(x, row, col)

    feats = torch.cat([h[row], h[col], radial, dist, dot, so3, edge_attr], dim=1)

    heads = []
    for hh in range(num_heads):
        y = F.silu(feats @ sd[f"{prefix}edge_mlps.{hh}.0.weight"].T
                   + sd[f"{prefix}edge_mlps.{hh}.0.bias"])
        y = y @ sd[f"{prefix}edge_mlps.{hh}.2.weight"].T + sd[f"{prefix}edge_mlps.{hh}.2.bias"]
        heads.append(y)
    m = torch.cat(heads, dim=1)
    m = F.layer_norm(m, (m.shape[1],), sd[f"{prefix}layer_norm.weight"],
                     sd[f"{prefix}layer_norm.bias"], eps=1e-5)

    s = F.silu(m @ sd[f"{prefix}coord_mlp.0.weight"].T + sd[f"{prefix}coord_mlp.0.bias"])
    s = s @ sd[f"{prefix}coord_mlp.2.weight"].T
    x = x + _seg_sum(coord_diff * s, row, n)

    agg = _seg_sum(m, row, n)
    out = F.silu(torch.cat([h, agg], dim=1) @ sd[f"{prefix}node_mlp.0.weight"].T
                 + sd[f"{prefix}node_mlp.0.bias"])
    out = out @ sd[f"{prefix}node_mlp.2.weight"].T + sd[f"{prefix}node_mlp.2.bias"]
    h = h + out
    return h, x


def egnn_forward(sd: dict, h, x, row, col, edge_attr, prefix="", n_layers=3, num_heads=4):
    h = h @ sd[prefix + "embedding_in.weight"].T + sd[prefix + "embedding_in.bias"]
    for i in range(n_layers):
        h, x = egcl_forward(sd, f"{prefix}gcl_{i}.", h, x, row, col, edge_attr, num_heads)
    h = h @ sd[prefix + "embedding_out.weight"].T + sd[prefix + "embedding_out.bias"]
    return h, x


def weighted_kabsch(src, tgt, feats_src, feats_tgt, labels):
    """Train-head pose solve: softmax feature-dot weights over label-valid points."""
    valid = labels.bool()
    vs, vt = src[valid], tgt[valid]
    fs, ft = feats_src[valid], feats_tgt[valid]
    if vs.shape[0] == 0:
        return torch.eye(3), torch.zeros(3)
    w = torch.softmax((fs * ft).sum(-1), dim=-1)
    w = w / (w.sum() + 1e-6)
    cs = (w[:, None] * vs).sum(0, keepdim=True)
    ct = (w[:, None] * vt).sum(0, keepdim=True)
    H = (w[:, None, None] * (vs - cs)[:, :, None] @ (vt - ct)[:, None, :]).sum(0)
    H = H + 1e-6 * torch.eye(3)
    U, S, Vt = torch.linalg.svd(H)
    R = Vt.T @ U.T
    if torch.det(R) < 0:
        Vt = Vt.clone()
        Vt[-1, :] *= -1
        R = Vt.T @ U.T
    t = ct.squeeze() - R @ cs.squeeze()
    return R, t


def head_forward(sd: dict, h_src, x_src, edges_src, h_tgt, x_tgt, edges_tgt,
                 labels, n_layers=3, num_heads=4, top_k=128):
    """Full CrossAttentionPoseRegression train-head semantics at batch 1."""
    e_attr_s = torch.ones(edges_src[0].shape[0], 1)
    e_attr_t = torch.ones(edges_tgt[0].shape[0], 1)
    h_s, x_s = egnn_forward(sd, h_src, x_src, *edges_src, e_attr_s,
                            prefix="egnn.", n_layers=n_layers, num_heads=num_heads)
    h_t, x_t = egnn_forward(sd, h_tgt, x_tgt, *edges_tgt, e_attr_t,
                            prefix="egnn.", n_layers=n_layers, num_heads=num_heads)

    sim = (h_s * h_t).sum(-1)
    top_idx = torch.topk(sim, top_k).indices
    ch_s, ch_t = h_s[top_idx], h_t[top_idx]
    y = torch.relu(torch.cat([ch_s, ch_t], dim=1) @ sd["mlp.0.weight"].T + sd["mlp.0.bias"])
    y = torch.relu(y @ sd["mlp.2.weight"].T + sd["mlp.2.bias"])
    scores = (y @ sd["mlp.4.weight"].T + sd["mlp.4.bias"]).squeeze(-1)

    R, t = weighted_kabsch(x_s, x_t, h_s, h_t, labels)
    return dict(h_src=h_s, x_src=x_s, h_tgt=h_t, x_tgt=x_t, sim=sim,
                top_idx=top_idx, scores=scores, R=R, t=t)


def _kabsch_core(vs, vt, w):
    """Shared weighted-Kabsch tail: renorm (+1e-6), H + 1e-6 I, SVD, det fix."""
    w = w / (w.sum() + 1e-6)
    cs = (w[:, None] * vs).sum(0, keepdim=True)
    ct = (w[:, None] * vt).sum(0, keepdim=True)
    H = (w[:, None, None] * (vs - cs)[:, :, None] @ (vt - ct)[:, None, :]).sum(0)
    H = H + 1e-6 * torch.eye(3)
    U, S, Vt = torch.linalg.svd(H)
    R = Vt.T @ U.T
    if torch.det(R) < 0:
        Vt = Vt.clone()
        Vt[-1, :] *= -1
        R = Vt.T @ U.T
    t = ct.squeeze() - R @ cs.squeeze()
    return R, t


def eval_head_forward(sd: dict, h_src, x_src, edges_src, h_tgt, x_tgt,
                      edges_tgt, n_layers=3, num_heads=4, top_k=128,
                      literal=False):
    """Score-fusion eval head (/root/reference/src/eval_egnn_metrics.py:689-818)
    at batch 1.

    Semantics: top-k selection on the PRE-EGNN feature similarity (:749);
    score-MLP logits over post-EGNN features at those indices (:742); fusion
    conditions pred>0.5 & (|pred-1| < raw_topk | pred < raw_topk) replace raw
    similarities (:761-764); fused weights scatter back over all N (:767-768),
    sum-normalize (+1e-6, :771), softmax (:774), and weighted Kabsch over the
    ORIGINAL full clouds (:786-818).

    `literal=False` (default) applies the fusion per top-k slot — the evident
    intent. `literal=True` reproduces the reference's shape accident exactly:
    pred_scores there is a flat [B*K] vector (:739-742) while the similarity
    gather is [B,K,1], so every broadcast in :761-764 aligns pred along a new
    trailing axis and the scatter source column [.., j, 0] reduces to
    cond(pred[0], raw_topk[j]) ? pred[0] : raw_topk[j] — slot 0's score is the
    only one ever fused in (verified bit-exact against the imported reference
    code in test_checkpoint_parity.py).
    """
    e_attr_s = torch.ones(edges_src[0].shape[0], 1)
    e_attr_t = torch.ones(edges_tgt[0].shape[0], 1)
    h_s, x_s = egnn_forward(sd, h_src, x_src, *edges_src, e_attr_s,
                            prefix="egnn.", n_layers=n_layers, num_heads=num_heads)
    h_t, x_t = egnn_forward(sd, h_tgt, x_tgt, *edges_tgt, e_attr_t,
                            prefix="egnn.", n_layers=n_layers, num_heads=num_heads)

    raw_sim = (h_src * h_tgt).sum(-1)                       # pre-EGNN
    top_idx = torch.topk(raw_sim, top_k).indices
    ch_s, ch_t = h_s[top_idx], h_t[top_idx]
    y = torch.relu(torch.cat([ch_s, ch_t], dim=1) @ sd["mlp.0.weight"].T + sd["mlp.0.bias"])
    y = torch.relu(y @ sd["mlp.2.weight"].T + sd["mlp.2.bias"])
    pred = (y @ sd["mlp.4.weight"].T + sd["mlp.4.bias"]).squeeze(-1)

    raw_topk = raw_sim[top_idx]
    pf = pred[0].expand_as(pred) if literal else pred
    cond = (pf > 0.5) & ((torch.abs(pf - 1.0) < raw_topk) | (pf < raw_topk))
    fused_topk = torch.where(cond, pf, raw_topk)

    fused = raw_sim.clone()
    fused[top_idx] = fused_topk
    fused = fused / (fused.sum() + 1e-6)
    weights = torch.softmax(fused, dim=-1)

    R, t = _kabsch_core(x_src, x_tgt, weights)              # ORIGINAL coords
    return dict(h_src=h_s, x_src=x_s, h_tgt=h_t, x_tgt=x_t, raw_sim=raw_sim,
                top_idx=top_idx, pred=pred, weights=weights, R=R, t=t)


def load_state_dict(path: str) -> dict:
    ck = torch.load(path, map_location="cpu", weights_only=False)
    return {k: v.float() for k, v in ck["cross_attention_state_dict"].items()}
