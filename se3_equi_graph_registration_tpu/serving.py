"""Production serving API: a warm, jit-cached registration callable.

The reference has no inference API at all — eval is a 1.4k-line script. Here:

    reg = Registrar.from_checkpoint("checkpoint-3dmatch.pth")
    R, t, info = reg.register(src_pts, src_feat, tgt_pts, tgt_feat)

- accepts single pairs [N, ·] or batches [B, N, ·];
- pads/samples to the compiled shape so ONE compiled program serves any input
  size (XLA static shapes without per-request recompiles);
- `fast=True` (default) uses the fused-Pallas / approx-selection / quaternion
  pipeline benchmarked in bench.py; `fast=False` is the checkpoint-parity path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .train import engine
from .train.checkpoints import convert_reference_checkpoint


class Registrar:
    def __init__(self, params, cfg: engine.EngineConfig,
                 head_mode: str = "eval_fusion"):
        self.cfg = cfg
        self.params = params
        self.model = engine.build_model(cfg, head_mode=head_mode)
        self._apply = jax.jit(
            lambda p, b: engine._apply_with_graphs(self.model, cfg, p, b))

    @classmethod
    def from_checkpoint(cls, path: str, fast: bool = True,
                        num_nodes: int = 2048, head_mode: str = "eval_fusion",
                        **cfg_overrides) -> "Registrar":
        base = engine.fast_tpu_config if fast else engine.EngineConfig
        cfg = base(num_nodes=num_nodes, **cfg_overrides)
        if path.endswith(".pth"):
            params = convert_reference_checkpoint(
                path, n_layers=cfg.n_layers, num_heads=cfg.num_heads,
                hidden=cfg.hidden_nf)
        else:
            from .train.checkpoints import TrainCheckpointer
            model = engine.build_model(cfg, head_mode=head_mode)
            opt = engine.build_optimizer(cfg)
            dummy = {k: jnp.zeros(v) for k, v in {
                "src_feat": (1, num_nodes, cfg.in_node_nf),
                "src_pts": (1, num_nodes, 3),
                "tgt_feat": (1, num_nodes, cfg.in_node_nf),
                "tgt_pts": (1, num_nodes, 3),
                "labels": (1, num_nodes),
            }.items()}
            template = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0),
                                         dummy)
            restored = TrainCheckpointer(path).restore_latest(template)
            if restored is None:
                raise FileNotFoundError(f"no checkpoint under {path}")
            params = restored[0].params
        return cls(params, cfg, head_mode)

    def _fit_n(self, arr: np.ndarray, n: int, rng: np.random.Generator):
        """Sample down or pad (with replacement) to the compiled point count."""
        cur = arr.shape[0]
        if cur == n:
            return arr, np.arange(n)
        if cur > n:
            idx = rng.choice(cur, n, replace=False)
        else:
            idx = np.concatenate([np.arange(cur),
                                  rng.choice(cur, n - cur, replace=True)])
        return arr[idx], idx

    def register(self, src_pts, src_feat, tgt_pts, tgt_feat,
                 labels: Optional[np.ndarray] = None, seed: int = 0):
        """Returns (R [B,3,3], t [B,3], info dict). Unbatched inputs accepted."""
        squeeze = np.asarray(src_pts).ndim == 2
        if squeeze:
            src_pts, src_feat = src_pts[None], src_feat[None]
            tgt_pts, tgt_feat = tgt_pts[None], tgt_feat[None]
            if labels is not None:
                labels = labels[None]

        n = self.cfg.num_nodes
        rng = np.random.default_rng(seed)
        b = len(src_pts)
        out_s_pts, out_s_feat, out_t_pts, out_t_feat, out_lbl = [], [], [], [], []
        for i in range(b):
            sp, idx = self._fit_n(np.asarray(src_pts[i], np.float32), n, rng)
            tp, _ = (np.asarray(tgt_pts[i], np.float32)[idx], idx) \
                if len(tgt_pts[i]) == len(src_pts[i]) else \
                self._fit_n(np.asarray(tgt_pts[i], np.float32), n, rng)
            out_s_pts.append(sp)
            out_s_feat.append(np.asarray(src_feat[i], np.float32)[idx])
            out_t_pts.append(tp)
            out_t_feat.append(np.asarray(tgt_feat[i], np.float32)[idx]
                              if len(tgt_feat[i]) == len(src_feat[i])
                              else self._fit_n(np.asarray(tgt_feat[i], np.float32), n, rng)[0])
            out_lbl.append(np.asarray(labels[i], np.float32)[idx]
                           if labels is not None else np.ones(n, np.float32))

        batch = {
            "src_pts": jnp.asarray(np.stack(out_s_pts)),
            "src_feat": jnp.asarray(np.stack(out_s_feat)),
            "tgt_pts": jnp.asarray(np.stack(out_t_pts)),
            "tgt_feat": jnp.asarray(np.stack(out_t_feat)),
            "labels": jnp.asarray(np.stack(out_lbl)),
        }
        out = self._apply(self.params, batch)
        R, t = np.asarray(out.R), np.asarray(out.t)
        info = {"similarity_mean": float(jnp.mean(out.similarity))}
        if squeeze:
            return R[0], t[0], info
        return R, t, info
