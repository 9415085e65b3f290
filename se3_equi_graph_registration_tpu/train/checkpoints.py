"""Checkpoint I/O: orbax-based native checkpoints + PyTorch reference converter.

Capability parity with the reference's `save_checkpoint`/`load_checkpoint`
(/root/reference/src/3dmatch_train_egnn_with_batch.py:1310-1395): dicts of
{epoch, model state, optimizer state}, periodic + best-val saves — here as a
single orbax-backed TrainCheckpointer, plus `convert_reference_checkpoint` that
maps the two shipped `.pth` files onto this framework's flax parameter tree.

Conversion notes (shapes recovered from the shipped checkpoints, SURVEY.md §2.1):
the trained config is hidden=32, 3 EGCL layers, 4 edge-MLP heads of width 8
(the reference code default num_heads=1 at :186 does NOT match its own
checkpoints). torch Linear weights are [out, in] → transposed to flax [in, out];
the per-head edge MLPs are fused into one [77, 32] kernel + a [heads, 8, 8]
block-diagonal stack (models/egnn.py MultiHeadEdgeMLP).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_EGNN_CONFIG = dict(
    in_node_nf=32, hidden_nf=32, out_node_nf=32, edge_attr_dim=1,
    n_layers=3, num_heads=4,
)


def _t(w) -> np.ndarray:
    """torch [out, in] weight → flax [in, out] kernel."""
    return np.ascontiguousarray(np.asarray(w).T)


def _convert_egnn_tree(sd: dict, prefix: str = "", n_layers: int = 3,
                       num_heads: int = 4, hidden: int = 32) -> dict:
    """Map a reference EGNN state-dict (possibly under `prefix`) to flax params."""
    g = lambda k: np.asarray(sd[prefix + k])
    tree: dict[str, Any] = {
        "embedding_in": {"kernel": _t(g("embedding_in.weight")),
                         "bias": g("embedding_in.bias")},
        "embedding_out": {"kernel": _t(g("embedding_out.weight")),
                          "bias": g("embedding_out.bias")},
    }
    w = hidden // num_heads
    for i in range(n_layers):
        p = f"gcl_{i}."
        fused_k = np.concatenate(
            [_t(g(p + f"edge_mlps.{h}.0.weight")) for h in range(num_heads)], axis=1)
        fused_b = np.concatenate(
            [g(p + f"edge_mlps.{h}.0.bias") for h in range(num_heads)], axis=0)
        head_k = np.stack(
            [_t(g(p + f"edge_mlps.{h}.2.weight")) for h in range(num_heads)], axis=0)
        head_b = np.stack(
            [g(p + f"edge_mlps.{h}.2.bias") for h in range(num_heads)], axis=0)
        assert head_k.shape == (num_heads, w, w), head_k.shape
        tree[f"gcl_{i}"] = {
            "edge_mlp": {
                "fused_in": {"kernel": fused_k, "bias": fused_b},
                "head_kernels": head_k,
                "head_biases": head_b,
            },
            "layer_norm": {"scale": g(p + "layer_norm.weight"),
                           "bias": g(p + "layer_norm.bias")},
            "node_mlp_0": {"kernel": _t(g(p + "node_mlp.0.weight")),
                           "bias": g(p + "node_mlp.0.bias")},
            "node_mlp_1": {"kernel": _t(g(p + "node_mlp.2.weight")),
                           "bias": g(p + "node_mlp.2.bias")},
            "coord_mlp_0": {"kernel": _t(g(p + "coord_mlp.0.weight")),
                            "bias": g(p + "coord_mlp.0.bias")},
            "coord_mlp_out": {"kernel": _t(g(p + "coord_mlp.2.weight"))},
        }
    return tree


def convert_reference_checkpoint(path: str, n_layers: int = 3,
                                 num_heads: int = 4, hidden: int = 32) -> dict:
    """Load a reference `.pth` checkpoint and return flax params for
    `RegistrationModel` ({'params': {'egnn': ..., 'mlp': ...}}).

    Uses the `cross_attention_state_dict` (which embeds the shared EGNN and the
    score MLP). The unused aux heads (shared_mlp_decoder, shallow_mlp_pose,
    bn1/bn2) are dropped.
    """
    import torch  # torch-cpu is available in the image; only used for IO here

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else v
          for k, v in ck["cross_attention_state_dict"].items()}

    egnn_tree = _convert_egnn_tree(sd, prefix="egnn.", n_layers=n_layers,
                                   num_heads=num_heads, hidden=hidden)
    mlp_tree = {
        "dense_0": {"kernel": _t(sd["mlp.0.weight"]), "bias": np.asarray(sd["mlp.0.bias"])},
        "dense_1": {"kernel": _t(sd["mlp.2.weight"]), "bias": np.asarray(sd["mlp.2.bias"])},
        "dense_2": {"kernel": _t(sd["mlp.4.weight"]), "bias": np.asarray(sd["mlp.4.bias"])},
    }
    params = {"params": {"egnn": egnn_tree, "mlp": mlp_tree}}
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)


def convert_reference_egnn(path: str, **kw) -> dict:
    """Flax params for a bare `EGNN` module from the checkpoint's standalone
    `egnn_state_dict` (duplicated copy of the shared EGNN weights)."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else v
          for k, v in ck["egnn_state_dict"].items()}
    tree = _convert_egnn_tree(sd, prefix="", **kw)
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), {"params": tree})


def _rt(k) -> "np.ndarray":
    """flax [in, out] kernel → torch [out, in] weight (fp32 — the reference
    schema is fp32, and torch can't ingest ml_dtypes.bfloat16 arrays from
    `bf16_params=True` checkpoints)."""
    return np.ascontiguousarray(np.asarray(k, dtype=np.float32).T)


def _export_egnn_sd(tree: dict, prefix: str = "", n_layers: int = 3,
                    num_heads: int = 4, hidden: int = 32) -> dict:
    """Inverse of `_convert_egnn_tree`: flax EGNN params → reference
    state-dict tensors (numpy; caller wraps in torch)."""
    sd: dict[str, np.ndarray] = {
        prefix + "embedding_in.weight": _rt(tree["embedding_in"]["kernel"]),
        prefix + "embedding_in.bias": np.asarray(tree["embedding_in"]["bias"]),
        prefix + "embedding_out.weight": _rt(tree["embedding_out"]["kernel"]),
        prefix + "embedding_out.bias": np.asarray(tree["embedding_out"]["bias"]),
    }
    w = hidden // num_heads
    for i in range(n_layers):
        g, p = tree[f"gcl_{i}"], f"{prefix}gcl_{i}."
        fused_k = np.asarray(g["edge_mlp"]["fused_in"]["kernel"])   # [77, H]
        fused_b = np.asarray(g["edge_mlp"]["fused_in"]["bias"])     # [H]
        head_k = np.asarray(g["edge_mlp"]["head_kernels"])          # [h, w, w]
        head_b = np.asarray(g["edge_mlp"]["head_biases"])           # [h, w]
        for h in range(num_heads):
            sd[p + f"edge_mlps.{h}.0.weight"] = _rt(fused_k[:, h * w:(h + 1) * w])
            sd[p + f"edge_mlps.{h}.0.bias"] = fused_b[h * w:(h + 1) * w]
            sd[p + f"edge_mlps.{h}.2.weight"] = _rt(head_k[h])
            sd[p + f"edge_mlps.{h}.2.bias"] = head_b[h]
        sd[p + "layer_norm.weight"] = np.asarray(g["layer_norm"]["scale"])
        sd[p + "layer_norm.bias"] = np.asarray(g["layer_norm"]["bias"])
        sd[p + "node_mlp.0.weight"] = _rt(g["node_mlp_0"]["kernel"])
        sd[p + "node_mlp.0.bias"] = np.asarray(g["node_mlp_0"]["bias"])
        sd[p + "node_mlp.2.weight"] = _rt(g["node_mlp_1"]["kernel"])
        sd[p + "node_mlp.2.bias"] = np.asarray(g["node_mlp_1"]["bias"])
        sd[p + "coord_mlp.0.weight"] = _rt(g["coord_mlp_0"]["kernel"])
        sd[p + "coord_mlp.0.bias"] = np.asarray(g["coord_mlp_0"]["bias"])
        sd[p + "coord_mlp.2.weight"] = _rt(g["coord_mlp_out"]["kernel"])
    return sd


def export_reference_checkpoint(params: dict, path: str, epoch: int = 0,
                                lr: float = 1e-4, n_layers: int = 3,
                                num_heads: int = 4, hidden: int = 32,
                                seed: int = 0) -> None:
    """Inverse of `convert_reference_checkpoint`: write a `.pth` that the
    reference's `load_checkpoint` (src/3dmatch_train_egnn_with_batch.py:
    1351-1395) loads with strict state-dicts — so weights trained in this
    framework round-trip back into the reference ecosystem.

    The checkpoint schema (:1332-1337) is {epoch, egnn_state_dict,
    cross_attention_state_dict, optimizer_state_dict}. The head's aux modules
    (shared_mlp_decoder, shallow_mlp_pose, bn1/bn2 — present in every
    reference checkpoint but unused by its forward pass) have no counterpart
    here, so they are emitted at the reference's initialization values
    (PyTorch Linear default init, seeded; BatchNorm identity). The optimizer
    entry is a fresh Adam state over the head's parameter list (:1412).
    """
    import torch

    egnn_tree = params["params"]["egnn"]
    mlp_tree = params["params"]["mlp"]

    egnn_sd = _export_egnn_sd(egnn_tree, prefix="", n_layers=n_layers,
                              num_heads=num_heads, hidden=hidden)
    ca: dict[str, np.ndarray] = _export_egnn_sd(
        egnn_tree, prefix="egnn.", n_layers=n_layers, num_heads=num_heads,
        hidden=hidden)
    for i, name in ((0, "dense_0"), (2, "dense_1"), (4, "dense_2")):
        ca[f"mlp.{i}.weight"] = _rt(mlp_tree[name]["kernel"])
        ca[f"mlp.{i}.bias"] = np.asarray(mlp_tree[name]["bias"])

    rng = np.random.default_rng(seed)

    def linear(pfx: str, fan_in: int, fan_out: int):
        # PyTorch Linear default (kaiming-uniform a=sqrt(5) → U(±1/sqrt(in)))
        bound = 1.0 / np.sqrt(fan_in)
        ca[pfx + ".weight"] = rng.uniform(
            -bound, bound, (fan_out, fan_in)).astype(np.float32)
        ca[pfx + ".bias"] = rng.uniform(
            -bound, bound, (fan_out,)).astype(np.float32)

    linear("shared_mlp_decoder.0", (hidden + 3) * 2, 128)   # :602-606
    linear("shared_mlp_decoder.2", 128, 64)
    linear("shallow_mlp_pose.0", 64, 32)                    # :609-613
    linear("shallow_mlp_pose.2", 32, 7)
    for bn, dim in (("bn1", hidden), ("bn2", hidden + 3)):  # :617-618
        ca[bn + ".weight"] = np.ones(dim, np.float32)
        ca[bn + ".bias"] = np.zeros(dim, np.float32)
        ca[bn + ".running_mean"] = np.zeros(dim, np.float32)
        ca[bn + ".running_var"] = np.ones(dim, np.float32)
        ca[bn + ".num_batches_tracked"] = np.asarray(0, np.int64)

    # copy: jax buffers surface as non-writable numpy views, which torch
    # rejects with a UserWarning; fp32-cast floats (bf16_params checkpoints
    # carry ml_dtypes.bfloat16, which torch can't convert)
    def _to(v):
        a = np.asarray(v)
        # jnp.issubdtype is ml_dtypes-aware (np kind for bfloat16 is not 'f')
        if jnp.issubdtype(a.dtype, jnp.floating) and a.dtype != np.float32:
            a = a.astype(np.float32)
        return torch.from_numpy(np.array(a, copy=True))

    to_torch = lambda sd: {k: _to(v) for k, v in sd.items()}
    n_params = sum(1 for k in ca
                   if not k.endswith(("running_mean", "running_var",
                                      "num_batches_tracked")))
    ck = {
        "epoch": int(epoch),
        "egnn_state_dict": to_torch(egnn_sd),
        "cross_attention_state_dict": to_torch(ca),
        # fresh Adam(model.parameters(), lr) state (:1412) — loadable, no step
        "optimizer_state_dict": {
            "state": {},
            "param_groups": [{
                "lr": lr, "betas": (0.9, 0.999), "eps": 1e-8,
                "weight_decay": 0, "amsgrad": False, "maximize": False,
                "foreach": None, "capturable": False, "differentiable": False,
                "fused": None, "params": list(range(n_params)),
            }],
        },
    }
    torch.save(ck, path)


class TrainCheckpointer:
    """Orbax checkpointing with periodic + best-val retention and resume.

    Replaces the reference's torch.save dicts (:1310-1395) with a directory of
    orbax checkpoints; `restore_latest` returns (state, step) for resume — a
    capability the reference's driver never wires up (SURVEY.md §5.4).
    """

    def __init__(self, directory: str, keep: int = 5):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, best_fn=None, create=True),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        self.manager.save(step, args=self._ocp.args.StandardSave(state),
                          metrics=metrics)
        self.manager.wait_until_finished()

    def restore_latest(self, template: Any) -> tuple[Any, int] | None:
        step = self.manager.latest_step()
        if step is None:
            return None
        state = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(template))
        return state, step
