"""Pose-regression head: shared EGNN over both clouds + correspondence scoring
+ weighted-Kabsch SVD solve.

Capability parity with the reference's `CrossAttentionPoseRegression`
(/root/reference/src/3dmatch_train_egnn_with_batch.py:585-796 — train head) and
its eval variant with score-fusion weighting
(/root/reference/src/eval_egnn_metrics.py:594-827), redesigned TPU-first:

- the per-batch-element Python loops over EGNN passes (:645-669) and Kabsch
  solves (:702-757) become batched dense ops — the whole head jits as one
  static-shape program, so batch>1 works by construction (the reference is
  only correct at batch 1, README.md:19);
- boolean-mask indexing becomes masked softmax weights (ops/kabsch.py);
- losses are computed OUTSIDE the model (train/losses.py) from the returned
  `RegistrationOutputs`, keeping the module a pure function.

The unused-but-checkpointed auxiliary heads (shared_mlp_decoder, shallow_mlp_pose,
bn1/bn2; reference :602-618) are deliberately not reimplemented — they do not
participate in any forward path (SURVEY.md §2.1).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.kabsch import kabsch_weighted, masked_softmax
from .egnn import EGNN
from .pointnet import PointNet

Array = jax.Array


class RegistrationOutputs(NamedTuple):
    R: Array                  # [B, 3, 3] predicted rotation
    t: Array                  # [B, 3] predicted translation
    scores: Array             # [B, top_k] correspondence logits (train head)
    top_labels: Array         # [B, top_k] labels gathered at top-k indices
    top_indices: Array        # [B, top_k]
    similarity: Array         # [B, N] post-EGNN feature similarity
    raw_similarity: Array     # [B, N] pre-EGNN feature similarity
    h_src: Array              # [B, N, C] post-EGNN source features
    x_src: Array              # [B, N, 3] post-EGNN source coords
    h_tgt: Array              # [B, N, C]
    x_tgt: Array              # [B, N, 3]
    weights: Array            # [B, N] Kabsch correspondence weights


def fuse_scores(pred_scores: Array, raw_topk: Array, literal: bool = False) -> Array:
    """Score-fusion rule of the eval head (eval_egnn_metrics.py:761-764).

    pred_scores/raw_topk: [B, K]. Where the score MLP is confident
    (pred > 0.5) and beats the raw similarity under either condition
    (|pred-1| < raw or pred < raw), its logit replaces the raw value.

    literal=True reproduces the reference's broadcast accident: the [B*K]
    pred vector broadcasts against [B,K,1] similarities, so the scatter
    source column fuses every slot with pred[0] (see
    tests/torch_oracle.py:eval_head_forward for the full derivation).
    """
    if literal:
        pred_scores = jnp.broadcast_to(pred_scores[..., :1], pred_scores.shape)
    confident = pred_scores > 0.5
    cond1 = confident & (jnp.abs(pred_scores - 1.0) < raw_topk)
    cond2 = confident & (pred_scores < raw_topk)
    return jnp.where(cond1 | cond2, pred_scores, raw_topk)


def _batched_gather(values: Array, idx: Array) -> Array:
    """Gather rows [B, N, C] (or [B, N]) at idx [B, K] → [B, K, C] / [B, K]."""
    if values.ndim == 2:
        return jnp.take_along_axis(values, idx, axis=1)
    return jnp.take_along_axis(values, idx[..., None], axis=1)


class ScoreMLP(nn.Module):
    """Correspondence-score MLP 2H → H → H/2 → 1 (reference :594-600)."""
    hidden_nf: int

    @nn.compact
    def __call__(self, feats: Array) -> Array:
        y = nn.Dense(self.hidden_nf, name="dense_0")(feats)
        y = nn.relu(y)
        y = nn.Dense(self.hidden_nf // 2, name="dense_1")(y)
        y = nn.relu(y)
        y = nn.Dense(1, name="dense_2")(y)
        return y[..., 0]


class RegistrationModel(nn.Module):
    """End-to-end correspondence-graph registration model."""
    num_nodes: int = 2048
    hidden_nf: int = 32
    in_node_nf: int = 32
    n_layers: int = 3
    num_heads: int = 4
    top_k: int = 128
    edge_attr_dim: int = 1
    direction: str = "center"
    so3_mode: str = "frame"
    head_mode: str = "train"   # 'train' | 'eval_fusion'
    egnn_impl: str = "xla"     # 'xla' | 'pallas' (fused TPU layer kernel)
    kabsch_solver: str = "svd" # 'svd' | 'quaternion' (Horn power iteration)
    topk_method: str = "exact" # 'exact' | 'approx' (lax.approx_max_k)
    egnn_accurate: bool = True # pallas: 3-pass fp32 matmuls vs 1-pass bf16
    use_pointnet: bool = False # learn descriptors end-to-end (README.md:69)
    # eval_fusion only: False = per-slot fusion (the evident intent of
    # eval_egnn_metrics.py:761-764); True = bit-faithful reproduction of the
    # reference's shape-broadcast accident, where torch.where's [B*K] pred
    # scores broadcast against [B,K,1] similarities so the scatter source
    # column reduces to pred[0] — every slot is fused with the FIRST top-k
    # score (see tests/torch_oracle.py eval_head_forward for the derivation).
    fusion_literal: bool = False
    # Kabsch weight scores: 'dot' = raw feature dot products (reference
    # :717-718 — saturates the softmax to one-hot whenever post-EGNN feature
    # norms grow, freezing R at identity through degenerate H; measurable at
    # INIT already, h std ~6 per layer) | 'cosine' = normalized similarity,
    # bounded [-1, 1], trains robustly. Default keeps reference parity.
    weight_mode: str = "dot"
    # eval_fusion Kabsch weighting: 'reference' = the reference's
    # sum-normalize-then-softmax (:771-774) — dividing by the sum squashes
    # every entry to ~1/N, so the softmax is NEAR-UNIFORM and the pose
    # degrades to unweighted Kabsch (measured: 26 cm translation error at
    # 70% inliers with the shipped checkpoint, in ANY config).
    # 'sharp' = softmax(fused / fusion_temp) on the UN-squashed fused scores:
    # measured on the shipped checkpoint (synthetic eval pairs, N=2048) it
    # recovers 0.04/0.05/0.08 cm translation and 0.95/0.84/0.71 recall at
    # 90/70/50% inliers vs the reference weighting's 9.2/26/45 cm and
    # 0.61/0.0/0.0. Default keeps reference parity.
    fusion_weighting: str = "reference"
    fusion_temp: float = 0.1

    def setup(self):
        self.egnn = EGNN(
            in_node_nf=self.in_node_nf, hidden_nf=self.hidden_nf,
            out_node_nf=self.hidden_nf, edge_attr_dim=self.edge_attr_dim,
            n_layers=self.n_layers, num_heads=self.num_heads,
            direction=self.direction, so3_mode=self.so3_mode, name="egnn",
        )
        self.score_mlp = ScoreMLP(self.hidden_nf, name="mlp")
        if self.use_pointnet:
            self.pointnet = PointNet(hidden_channels=self.hidden_nf,
                                     out_channels=self.in_node_nf,
                                     name="pointnet")

    def __call__(self, h_src: Array, x_src: Array, nbr_src: Array,
                 h_tgt: Array, x_tgt: Array, nbr_tgt: Array,
                 labels: Array,
                 edge_mask_src: Optional[Array] = None,
                 edge_mask_tgt: Optional[Array] = None) -> RegistrationOutputs:
        """h_*: [B, N, C_in]; x_*: [B, N, 3]; nbr_*: [B, N, K]; labels: [B, N]."""
        if self.use_pointnet:
            # optional end-to-end learned descriptors replacing the offline
            # FCGF/FPFH features (reference use_pointnet path, :1646)
            h_src = self.pointnet(x_src, nbr_src, edge_mask_src)
            h_tgt = self.pointnet(x_tgt, nbr_tgt, edge_mask_tgt)
        raw_h_src, raw_h_tgt = h_src, h_tgt
        raw_x_src, raw_x_tgt = x_src, x_tgt

        # ONE shared-weight EGNN applied to both clouds, batched — the two
        # calls share parameters exactly like the reference's single egnn
        # module invoked twice (:662-663).
        use_pallas = (self.egnn_impl == "pallas" and not self.is_initializing()
                      and edge_mask_src is None and edge_mask_tgt is None
                      and self.direction == "center" and self.so3_mode == "frame")
        if use_pallas:
            import jax as _jax

            from ..ops.pallas.egcl_kernel import egnn_forward_pallas
            variables = {"params": self.egnn.variables["params"]}
            # off-TPU (CPU tests / debugging) the kernels run interpreted
            interp = _jax.default_backend() != "tpu"
            h_src, x_src = egnn_forward_pallas(variables, h_src, x_src, nbr_src,
                                               accurate=self.egnn_accurate,
                                               interpret=interp)
            h_tgt, x_tgt = egnn_forward_pallas(variables, h_tgt, x_tgt, nbr_tgt,
                                               accurate=self.egnn_accurate,
                                               interpret=interp)
        else:
            h_src, x_src = self.egnn(h_src, x_src, nbr_src, edge_mask=edge_mask_src)
            h_tgt, x_tgt = self.egnn(h_tgt, x_tgt, nbr_tgt, edge_mask=edge_mask_tgt)

        return self.head_from_embeddings(
            raw_h_src, raw_h_tgt, raw_x_src, raw_x_tgt,
            h_src, x_src, h_tgt, x_tgt, labels)

    def head_from_embeddings(self, raw_h_src: Array, raw_h_tgt: Array,
                             raw_x_src: Array, raw_x_tgt: Array,
                             h_src: Array, x_src: Array,
                             h_tgt: Array, x_tgt: Array,
                             labels: Array) -> RegistrationOutputs:
        """Post-EGNN head: scoring + weighted Kabsch from (raw, embedded)
        features. Split out so sharded execution paths (e.g. the point-axis
        sharded EGNN in parallel/point_sharding.py) can run the embedding
        stage under shard_map and this head on the re-assembled arrays."""
        similarity = jnp.sum(h_src * h_tgt, axis=-1)          # [B, N]
        raw_similarity = jnp.sum(raw_h_src * raw_h_tgt, axis=-1)

        if self.head_mode == "eval_fusion":
            return self._eval_head(
                raw_similarity, similarity, h_src, x_src, h_tgt, x_tgt,
                raw_x_src, raw_x_tgt, labels)

        # --- train head (reference :679-796) ---
        top_idx = self._top_k(similarity)
        comp_h_src = _batched_gather(h_src, top_idx)          # [B, k, C]
        comp_h_tgt = _batched_gather(h_tgt, top_idx)
        top_labels = _batched_gather(labels, top_idx)

        scores = self.score_mlp(jnp.concatenate([comp_h_src, comp_h_tgt], axis=-1))

        # Weighted Kabsch over label-valid correspondences, post-EGNN geometry.
        if self.weight_mode == "cosine":
            ns = jnp.linalg.norm(h_src, axis=-1, keepdims=True) + 1e-6
            nt = jnp.linalg.norm(h_tgt, axis=-1, keepdims=True) + 1e-6
            weight_scores = jnp.sum((h_src / ns) * (h_tgt / nt), axis=-1)
        elif self.weight_mode == "dot":
            weight_scores = jnp.sum(h_src * h_tgt, axis=-1)
        else:
            raise ValueError(f"unknown weight_mode {self.weight_mode!r}")
        weights = masked_softmax(weight_scores, labels)
        R, t = kabsch_weighted(x_src, x_tgt, weights, solver=self.kabsch_solver)

        return RegistrationOutputs(
            R=R, t=t, scores=scores, top_labels=top_labels, top_indices=top_idx,
            similarity=similarity, raw_similarity=raw_similarity,
            h_src=h_src, x_src=x_src, h_tgt=h_tgt, x_tgt=x_tgt, weights=weights,
        )

    def _top_k(self, scores: Array) -> Array:
        """Top-k selection; 'approx' uses the TPU-native approx_max_k (the
        exact lax.top_k costs ~10ms at [16, 2048] — the selection SET barely
        differs and ordering is irrelevant to the BCE/fusion heads)."""
        if (self.top_k == scores.shape[-1]
                and not (self.head_mode == "eval_fusion" and self.fusion_literal)):
            # k == N selects everything (the KITTI head config, reference
            # kitti driver :663) — skip the sort; downstream consumers are
            # permutation-invariant (BCE mean, fusion scatter by index).
            # EXCEPT literal fusion: it replays slot 0's score everywhere,
            # and slot 0 must be the argmax like the reference's torch.topk.
            return jnp.broadcast_to(
                jnp.arange(self.top_k, dtype=jnp.int32), scores.shape)
        if self.topk_method == "approx":
            _, idx = jax.lax.approx_max_k(scores, self.top_k)
        else:
            _, idx = jax.lax.top_k(scores, self.top_k)
        return idx

    def _eval_head(self, raw_similarity, similarity, h_src, x_src, h_tgt, x_tgt,
                   raw_x_src, raw_x_tgt, labels) -> RegistrationOutputs:
        """Score-fusion eval head (/root/reference/src/eval_egnn_metrics.py:689-818).

        Top-k selection uses the PRE-EGNN similarity; the score MLP's sigmoid-
        free logits replace raw similarities where they are confident
        (conditions :761-764); fused weights scatter back over all N points,
        are sum-normalized then softmaxed, and Kabsch runs over the ORIGINAL
        coordinates of the full clouds (:786-818).
        """
        b, n = raw_similarity.shape
        top_idx = self._top_k(raw_similarity)
        comp_h_src = _batched_gather(h_src, top_idx)
        comp_h_tgt = _batched_gather(h_tgt, top_idx)
        top_labels = _batched_gather(labels, top_idx)

        pred_scores = self.score_mlp(jnp.concatenate([comp_h_src, comp_h_tgt], axis=-1))
        raw_topk = _batched_gather(raw_similarity, top_idx)

        fused_topk = fuse_scores(pred_scores, raw_topk,
                                 literal=self.fusion_literal)

        # Scatter fused top-k weights back into the full-N similarity vector.
        # Cast explicitly: a weak-dtype promotion here (e.g. float64 inputs
        # under x64) turns into a hard scatter-dtype error in future JAX.
        fused_topk = fused_topk.astype(raw_similarity.dtype)
        fused = jax.vmap(lambda s, i, v: s.at[i].set(v))(raw_similarity, top_idx, fused_topk)
        if self.fusion_weighting == "sharp":
            weights = jax.nn.softmax(fused / self.fusion_temp, axis=-1)
        elif self.fusion_weighting == "reference":
            fused = fused / (jnp.sum(fused, axis=-1, keepdims=True) + 1e-6)
            weights = jax.nn.softmax(fused, axis=-1)
        else:
            raise ValueError(
                f"unknown fusion_weighting {self.fusion_weighting!r}")

        R, t = kabsch_weighted(raw_x_src, raw_x_tgt, weights,
                               solver=self.kabsch_solver)

        return RegistrationOutputs(
            R=R, t=t, scores=pred_scores, top_labels=top_labels, top_indices=top_idx,
            similarity=similarity, raw_similarity=raw_similarity,
            h_src=h_src, x_src=x_src, h_tgt=h_tgt, x_tgt=x_tgt, weights=weights,
        )
