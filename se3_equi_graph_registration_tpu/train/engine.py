"""Single train/eval engine — the deduplicated replacement for the reference's
three near-identical 1.4-1.6k-line driver scripts
(src/3dmatch_train_egnn_with_batch.py, src/kitti_train_egnn_with_batch.py,
src/eval_egnn_metrics.py — SURVEY.md §0 duplication map).

Everything device-side is one jitted step: k-NN graph construction, the shared
EGNN over both clouds, the Kabsch head, losses, and the optimizer update.
Data parallelism comes from sharding the pair-batch axis over a mesh
(parallel/mesh.py) — the step function itself is mesh-agnostic; pjit inserts
the gradient psums from the sharding annotations.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.pose_head import RegistrationModel
from ..ops import knn
from . import losses as losses_lib
from . import metrics as metrics_lib

Array = jax.Array


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Array


def fast_tpu_config(**overrides) -> "EngineConfig":
    """Production-throughput knob set: Hilbert-sorted window graphs feeding
    the fused Pallas EGNN with windowed gathers at single-pass matmul
    precision, approx head k-selection, quaternion Kabsch."""
    kw = dict(egnn_impl="pallas", knn_method="morton", kabsch_solver="quaternion",
              topk_method="approx", egnn_accurate=False, knn_packed=True,
              onehot_h_permute=True)
    kw.update(overrides)
    return EngineConfig(**kw)


def robust_eval_config(**overrides) -> "EngineConfig":
    """The full robust eval/serving stack on top of the fast config: 'sharp'
    fusion weighting + spectral-matching inlier reweighting + IRLS pose
    polish. Holds registration recall at its √(inlier-ratio) ceiling down to
    5% inliers on the shipped checkpoint for +0.04 ms/pair (BASELINE.md
    tables). Opt-in because each stage departs from reference parity."""
    kw = dict(fusion_weighting="sharp", spectral_topm=256, refine_iters=5)
    kw.update(overrides)
    return fast_tpu_config(**kw)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Hyperparameters mirroring the reference defaults
    (src/3dmatch_train_egnn_with_batch.py:1536-1555, :1412-1413)."""
    num_nodes: int = 2048
    k: int = 16                     # train loop hardcodes 16 (:996)
    in_node_nf: int = 32            # 32 FCGF / 33 FPFH(KITTI)
    hidden_nf: int = 32
    n_layers: int = 3
    num_heads: int = 4
    top_k: int = 128                # KITTI head uses 2048 (kitti:663)
    lr: float = 1e-4
    lr_step: int = 200              # StepLR(step_size=200, gamma=0.5)
    lr_gamma: float = 0.5
    lr_step_unit: str = "step"      # 'step' | 'epoch'. The reference's StepLR
                                    # steps per EPOCH (3dmatch driver :1412-
                                    # 1413, 500 epochs); 'epoch' reproduces
                                    # that exactly given steps_per_epoch
                                    # (the dataset presets use it).
    direction: str = "center"
    so3_mode: str = "frame"
    loss_weights: losses_lib.LossWeights = losses_lib.LossWeights()
    remat: bool = False             # jax.checkpoint the EGNN pass
    egnn_impl: str = "xla"          # 'xla' | 'pallas' fused TPU layer kernel
    knn_method: str = "exact"       # 'exact' (lax.top_k) | 'approx'
                                    # (lax.approx_min_k) | 'pallas' (exact
                                    # fused kernel, ~7x faster than top_k) |
                                    # 'morton' (Hilbert-sorted window graph +
                                    # windowed Pallas gathers, ops/morton.py)
    egnn_window: int = 384          # morton mode: curve-window width (lanes)
    egnn_tile: int = 128            # morton mode: kernel center-tile (must
                                    # match between graph builder and kernels)
    curve: str = "hilbert"          # morton mode: 'hilbert' | 'morton'
    knn_recall: float = 0.85        # approx_min_k recall target (v5e: 0.85 is
                                    # 3.4x faster than 0.95 with ~5% more
                                    # neighbor churn the EGNN tolerates)
    knn_packed: bool = False        # morton+pallas: packed int32 (dist, lane)
                                    # extraction keys — ~2x less VPU sweep
                                    # work; near-ties within ~2^-13 relative
                                    # d² may swap (window <= 1024 only)
    onehot_h_permute: bool = False  # morton+pallas fast mode: permute h
                                    # (sort AND unsort) as bf16 one-hot MXU
                                    # matmuls instead of gathers — +11% fwd
                                    # at B=64; h is bf16-rounded (the fast
                                    # kernel rounds it anyway; coordinates
                                    # keep the exact gather). Inactive in
                                    # interpret/accurate modes (same gate as
                                    # the kernel's cast_bf16)
    kabsch_solver: str = "svd"      # 'svd' | 'quaternion'
    topk_method: str = "exact"      # head top-k: 'exact' | 'approx'
    egnn_accurate: bool = True      # pallas matmul precision (fp32 vs bf16)
    weight_mode: str = "dot"        # Kabsch weight scores: 'dot' (reference
                                    # parity; softmax can saturate) | 'cosine'
                                    # (bounded — robust training)
    fusion_literal: bool = False    # eval_fusion head: reproduce the
                                    # reference's broadcast accident
                                    # bit-faithfully (models/pose_head.py)
    fusion_weighting: str = "reference"  # eval_fusion Kabsch weights:
                                    # 'reference' (sum-squash + softmax —
                                    # near-uniform, parity) | 'sharp'
                                    # (softmax(fused/fusion_temp); measured
                                    # 26 cm -> 0.05 cm at 70% inliers on
                                    # the shipped ckpt — pose_head.py)
    fusion_temp: float = 0.1        # 'sharp' softmax temperature
    refine_iters: int = 0           # >0: IRLS robust pose refinement after
                                    # the head (ops/kabsch.kabsch_irls) in
                                    # eval/serving — rescues low-inlier pairs
                                    # (BASELINE.md table); 0 = parity
    refine_kernel: str = "geman"    # IRLS kernel: 'geman'|'cauchy'|'huber'
    spectral_topm: int = 0          # >0: spectral-matching consistency
                                    # reweighting (ops/spectral.py) of the
                                    # head's Kabsch weights in eval/serving —
                                    # principal eigenvector of the top-M
                                    # pairwise-consistency affinity; locates
                                    # the inlier cluster even from the
                                    # reference's near-uniform weighting.
                                    # Composes with refine_iters (IRLS then
                                    # polishes). 0 = parity
    spectral_sigma: float = 0.09    # consistency scale (3DMatch recall tau)
    spectral_iters: int = 12        # power-iteration length
    icp_iters: int = 0              # >0: point-to-point ICP fine registration
                                    # after the head (+ spectral/IRLS if set)
                                    # in eval/serving — re-associates by 1-NN
                                    # geometry each iteration (ops/icp.py),
                                    # so it refines through bad putative
                                    # correspondences. 0 = parity
    icp_tau: float = 0.0            # >0: hard NN-distance gate (trimmed ICP,
                                    # meters); 0 = adaptive MAD-scaled Welsch
    icp_mode: str = "point"         # 'point' (weighted Kabsch) | 'plane'
                                    # (point-to-plane Gauss-Newton against
                                    # target PCA normals — converges on
                                    # differently-sampled surfaces where
                                    # point mode stalls) | 'symmetric'
                                    # (Rusinkiewicz's combined-normal
                                    # objective — wider basin, unbiased on
                                    # curved surfaces) | 'gicp'
                                    # (Generalized ICP: plane-to-plane
                                    # Mahalanobis against covariances on
                                    # BOTH clouds)
    icp_trim: float = 0.0           # >0: keep the best trim-fraction of NN
                                    # residuals per iteration (TrICP — for
                                    # partial overlap, where the adaptive
                                    # scale corrupts); 'auto' (via --set
                                    # engine.icp_trim=auto) estimates the
                                    # overlap itself (Chetverikov objective)
    icp_voxels: tuple = ()          # non-empty: coarse-to-fine ICP over this
                                    # voxel pyramid (ops/icp.py
                                    # icp_refine_multiscale; e.g. (0.4, 0.15,
                                    # 0.0), 0.0 = raw clouds; icp_iters per
                                    # scale). CLI: --set
                                    # engine.icp_voxels=0.4,0.15,0
    use_pointnet: bool = False      # end-to-end descriptor encoder
    grad_accum_steps: int = 1       # optax.MultiSteps micro-batching
    bf16_params: bool = False       # live params in bf16 with stochastic-
                                    # rounding updates + fp32 master in the
                                    # optimizer state (utils/bf16_training)
    best_val_metric: str = "loss"   # best-val checkpoint criterion: 'loss'
                                    # (reference parity — lowest total
                                    # validation loss, 3dmatch driver
                                    # :1435-1437) | 'rot_err_deg' (select by
                                    # validation rotation error instead)


def build_model(cfg: EngineConfig, head_mode: str = "train") -> RegistrationModel:
    return RegistrationModel(
        num_nodes=cfg.num_nodes, in_node_nf=cfg.in_node_nf,
        hidden_nf=cfg.hidden_nf, n_layers=cfg.n_layers, num_heads=cfg.num_heads,
        top_k=cfg.top_k, direction=cfg.direction, so3_mode=cfg.so3_mode,
        head_mode=head_mode, egnn_impl=cfg.egnn_impl,
        kabsch_solver=cfg.kabsch_solver, topk_method=cfg.topk_method,
        egnn_accurate=cfg.egnn_accurate, use_pointnet=cfg.use_pointnet,
        weight_mode=cfg.weight_mode, fusion_literal=cfg.fusion_literal,
        fusion_weighting=cfg.fusion_weighting, fusion_temp=cfg.fusion_temp)


def lr_schedule(cfg: EngineConfig,
                steps_per_epoch: Optional[int] = None) -> optax.Schedule:
    """Staircase decay matching the reference's StepLR(step_size, gamma)
    (src/3dmatch_train_egnn_with_batch.py:1412-1413). StepLR counts EPOCHS;
    with lr_step_unit='epoch' the boundary converts to optimizer steps via
    `steps_per_epoch` (with gradient accumulation the optimizer — and hence
    this schedule — advances once per `grad_accum_steps` micro-batches, so
    pass MICRO-batches per epoch; the division happens here)."""
    transition = cfg.lr_step
    if cfg.lr_step_unit == "epoch":
        if steps_per_epoch is None:
            raise ValueError(
                "lr_step_unit='epoch' requires steps_per_epoch (dataset_size"
                " // batch_size); the CLI computes it from the dataset")
        transition = max(1, cfg.lr_step * steps_per_epoch // cfg.grad_accum_steps)
    elif cfg.lr_step_unit != "step":
        raise ValueError(f"unknown lr_step_unit {cfg.lr_step_unit!r}")
    return optax.exponential_decay(
        init_value=cfg.lr, transition_steps=transition,
        decay_rate=cfg.lr_gamma, staircase=True)


def build_optimizer(cfg: EngineConfig,
                    steps_per_epoch: Optional[int] = None) -> optax.GradientTransformation:
    """Adam + step decay — reference Adam(lr) + StepLR(200, 0.5) (:1412-1413)."""
    opt = optax.adam(lr_schedule(cfg, steps_per_epoch))
    if cfg.bf16_params:
        # INSIDE MultiSteps: accumulation micro-steps must be true no-ops —
        # SR outside would re-dither every weight by up to 1 ulp per
        # micro-step even when the inner update is zero
        from ..utils.bf16_training import bf16_sr_optimizer
        opt = bf16_sr_optimizer(opt)
    if cfg.grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum_steps)
    return opt


def _use_onehot_h_permute(cfg: EngineConfig, interp: bool, n: int) -> bool:
    """Gate for the bf16 one-hot MXU h-permutes (see `_apply_morton_fast`'s
    comment): fast compiled Pallas mode only, and N <= 2048 — the one-hot is
    a [B, N, N] bf16 tensor, O(N²) vs the gather's O(N·C), so at the
    dense-scaling shapes it would cost gigabytes per permute."""
    return (cfg.onehot_h_permute and cfg.egnn_impl == "pallas"
            and not cfg.egnn_accurate and not interp and n <= 2048)


def _apply_morton_fast(model, cfg, params, batch):
    """Curve-window fast path (ROADMAP 'Morton window'): sort each cloud along
    a space-filling curve, build the window-restricted k-NN graph in sorted
    space (ops/morton.py), run the fused Pallas EGNN with windowed gathers
    (N/window fewer one-hot compares), un-sort, and run the scoring/Kabsch
    head on the original point order (labels/similarity pairing preserved —
    src and tgt sort differently, so the permutation must not leak past the
    permutation-equivariant EGNN)."""
    import jax.numpy as jnp

    from ..ops import morton
    from ..ops.pallas.egcl_kernel import egnn_forward_pallas

    assert not model.use_pointnet, \
        "the morton fast path bypasses the PointNet encoder stage; use " \
        "knn_method='exact'/'approx'/'pallas' with use_pointnet"
    interp = jax.default_backend() != "tpu"
    egnn_vars = {"params": params["params"]["egnn"]}
    n = batch["src_pts"].shape[1]
    # clamp the curve window to the cloud: at window >= n the path degrades
    # gracefully to full-table gathers (small-N configs, e.g. serving at 256).
    # The Pallas kernels need 128-lane-aligned windows, so N must be a
    # multiple of 128 — fail here with a usable message, not deep in Mosaic.
    assert n % 128 == 0, (
        f"the morton fast path needs num_nodes divisible by 128 (got {n}); "
        f"use knn_method='exact'/'approx'/'pallas' for smaller clouds")
    window = min(cfg.egnn_window, n)
    tile = min(cfg.egnn_tile, n)
    assert n % tile == 0 and window % tile == 0, (
        f"morton path needs N divisible by the kernel tile: N={n}, "
        f"tile={tile}, window={window}")

    # bf16 one-hot MXU permutes for h (coordinates stay exact-gathered): only
    # meaningful where the kernel is already rounding h to bf16 — fast
    # compiled mode, same gate as the kernel's cast_bf16 (interpret/CPU keeps
    # full fp32 numerics). Measured +11% forward at B=64 (BASELINE.md).
    # Gated to N <= 2048 (the measured shape): the one-hot is a [B, N, N]
    # bf16 tensor, O(N^2) vs the gather's O(N*C) — at the dense-scaling
    # shapes (8K-32K) it would cost gigabytes per permute and invalidate
    # the near-linear O(N*W) scaling the window path is built on.
    onehot_h = _use_onehot_h_permute(cfg, interp, n)

    def embed(h, x):
        # one fused key-value sort replaces argsort + gathers (and the
        # un-sort below is a sort keyed by perm) — both have scatter-free
        # custom VJPs; the generic gather transpose is a serial TPU scatter
        hs, xs, perm = morton.sort_by_curve(h, x, cfg.curve)
        if onehot_h:
            # replaces sort_by_curve's h gather (XLA prunes the unused one)
            hs = morton.permute_rows_matmul(h, perm)
        if cfg.egnn_impl == "pallas" and not interp:
            # fused window-knn kernel (same neighbor sets/tie-breaks as the
            # XLA builder; tile must match the EGCL kernel's tile_t)
            # packed, NOT chunked: the two-level chunked extraction is for
            # the k=60 descriptor regime — at k=16/W=384 it measured 15%
            # SLOWER end-to-end (27.2 vs 23.6 ms at B=64, 3 alternated
            # reps: too few sweeps to amortize its transposed-tile setup)
            from ..ops.pallas.knn_kernel import knn_pallas
            nbr = knn_pallas(xs, cfg.k, tile_t=tile, window=window,
                             packed=cfg.knn_packed and window <= 1024)
        else:
            nbr = jax.vmap(lambda xx: morton.knn_graph_window(
                xx, cfg.k, tile=tile, window=window))(xs)
        if cfg.egnn_impl == "pallas":
            fwd = lambda hh, xx, nn: egnn_forward_pallas(
                egnn_vars, hh, xx, nn, tile_t=tile, interpret=interp,
                accurate=cfg.egnn_accurate, window=window)
            if cfg.remat:
                fwd = jax.checkpoint(fwd)
            h2, x2 = fwd(hs, xs, nbr)
        else:
            # XLA twin on the same window graph (e.g. the accurate-precision
            # train step, which has no Pallas backward — make_train_step
            # rewrites egnn_impl for that combination)
            from ..models.egnn import EGNN
            egnn_mod = EGNN(in_node_nf=model.in_node_nf,
                            hidden_nf=model.hidden_nf,
                            out_node_nf=model.hidden_nf,
                            edge_attr_dim=model.edge_attr_dim,
                            n_layers=model.n_layers, num_heads=model.num_heads,
                            direction="center", so3_mode=model.so3_mode)
            fwd = lambda hh, xx, nn: egnn_mod.apply(egnn_vars, hh, xx, nn)
            if cfg.remat:
                fwd = jax.checkpoint(fwd)
            h2, x2 = fwd(hs, xs, nbr)
        if onehot_h:
            # h un-sorts on the MXU; x keeps the exact gather (its fp32
            # bits are the Kabsch geometry)
            (x2,) = morton.unsort_rows((x2,), perm)
            return morton.permute_rows_matmul(h2, perm, invert=True), x2
        return morton.unsort_rows((h2, x2), perm)

    h_s, x_s = embed(batch["src_feat"], batch["src_pts"])
    h_t, x_t = embed(batch["tgt_feat"], batch["tgt_pts"])
    return model.apply(params, batch["src_feat"], batch["tgt_feat"],
                       batch["src_pts"], batch["tgt_pts"],
                       h_s, x_s, h_t, x_t, batch["labels"],
                       method="head_from_embeddings")


def _apply_with_graphs(model, cfg, params, batch):
    """k-NN graphs + model forward, all inside jit."""
    if cfg.knn_method == "morton":
        assert model.direction == "center" and model.so3_mode == "frame", \
            "morton fast path uses the fused kernel's canonical mode"
        return _apply_morton_fast(model, cfg, params, batch)
    if cfg.knn_method == "pallas":
        # exact fused kernel (identical neighbor SETS to lax.top_k; fp
        # near-tie ordering may differ — aggregation is order-invariant)
        from ..ops.pallas.knn_kernel import knn_pallas
        interp = jax.default_backend() != "tpu"
        nbr_src = knn_pallas(batch["src_pts"], cfg.k, interpret=interp)
        nbr_tgt = knn_pallas(batch["tgt_pts"], cfg.k, interpret=interp)
    else:
        build = lambda p: knn.knn_graph(p, cfg.k, method=cfg.knn_method,
                                        recall_target=cfg.knn_recall)
        nbr_src = jax.vmap(build)(batch["src_pts"])
        nbr_tgt = jax.vmap(build)(batch["tgt_pts"])
    apply = model.apply
    if cfg.remat:
        apply = jax.checkpoint(model.apply, static_argnums=())
    return apply(params, batch["src_feat"], batch["src_pts"], nbr_src,
                 batch["tgt_feat"], batch["tgt_pts"], nbr_tgt, batch["labels"])


def make_train_step(model: RegistrationModel, optimizer, cfg: EngineConfig):
    """Returns jitted (state, batch) -> (state, metrics dict).

    The fused Pallas layers train end-to-end via the hand-written backward
    kernel (ops/pallas/egcl_backward.py) in BOTH precision modes — the
    backward runs at the same precision (1-pass bf16 fast / 3-pass ~fp32
    accurate) as its forward.
    """

    def loss_fn(params, batch):
        out = _apply_with_graphs(model, cfg, params, batch)
        lb = losses_lib.total_loss(out, batch["gt_pose"], batch["labels"],
                                   cfg.loss_weights)
        return lb.total, lb

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        (_, lb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, {k: v for k, v in lb._asdict().items()}

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model: RegistrationModel, cfg: EngineConfig,
                   with_loss: bool = False):
    """Returns jitted (params, batch) -> per-pair metric arrays.

    Matches the eval driver's per-pair metric computation
    (/root/reference/src/eval_egnn_metrics.py:1243-1283): RRE/RTE vs gt_pose,
    registration recall/precision at tau=0.09 on the raw input clouds.
    `with_loss=True` additionally reports the (batch-mean) total training
    loss — fit()'s validation pass uses it so the best-val checkpoint can be
    selected by validation loss like the reference (:1435-1437).
    """

    def step(params, batch):
        out = _apply_with_graphs(model, cfg, params, batch)
        R, t, w = out.R, out.t, out.weights
        if cfg.spectral_topm > 0:
            from ..ops.kabsch import kabsch_weighted
            from ..ops.spectral import spectral_match_weights
            w = spectral_match_weights(batch["src_pts"], batch["tgt_pts"], w,
                                       top_m=cfg.spectral_topm,
                                       sigma=cfg.spectral_sigma,
                                       iters=cfg.spectral_iters)
            R, t = kabsch_weighted(batch["src_pts"], batch["tgt_pts"], w,
                                   solver=cfg.kabsch_solver)
        if cfg.refine_iters > 0:
            from ..ops.kabsch import kabsch_irls
            R, t, _ = kabsch_irls(batch["src_pts"], batch["tgt_pts"], w,
                                  iters=cfg.refine_iters,
                                  kernel=cfg.refine_kernel,
                                  solver=cfg.kabsch_solver)
        if cfg.icp_iters > 0:
            from ..ops.icp import icp_refine, icp_refine_multiscale
            if cfg.icp_voxels:
                R, t, _ = icp_refine_multiscale(
                    batch["src_pts"], batch["tgt_pts"], R, t,
                    voxel_sizes=cfg.icp_voxels, iters=cfg.icp_iters,
                    tau=cfg.icp_tau, mode=cfg.icp_mode, trim=cfg.icp_trim,
                    solver=cfg.kabsch_solver)
            else:
                R, t, _ = icp_refine(batch["src_pts"], batch["tgt_pts"], R, t,
                                     iters=cfg.icp_iters, tau=cfg.icp_tau,
                                     mode=cfg.icp_mode, trim=cfg.icp_trim,
                                     solver=cfg.kabsch_solver)
        b = R.shape[0]
        pred = jnp.tile(jnp.eye(4, dtype=R.dtype)[None], (b, 1, 1))
        pred = pred.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
        rot_err, trans_err = metrics_lib.calculate_pose_error(batch["gt_pose"], pred)
        recall, precision = metrics_lib.registration_recall(
            pred, batch["src_pts"], batch["tgt_pts"])
        m = {"rot_err_deg": rot_err, "trans_err_cm": trans_err,
             "recall": recall, "precision": precision}
        if with_loss:
            lb = losses_lib.total_loss(out, batch["gt_pose"], batch["labels"],
                                       cfg.loss_weights)
            m["loss"] = jnp.broadcast_to(lb.total, rot_err.shape)
        return m

    return jax.jit(step)


def init_state(model: RegistrationModel, optimizer, cfg: EngineConfig,
               rng_key, example_batch) -> TrainState:
    nbr = jnp.zeros(example_batch["src_pts"].shape[:2] + (cfg.k,), jnp.int32)
    params = jax.jit(model.init)(
        rng_key, example_batch["src_feat"], example_batch["src_pts"], nbr,
        example_batch["tgt_feat"], example_batch["tgt_pts"], nbr,
        example_batch["labels"])
    # init the optimizer BEFORE any bf16 cast so the SR master keeps the
    # full fp32 initialization precision
    opt_state = optimizer.init(params)
    if cfg.bf16_params:
        # live params in bf16; the SR optimizer keeps the fp32 master
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


def batch_to_device(batch_tuple) -> dict:
    """Reference 7-tuple (corr, labels, src_pts, tgt_pts, src_feat, tgt_feat,
    gt_pose) → the dict the engine consumes."""
    corr, labels, src_pts, tgt_pts, src_feat, tgt_feat, gt_pose = batch_tuple
    return {
        "labels": jnp.asarray(labels), "src_pts": jnp.asarray(src_pts),
        "tgt_pts": jnp.asarray(tgt_pts), "src_feat": jnp.asarray(src_feat),
        "tgt_feat": jnp.asarray(tgt_feat), "gt_pose": jnp.asarray(gt_pose),
    }


def fit(model, optimizer, cfg: EngineConfig, state: TrainState,
        train_batches: Callable[[], Iterable], epochs: int,
        val_batches: Optional[Callable[[], Iterable]] = None,
        checkpointer=None, checkpoint_every: int = 20,
        logger: Optional[Callable[[int, dict], None]] = None,
        mesh=None, profile_dir: Optional[str] = None,
        train_step=None) -> TrainState:
    """Epoch loop with correct loss averaging (the reference's running-total
    accumulation is buggy — SURVEY.md §7 'defects not to replicate'), periodic
    + best-val checkpointing (:1435-1441 semantics).

    Metrics accumulate ON DEVICE and are fetched once per epoch — a per-step
    `float(v)` would serialize dispatch and cap throughput at the host
    round-trip rate. `profile_dir` wraps the FIRST epoch in
    `jax.profiler.trace` (viewable in TensorBoard / xprof).
    """
    import contextlib

    from ..parallel.distributed import host_local_to_global
    from ..parallel.mesh import shard_pair_batch

    if mesh is not None and "point" in getattr(mesh, "axis_names", ()):
        # 2-axis (data x point) mesh: batches shard on both axes and the
        # caller supplies the point-sharded step. Multi-process composes too:
        # each process feeds its LOCAL data-axis slice and shard_points_batch
        # assembles the global array (make_array_from_process_local_data),
        # with the point axis staying on each process's own devices.
        from ..parallel.point_sharding import shard_points_batch
        shard_pair_batch = shard_points_batch
        assert train_step is not None, \
            "pass train_step=make_point_sharded_train_step(...) with a " \
            "point-axis mesh"
    elif mesh is not None and jax.process_count() > 1:
        # multi-host: every process feeds its LOCAL slice of the global batch
        shard_pair_batch = host_local_to_global

    if train_step is None:
        train_step = make_train_step(model, optimizer, cfg)
    # lower-is-better metrics only — min-selection below; an unknown value
    # would otherwise silently disable best-val checkpointing forever
    if cfg.best_val_metric not in ("loss", "rot_err_deg", "trans_err_cm"):
        raise ValueError(
            f"unknown best_val_metric {cfg.best_val_metric!r}; expected "
            "'loss' (reference parity), 'rot_err_deg' or 'trans_err_cm'")
    eval_model = build_model(cfg, head_mode="train")
    eval_step = make_eval_step(eval_model, cfg,
                               with_loss=cfg.best_val_metric == "loss")
    # per-batch metrics reduce to scalars ON DEVICE: under a multi-process
    # mesh the per-pair arrays span non-addressable devices (data axis across
    # hosts) and np.asarray would throw; the jitted mean all-reduces to a
    # replicated scalar every process can read (equal-sized batches —
    # PairLoader drop_last — make mean-of-batch-means == mean-over-pairs).
    # Defined ONCE so jit caches across epochs.
    mean_metrics = jax.jit(lambda m: {k: jnp.mean(v) for k, v in m.items()})

    best_val = np.inf
    for epoch in range(epochs):
        trace_ctx = (jax.profiler.trace(profile_dir)
                     if profile_dir and epoch == 0 else contextlib.nullcontext())
        t0 = time.time()
        ms = []  # per-step metric pytrees stay ON DEVICE; reduced once below
        with trace_ctx:
            for batch in train_batches():
                batch = batch_to_device(batch) if isinstance(batch, tuple) else batch
                if mesh is not None:
                    batch = shard_pair_batch(batch, mesh)
                state, m = train_step(state, batch)
                ms.append(m)
        # one stack+mean+fetch per metric per EPOCH (not per step)
        train_metrics = {k: float(jnp.mean(jnp.stack([m[k] for m in ms])))
                         for k in (ms[0] if ms else {})}
        train_metrics["epoch_seconds"] = time.time() - t0

        if val_batches is not None:
            vals = []
            for batch in val_batches():
                batch = batch_to_device(batch) if isinstance(batch, tuple) else batch
                if mesh is not None:
                    batch = shard_pair_batch(batch, mesh)
                vals.append({k: np.asarray(v) for k, v in mean_metrics(
                    eval_step(state.params, batch)).items()})
            val_metrics = {k: float(np.mean([v[k] for v in vals]))
                           for k in vals[0]} if vals else {}
            train_metrics.update({f"val_{k}": v for k, v in val_metrics.items()})
            # Best-val criterion: total validation loss by default, like the
            # reference driver (:1435-1437); rotation error as an opt-in.
            val_score = val_metrics.get(cfg.best_val_metric, np.inf)
            if checkpointer is not None and val_score < best_val:
                best_val = val_score
                checkpointer.save(int(state.step), state,
                                  metrics={f"val_{cfg.best_val_metric}": val_score})

        if checkpointer is not None and (epoch + 1) % checkpoint_every == 0:
            checkpointer.save(int(state.step), state)
        if logger is not None:
            logger(epoch, train_metrics)
    return state


def evaluate(model, cfg: EngineConfig, params, batches: Iterable,
             save_path: Optional[str] = None) -> dict:
    """Test-set evaluation producing the reference's report format
    (eval_egnn_metrics.py:1283-1298 → evaluation_results.txt)."""
    eval_step = make_eval_step(model, cfg)
    rows = {"rot_err_deg": [], "trans_err_cm": [], "recall": [], "precision": []}
    for batch in batches:
        batch = batch_to_device(batch) if isinstance(batch, tuple) else batch
        m = eval_step(params, batch)
        for k in rows:
            rows[k].extend(np.atleast_1d(np.asarray(m[k])).tolist())
    summary = metrics_lib.summarize(
        np.asarray(rows["rot_err_deg"]), np.asarray(rows["trans_err_cm"]),
        np.asarray(rows["recall"]), np.asarray(rows["precision"]))
    if save_path:
        with open(save_path, "w") as f:
            f.write(f"Average Rotation Error: {summary['avg_rotation_error_deg']:.4f} degrees\n")
            f.write(f"Average Translation Error: {summary['avg_translation_error_cm']:.4f} cm\n")
            f.write(f"Average Registration Recall: {summary['avg_registration_recall']:.4f}\n")
            f.write(f"Average F1 Score: {summary['avg_f1']:.4f}\n")
    return summary
