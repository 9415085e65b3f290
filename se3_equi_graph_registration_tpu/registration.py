"""Checkpoint-free classic global registration, end to end on TPU.

The reference framework always registers through the learned model; its users
fall back to open3d (FPFH + RANSAC, then ICP) when no checkpoint fits the
domain. This module composes that entire classic pipeline from the
framework's own TPU-native pieces — no open3d, no torch, one jitted program:

    FPFH-33 descriptors (ops/fpfh, MXU one-hot histograms)
      -> mutual-nearest feature matching (one [N, M] MXU matmul each way)
      -> coarse pose hypotheses: batched fixed-shape RANSAC (ops/ransac)
         or spectral-matching consistency weights (ops/spectral)
      -> weighted Kabsch + IRLS polish (ops/kabsch)
      -> trimmed point-to-plane ICP fine registration (ops/icp)

Every stage is fixed-shape (pad/sample to `n_points` on the host, exactly
like serving.Registrar), so the whole pipeline compiles once and reruns at
device speed. Complements the learned path: use this when there is no
usable checkpoint, or as a geometric cross-check on the network's pose.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from .ops import fpfh as fpfh_lib
from .ops.icp import icp_refine
from .ops.kabsch import kabsch_irls, kabsch_weighted, pose_covariance
from .ops.fgr import fgr_pose
from .ops.ransac import ransac_pose
from .ops.spectral import spectral_match_weights

Array = jax.Array

__all__ = ["register_fpfh", "register_fpfh_batch", "match_features",
           "export_compiled", "load_exported"]


def match_features(src_feat: Array, tgt_feat: Array
                   ) -> tuple[Array, Array, Array]:
    """Mutual-nearest-neighbor feature matching.

    Returns (j_of_i [N] int32 — each source row's nearest target row in
    descriptor space, mutual [N] bool — true where the match is reciprocal,
    dist [N] — its feature distance). Both NN sweeps are one MXU matmul
    (the |a−b|² expansion); no data-dependent shapes — non-mutual rows are
    reported, not dropped, so downstream stages gate by weight.
    """
    from .ops.knn import pairwise_sq_dists
    a = src_feat.astype(jnp.float32)
    d2 = pairwise_sq_dists(a, tgt_feat.astype(jnp.float32))  # [N, M]
    j_of_i = jnp.argmin(d2, axis=1).astype(jnp.int32)        # [N]
    i_of_j = jnp.argmin(d2, axis=0).astype(jnp.int32)        # [M]
    mutual = i_of_j[j_of_i] == jnp.arange(a.shape[0], dtype=jnp.int32)
    dist = jnp.sqrt(jnp.take_along_axis(d2, j_of_i[:, None], axis=1)[:, 0])
    return j_of_i, mutual, dist


def _branch_verify_ms(R: Array, t: Array, src: Array, tgt: Array,
                      n_keep: int) -> Array:
    """Trimmed NN mean-square of src under each branch pose vs tgt.

    R [Br, 3, 3], t [Br, 3], src [N, 3], tgt [M, 3] → [Br]: per branch, the
    mean of the n_keep smallest squared NN distances of the posed source.
    The measured wrong-cluster discriminator (registration branch selection:
    wrong-basin ICP optima score 1.5-9x higher; correct branches agree
    within ~1%). Both contractions MUST run at Precision.HIGHEST: the
    ‖p‖² − 2p·y + ‖y‖² cancellation leaves a ~1e-3 signal and a
    DEFAULT-precision TPU matmul (bf16-rounded operands) injects ~4e-3 of
    noise — measured to flip the branch pick on MOST 40%-overlap seeds
    while every CPU test stays green (the banded-FPFH bug class; jaxpr
    pinned by tests/test_global_registration.py::
    test_branch_verify_requests_fp32). Selection-type consumers (k-NN, NN
    association) tolerate default precision — all candidates are equally
    noisy — but here the absolute values ARE the answer.
    """
    hi = jax.lax.Precision.HIGHEST
    posed = jnp.einsum("bij,nj->bni", R, src, precision=hi) + t[:, None, :]
    t2 = jnp.sum(tgt * tgt, axis=-1)                             # [M]
    d2 = (jnp.sum(posed * posed, -1)[..., None]
          - 2.0 * jnp.einsum("bni,mi->bnm", posed, tgt, precision=hi)
          + t2[None, None, :])                                   # [Br,N,M]
    dmin = jnp.min(d2, axis=-1)                                  # [Br, N]
    return jnp.mean(-jax.lax.top_k(-dmin, n_keep)[0], axis=-1)   # [Br]


def _register_core(src: Array, tgt: Array, key: Array, k_normals: int,
                   k_fpfh: int, top_m: int, sigma: float,
                   spectral_iters: int, refine_iters: int, icp_iters: int,
                   icp_mode: str, icp_tau: float, icp_trim: float,
                   icp_voxels: tuple, coarse: str, hypotheses: int,
                   knn_method: str = "approx", solver: str = "quaternion",
                   window: int = 768, knn_packed: bool = False,
                   ransac_vote: str = "count", ransac_branches: int = 4):
    # ONE k-selection per cloud feeds both the normal estimator (first
    # k_normals columns — top_k/approx_min_k return ascending distances) and
    # the descriptor: the k-NN is the pipeline's dominant cost (measured
    # attribution in BASELINE.md — exact top_k lowers to a full per-row
    # sort). knn_method='approx' uses the TPU-native approx_min_k bucketed
    # selection; 'window' curve-sorts each cloud and restricts candidates to
    # a Hilbert window (morton.knn_graph_window) — [N, W] distance work
    # instead of [N, N], and the window invariant lets the SPFH accumulation
    # ride the MXU as a banded matmul (fpfh window_tile=). Every later stage
    # is point-order invariant, so the pipeline simply RUNS in sorted space;
    # only the returned per-point weights are unsorted at the end.
    from .ops.knn import knn_graph
    kk = min(max(k_normals, k_fpfh), src.shape[0])
    window_tile = None
    perm_src = None
    if knn_method in ("window", "fused"):
        from .ops.morton import knn_graph_window, sort_by_curve
        n = src.shape[0]
        tile = 128
        win = min(window, n)
        if n % tile or win % tile:
            raise ValueError(
                f"knn_method={knn_method!r} needs n_points ({n}) and window "
                f"({win}) to be multiples of {tile}; use knn_method="
                "'approx' for odd sizes")
        empty = jnp.zeros((n, 0), src.dtype)
        _, src, perm_src = sort_by_curve(empty, src)
        _, tgt, _ = sort_by_curve(empty, tgt)
        if knn_method == "fused":
            # exact-within-window sweeps fused in Pallas (matches
            # knn_graph_window bit-for-bit at the same tile/window);
            # knn_packed: False | True | 'chunked' (two-level extraction —
            # the measured fast default, see knn_pallas)
            from .ops.pallas.knn_kernel import knn_pallas
            interp = jax.default_backend() != "tpu"
            pk = dict(packed=bool(knn_packed),
                      chunked=knn_packed == "chunked")
            nbr_src = knn_pallas(src, kk, tile_t=tile, window=win,
                                 interpret=interp, **pk)
            nbr_tgt = knn_pallas(tgt, kk, tile_t=tile, window=win,
                                 interpret=interp, **pk)
        else:
            nbr_src = knn_graph_window(src, kk, tile=tile, window=win)
            nbr_tgt = knn_graph_window(tgt, kk, tile=tile, window=win)
        window_tile = (tile, win)
    else:
        nbr_src = knn_graph(src, kk, method=knn_method)
        nbr_tgt = knn_graph(tgt, kk, method=knn_method)
    # 'local' orientation is pose-EQUIVARIANT (away from the neighborhood
    # centroid) — viewpoint orientation would give the two frames different
    # normal signs and scramble the sign-sensitive Darboux angles
    if knn_method == "fused":
        # whole descriptor stage on the window structure: banded-MXU moment
        # normals + the fused Pallas SPFH kernel (no [N, K, .] row gathers)
        from .ops.pallas.spfh_kernel import spfh_pallas
        n_src = fpfh_lib.estimate_normals_window(
            src, nbr_src[:, :k_normals], tile, win)
        n_tgt = fpfh_lib.estimate_normals_window(
            tgt, nbr_tgt[:, :k_normals], tile, win)
        s_src, d_src = spfh_pallas(src, n_src, nbr_src[:, :k_fpfh], win,
                                   tile_t=tile, interpret=interp)
        s_tgt, d_tgt = spfh_pallas(tgt, n_tgt, nbr_tgt[:, :k_fpfh], win,
                                   tile_t=tile, interpret=interp)
        f_src = fpfh_lib.fpfh_from_spfh(s_src, nbr_src[:, :k_fpfh], d_src,
                                        tile, win)
        f_tgt = fpfh_lib.fpfh_from_spfh(s_tgt, nbr_tgt[:, :k_fpfh], d_tgt,
                                        tile, win)
    else:
        n_src = fpfh_lib.estimate_normals(src, orient="local",
                                          nbr=nbr_src[:, :k_normals])
        n_tgt = fpfh_lib.estimate_normals(tgt, orient="local",
                                          nbr=nbr_tgt[:, :k_normals])
        f_src = fpfh_lib.fpfh(src, n_src, nbr=nbr_src[:, :k_fpfh],
                              window_tile=window_tile)
        f_tgt = fpfh_lib.fpfh(tgt, n_tgt, nbr=nbr_tgt[:, :k_fpfh],
                              window_tile=window_tile)

    j_of_i, mutual, dist = match_features(f_src, f_tgt)
    tgt_corr = tgt[j_of_i]
    # confidence: reciprocal matches first, closer descriptors first —
    # only the top-M ORDER matters to the spectral stage
    scores = mutual.astype(jnp.float32) / (1.0 + dist)

    # the coarse stage produces a BRANCH STACK [Br, ...] of pose candidates
    # (Br = 1 for spectral/fgr/plain ransac); IRLS + ICP refine every branch
    # in one batched program, and for Br > 1 the winner is picked AFTER
    # refinement by trimmed NN surface residual — the verified-branch design
    # (see ransac_pose_branches for why verification must happen at each
    # branch's own local optimum, not before)
    if coarse == "ransac":
        # multi-hypothesis vote: survives candidate orderings that mislead
        # the single-shot spectral eigenvector at low overlap
        if ransac_branches > 1:
            from .ops.ransac import ransac_pose_branches
            R, t, w = ransac_pose_branches(
                src, tgt_corr, scores, key, branches=ransac_branches,
                top_m=top_m, hypotheses=hypotheses, inlier_tau=sigma,
                solver=solver, vote=ransac_vote)
        else:
            R, t, w = ransac_pose(src, tgt_corr, scores, key, top_m=top_m,
                                  hypotheses=hypotheses, inlier_tau=sigma,
                                  solver=solver, vote=ransac_vote)
            R, t, w = R[None], t[None], w[None]
    elif coarse == "fgr":
        # graduated non-convexity on Geman-McClure (ops/fgr) — the
        # open3d-FGR capability; `hypotheses` sizes the tuple-test draw
        R, t, w = fgr_pose(src, tgt_corr, scores, key, top_m=top_m,
                           tuples=hypotheses, delta=sigma, solver=solver)
        R, t, w = R[None], t[None], w[None]
    elif coarse == "spectral":
        w = spectral_match_weights(src, tgt_corr, scores, top_m=top_m,
                                   sigma=sigma, iters=spectral_iters)
        R, t = kabsch_weighted(src, tgt_corr, w, solver=solver)
        R, t, w = R[None], t[None], w[None]
    else:
        raise ValueError(f"unknown coarse stage {coarse!r}; "
                         "expected 'spectral', 'ransac', or 'fgr'")
    br = R.shape[0]
    src_b = jnp.broadcast_to(src[None], (br,) + src.shape)
    tgt_b = jnp.broadcast_to(tgt[None], (br,) + tgt.shape)
    if refine_iters > 0:
        R, t, w = kabsch_irls(src_b, jnp.broadcast_to(tgt_corr[None],
                                                      (br,) + tgt_corr.shape),
                              w, iters=refine_iters, solver=solver)
    if icp_iters > 0:
        # the raw-cloud fields are already computed above — reuse them in
        # both branches (multiscale applies them only to its 0.0 scale and
        # recomputes at coarser ones; coarse/fine neighborhoods both use
        # k_normals, so the estimators agree between the two branches)
        def _b(a):
            return jnp.broadcast_to(a[None], (br,) + a.shape)
        icp_kw = dict(iters=icp_iters, mode=icp_mode, tau=icp_tau,
                      trim=icp_trim, normals_k=k_normals, solver=solver)
        if icp_mode in ("plane", "symmetric"):
            icp_kw["tgt_normals"] = _b(n_tgt)
        if icp_mode == "symmetric":
            icp_kw["src_normals"] = _b(n_src)
        if icp_mode == "gicp":
            from .ops.icp import point_covariances
            icp_kw["src_cov"] = _b(point_covariances(src, normals=n_src))
            icp_kw["tgt_cov"] = _b(point_covariances(tgt, normals=n_tgt))
        if icp_voxels:
            if icp_voxels[-1]:
                raise ValueError("icp_voxels must end at 0.0 (raw clouds): "
                                 "the final weights pair with the raw source "
                                 f"points for the covariance; got {icp_voxels}")
            from .ops.icp import icp_refine_multiscale
            R, t, w = icp_refine_multiscale(
                src_b, tgt_b, R, t, voxel_sizes=icp_voxels, **icp_kw)
        else:
            R, t, w = icp_refine(src_b, tgt_b, R, t, **icp_kw)
        # w: the FINAL (NN-associated) set
    if br > 1:
        # verified selection: trimmed NN surface residual of every REFINED
        # branch (see _branch_verify_ms — fp32-pinned by test)
        vtrim = icp_trim if isinstance(icp_trim, float) and icp_trim > 0 \
            else 0.35
        n_keep = max(int(vtrim * src.shape[0]), 1)
        ms = _branch_verify_ms(R, t, src, tgt, n_keep)               # [Br]
        # a branch whose refinement degenerated must never win the argmin
        # (NaN compares as the minimum there)
        ms = jnp.where(jnp.isfinite(ms), ms, jnp.inf)
        ib = jnp.argmin(ms)
        R, t, w = R[ib], t[ib], w[ib]
    else:
        R, t, w = R[0], t[0], w[0]
    if icp_iters > 0:
        posed = src @ R.T + t
        from .ops.icp import nearest_neighbor
        nn, _ = nearest_neighbor(posed, tgt)
        cov = pose_covariance(src, tgt[nn], R, t, w)
    else:
        cov = pose_covariance(src, tgt_corr, R, t, w)
    if perm_src is not None:
        # pose/covariance are point-order invariant; only the per-point
        # weights must leave sorted space (w_orig[perm[r]] = w_sorted[r])
        w = w[jnp.argsort(perm_src)]
    return R, t, w, cov


_STATIC = ("k_normals", "k_fpfh", "top_m", "spectral_iters", "refine_iters",
           "icp_iters", "icp_mode", "icp_tau", "icp_trim", "icp_voxels",
           "coarse", "hypotheses", "knn_method", "solver", "window",
           "knn_packed", "ransac_vote", "ransac_branches")
_CORE = jax.jit(_register_core, static_argnames=_STATIC)


def _core_batch(src, tgt, keys, **kw):
    return jax.vmap(lambda s, g, k: _register_core(s, g, k, **kw))(
        src, tgt, keys)


# module-level jit: repeated register_fpfh_batch calls at the same shapes
# and knobs hit the compile cache instead of re-tracing (jit caches key on
# the function OBJECT — a fresh lambda per call would recompile every time)
_CORE_BATCH = jax.jit(_core_batch, static_argnames=_STATIC)


def register_fpfh(src_pts, tgt_pts, *, n_points: int = 2048,
                  voxel: float = 0.0, k_normals: int = 30, k_fpfh: int = 60,
                  top_m: int = 512, sigma: float = 0.09,
                  spectral_iters: int = 12, refine_iters: int = 5,
                  icp_iters: int = 10, icp_mode: str = "plane",
                  icp_tau: float = 0.0, icp_trim: float | str = 0.0,
                  icp_voxels: tuple = (), coarse: str = "ransac",
                  hypotheses: int = 512, knn_method: str = "approx",
                  solver: str = "quaternion", window: int = 768,
                  knn_packed: bool | str = False, ransac_vote: str = "count",
                  ransac_branches: int = 4, seed: int = 0):
    """Register two raw point clouds with no learned model.

    src_pts/tgt_pts: [N, 3] arrays (any N — host-side voxel downsample when
    `voxel > 0`, then sample/pad to the compiled `n_points` like
    serving.Registrar). Returns (R [3, 3], t [3], info) with info carrying
    'weights' (final per-source-point weights over the sampled cloud),
    'pose_covariance' [6, 6], and 'indices' (the sampled source row ids).
    All tuning knobs mirror the Registrar's robust stack; `icp_mode='plane'`
    is the default because the two clouds sample the surface independently.

    `coarse` picks the hypothesis stage: 'ransac' (default — fixed-shape
    multi-hypothesis voting, ops/ransac.py; 20-seed scenario suite: 16-20/20
    at 40% overlap where spectral scores 6/20 and fgr 5/20, equal at high
    overlap) or 'spectral' (ops/spectral.py — deterministic, no RNG; the
    right pick when putative matches are dense and mostly right, e.g. the
    learned head's correspondences) or 'fgr' (ops/fgr.py — graduated
    non-convexity with a tuple test, the open3d
    registration_fgr_based_on_feature_matching capability; `hypotheses`
    sizes its tuple draw and `sigma` is its Geman-McClure scale floor; GNC
    reweights ALL correspondences smoothly, so at low inlier rates the
    surrogate anneals onto the outlier majority — the multi-hypothesis vote
    only needs one all-inlier triplet).
    For low-overlap pairs also set
    `icp_trim` — either the overlap fraction if known, or 'auto'
    (Chetverikov TrICP objective — estimates the overlap itself each
    iteration; measured within ~1 deg of the known-fraction setting on the
    20-seed 40%-overlap suite).

    `ransac_branches` (default 4) is VERIFIED multi-branch selection, the
    robustness-by-default answer to the low-overlap failure mode where a
    consistent cluster of wrong matches — descriptor look-alike patches
    related by a rigid motion — outvotes the true cluster. The top-B vote
    winners that are mutually distinct as poses (inlier-set-overlap NMS,
    ops/ransac.ransac_pose_branches) are ALL refined through IRLS + trimmed
    ICP in one batched program, and the branch with the smallest trimmed NN
    surface residual wins (_branch_verify_ms; verification must happen at
    each branch's own local optimum — scoring unrefined poses inverts the
    decision, measured). 20-seed 40%-overlap suite (BASELINE.md): 19/20
    under exact CPU knobs and 16-17/20 under every TPU knob set, vs
    15-16/20 (CPU) / 12-13/20 (fused TPU) at branches=1 — the chaotic
    flips near the vote tie shrink because the answer no longer rides a
    single argmax. Cost: the branch stack multiplies only the IRLS/ICP
    tail (~-23% throughput at the fused default). Set ransac_branches=1
    for the pure-speed mode. `ransac_vote` ('count' | 'msac') picks the
    hypothesis gain; 'msac' weighs cluster tightness (truncated
    quadratic) — measured within noise of 'count' on the 20-seed suite.

    `knn_method`/`solver` are the measured fast defaults (BASELINE.md
    global-reg attribution): 'approx' = TPU-native approx_min_k for the
    descriptor neighborhoods (~95% neighbor recall — FPFH histograms are
    insensitive to near-tied far neighbors; 2x faster than the exact top_k,
    which lowers to a full per-row sort), and 'quaternion' = Horn's
    largest-eigenvector solve by shifted power iteration for every Kabsch
    in the robust stack (batched jnp.linalg.svd of 3x3s lowers terribly on
    TPU: the 512-hypothesis RANSAC stage alone dropped 3.3 -> 0.7 ms).
    Set knn_method='exact', solver='svd' to reproduce earlier published
    numbers bit-for-bit. One shared k-selection feeds both normals and
    FPFH either way.

    knn_method='window' (with `window`, default 768; both it and n_points
    must be multiples of 128) curve-sorts each cloud and takes candidates
    from a Hilbert window (ops/morton.knn_graph_window) — [N, W] distance
    work instead of [N, N] and NO [N, N] buffer at all — and the window
    invariant lets the SPFH neighbor accumulation ride the MXU as a banded
    adjacency matmul (ops/fpfh._accumulate_window). Neighbor recall at
    k=60 is ~0.89/0.93/0.96 at W=512/768/1024 on the scenario surfaces
    (vs ~0.95 for 'approx').

    knn_method='fused' keeps the same window structure but runs the WHOLE
    descriptor stage in Pallas kernels: exact-within-window k-NN sweeps
    (ops/pallas/knn_kernel.knn_pallas), banded-MXU moment normals
    (fpfh.estimate_normals_window), and the fused SPFH Darboux/histogram
    kernel (ops/pallas/spfh_kernel) — no [N, K, .] row gathers anywhere
    (the measured bound of the 'approx' descriptor stage, BASELINE.md
    attribution). `knn_packed=True` additionally packs (distance, lane)
    into one int32 extraction key inside the k-NN kernel so each of the
    k=60 sweeps is a single min-reduction (window <= 1024; near-ties
    within ~2^-13 relative d² may swap — FPFH histograms don't care);
    `knn_packed='chunked'` upgrades that to two-level interleaved-chunk
    extraction (see knn_pallas — identical neighbor sets at the k=60/W=768
    operating point, measured on chip). Measured same-process carry-chained
    on the real chip at N=2048 (BASELINE.md round-5 tables): fused+chunked
    W=768 is ~240 pairs/s at ransac_branches=1 and ~190 at the robust
    default, vs 'approx' at ~165. Quality on the 20-seed scenario suite
    (BASELINE.md TPU columns): fused matches approx/exact within noise at
    full and 40% overlap but trails at 60% (16/20 vs 20/20 at W=768;
    18/20 at window=1024) — the window's ~0.93 neighbor recall is the one
    measured cost of this speed mode; the default 'approx' does not have
    it. The k-NN stage itself sits at its measured structural floor
    (BASELINE.md ceiling analysis — extraction arithmetic is not the
    bound). The banded
    contractions REQUIRE Precision.HIGHEST: at the TPU default (bf16
    operands) the moment cancellation inside the normals collapsed to
    garbage, measured as 1/3 at 60% overlap — pinned by
    tests/test_fpfh.py::test_window_banded_matmuls_request_fp32.
    """
    rng = np.random.default_rng(seed)
    src = np.asarray(src_pts, np.float32)
    tgt = np.asarray(tgt_pts, np.float32)
    if voxel > 0:
        src = fpfh_lib.voxel_downsample(src, voxel)
        tgt = fpfh_lib.voxel_downsample(tgt, voxel)

    from .data.sampling import fit_to_count
    src_f, src_idx = fit_to_count(src, n_points, rng)
    tgt_f, _ = fit_to_count(tgt, n_points, rng)
    R, t, w, cov = _CORE(jnp.asarray(src_f), jnp.asarray(tgt_f),
                         jax.random.PRNGKey(seed),
                         k_normals=k_normals, k_fpfh=k_fpfh,
                         top_m=min(top_m, n_points), sigma=sigma,
                         spectral_iters=spectral_iters,
                         refine_iters=refine_iters, icp_iters=icp_iters,
                         icp_mode=icp_mode, icp_tau=icp_tau,
                         icp_trim=icp_trim, icp_voxels=tuple(icp_voxels),
                         coarse=coarse, hypotheses=hypotheses,
                         knn_method=knn_method, solver=solver, window=window,
                         knn_packed=knn_packed, ransac_vote=ransac_vote,
                         ransac_branches=ransac_branches)
    info = {"weights": np.asarray(w), "pose_covariance": np.asarray(cov),
            "indices": src_idx}
    return np.asarray(R), np.asarray(t), info


def export_compiled(path: str, *, batch: int = 1, n_points: int = 2048,
                    platforms: tuple | None = None, **knobs) -> int:
    """AOT-export the checkpoint-free registration pipeline as a portable
    serialized program (`jax.export` / StableHLO) and write it to `path`;
    returns the artifact size in bytes.

    The artifact captures the ENTIRE classic pipeline — descriptor k-NN +
    normals + FPFH + mutual matching + coarse hypotheses + IRLS + ICP +
    covariance — as one compiler-ready fixed-shape program. There are no
    weights: the program is self-contained, so the deployment site needs
    only jax (no framework code, no checkpoints — the same deployment story
    `serving.Registrar.export_compiled` gives the learned path). All
    register_fpfh_batch knobs are baked in as compile-time constants.

    Reload with :func:`load_exported`; the loaded callable takes
    ``(src [batch, n_points, 3] f32, tgt [batch, n_points, 3] f32,
    keys [batch, 2] uint32)`` — raw-key PRNG rows as produced by
    ``jax.random.split(jax.random.PRNGKey(seed), batch)`` — and returns
    ``(R [batch, 3, 3], t [batch, 3], weights [batch, n_points],
    pose_covariance [batch, 6, 6])``. `platforms` pins the target list
    (e.g. ``("tpu",)``); default = the platform exporting.
    """
    from jax import export as jexport

    kw = dict(k_normals=30, k_fpfh=60, top_m=512, sigma=0.09,
              spectral_iters=12, refine_iters=5, icp_iters=10,
              icp_mode="plane", icp_tau=0.0, icp_trim=0.0, icp_voxels=(),
              coarse="ransac", hypotheses=512, knn_method="approx",
              solver="quaternion", window=768, knn_packed=False,
              ransac_vote="count", ransac_branches=4)
    unknown = set(knobs) - set(kw)
    if unknown:
        raise TypeError(f"unknown export_compiled knobs: {sorted(unknown)}")
    kw.update(knobs)
    kw["icp_voxels"] = tuple(kw["icp_voxels"])
    kw["top_m"] = min(kw["top_m"], n_points)

    fn = jax.jit(lambda src, tgt, keys: _core_batch(src, tgt, keys, **kw))
    specs = (jax.ShapeDtypeStruct((batch, n_points, 3), jnp.float32),
             jax.ShapeDtypeStruct((batch, n_points, 3), jnp.float32),
             jax.ShapeDtypeStruct((batch, 2), jnp.uint32))
    ekw = {} if platforms is None else {"platforms": list(platforms)}
    try:
        exp = jexport.export(fn, **ekw)(*specs)
    except ValueError as e:
        if "custom_call" not in str(e):
            raise
        # knn_method='fused' lowers Pallas kernels to a TPU custom call,
        # which export's safety checks flag as non-portable by default; it
        # IS replayable on TPU runtimes of the same libtpu generation
        ekw["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
        exp = jexport.export(fn, **ekw)(*specs)
    data = exp.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str):
    """Load an :func:`export_compiled` artifact; returns
    ``fn(src, tgt, keys) -> (R, t, weights, pose_covariance)``. Only jax is
    required at the deployment site (no framework code)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return jax.jit(exp.call)


def register_fpfh_batch(src_pts, tgt_pts, *, seed: int = 0, mesh=None,
                        **knobs):
    """Batched register_fpfh: src/tgt [B, N, 3] (already fixed-size — pad or
    sample upstream, e.g. with serving.Registrar._fit_n semantics), one
    vmapped jitted program over the pair axis. Same knobs as register_fpfh
    minus the host-side n_points/voxel fitting. Returns (R [B, 3, 3],
    t [B, 3], info with batched 'weights' and 'pose_covariance').

    `mesh`: optional `jax.sharding.Mesh` with a 'data' axis — the pair axis
    shards over it for multi-chip batch registration (each pair is
    independent, so XLA partitions the whole program with zero collectives;
    B must be a multiple of the axis size). Same contract as
    `serving.Registrar(mesh=)` for the learned path.
    """
    kw = dict(k_normals=30, k_fpfh=60, top_m=512, sigma=0.09,
              spectral_iters=12, refine_iters=5, icp_iters=10,
              icp_mode="plane", icp_tau=0.0, icp_trim=0.0, icp_voxels=(),
              coarse="ransac", hypotheses=512, knn_method="approx",
              solver="quaternion", window=768, knn_packed=False,
              ransac_vote="count", ransac_branches=4)
    unknown = set(knobs) - set(kw)
    if unknown:
        raise TypeError(f"unknown register_fpfh_batch knobs: {sorted(unknown)}")
    kw.update(knobs)
    kw["icp_voxels"] = tuple(kw["icp_voxels"])   # hashable for the static jit
    src = jnp.asarray(src_pts, jnp.float32)
    tgt = jnp.asarray(tgt_pts, jnp.float32)
    kw["top_m"] = min(kw["top_m"], src.shape[1])
    keys = jax.random.split(jax.random.PRNGKey(seed), src.shape[0])
    if mesh is not None:
        from .parallel.mesh import data_sharding
        sh = data_sharding(mesh)
        src, tgt, keys = (jax.device_put(a, sh) for a in (src, tgt, keys))
    R, t, w, cov = _CORE_BATCH(src, tgt, keys, **kw)
    return (np.asarray(R), np.asarray(t),
            {"weights": np.asarray(w), "pose_covariance": np.asarray(cov)})
