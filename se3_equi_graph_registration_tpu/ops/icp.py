"""Batched, jittable ICP refinement (point-to-point and point-to-plane) for TPU.

The classic fine-registration stage a user of the reference gets from
open3d's `registration_icp` AFTER running the network (the reference itself
ships no refinement — its eval head is a single weighted solve,
/root/reference/src/eval_egnn_metrics.py:594-827). This is the TPU-native
formulation:

- correspondences are recomputed every iteration as 1-NN of the posed source
  against the raw target cloud — a [N, 3] x [3, M] MXU matmul + row argmin,
  NOT a data-dependent neighbor structure, so shapes stay static;
- the loop is a fixed-length `lax.scan`; outlier rejection is a robust
  weight (hard `tau` gate or MAD-scaled kernel from ops/kabsch), never a
  data-dependent slice;
- each point-mode solve is the absolute weighted Kabsch from the ORIGINAL
  source points (no pose-composition drift), and an iteration whose weights
  all vanish keeps the previous pose instead of degrading to (I, 0);
- plane mode (mode='plane') solves the damped 6x6 point-to-plane normal
  equations per step against target PCA normals (`estimate_normals` — one
  MXU distance matmul + top_k + closed-form eig3), for the scan-matching regime
  where src and tgt sample the surface at different points.

Unlike `kabsch_irls` (which reweights the NETWORK's putative correspondence
set), ICP re-associates by geometry — it refines through bad or sparse
correspondences as long as the initial pose is in the right basin. The two
compose: head -> [spectral] -> [IRLS] -> [ICP], coarse to fine.

Memory is O(N*M) for the distance matrix (fp32): at serving shapes
(B=1, N=M=2048) that is 16 MB/iteration inside one scan buffer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.se3 import matrix_exp_so3, skew
from .kabsch import _IRLS_KERNELS, kabsch_weighted



Array = jax.Array

__all__ = ["icp_refine", "icp_refine_multiscale", "nearest_neighbor",
           "estimate_normals", "point_covariances"]


def nearest_neighbor(query: Array, points: Array) -> tuple[Array, Array]:
    """1-NN of query [..., N, 3] in points [..., M, 3] via one MXU matmul.

    Returns (idx [..., N] int32, squared distance [..., N] fp32, clamped at
    0 against fp cancellation). Ties resolve to the lowest index (argmin).
    """
    from .knn import pairwise_sq_dists
    d2 = pairwise_sq_dists(query.astype(jnp.float32),
                           points.astype(jnp.float32))
    idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    return idx, jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]


def estimate_normals(points: Array, k: int = 16) -> Array:
    """Unit PCA normals [..., M, 3] of points [..., M, 3].

    Batched wrapper over the shared PCA-normal core in ops/fpfh
    (k-NN neighborhoods + smallest eigenvector of the neighborhood
    covariance via the closed-form `ops/eig3`). The fpfh variant's
    viewpoint orientation is harmless here: point-to-plane ICP only uses the
    normal in products that square out, so the sign is irrelevant — orient
    explicitly if you need a consistent field. Degenerate (zero-spread)
    neighborhoods return a unit vector, not NaN.
    """
    from .fpfh import estimate_normals as _normals_single
    p = points.astype(jnp.float32)
    flat = p.reshape((-1,) + p.shape[-2:])
    out = jax.vmap(lambda c: _normals_single(c, k=k))(flat)
    return out.reshape(p.shape)


def point_covariances(points: Array, k: int = 16, eps: float = 1e-3,
                      normals: Array | None = None) -> Array:
    """GICP-shaped surface covariances [..., M, 3, 3] of points [..., M, 3].

    Per point: PCA of the k-neighborhood, eigenvalues REPLACED by
    (1, 1, eps) in the local frame (Segal et al.'s plane-like shaping —
    the surface direction is trusted, the normal direction is not). With
    that spectrum the full basis is never needed: U diag(1, 1, eps) Uᵀ
    = I − (1 − eps)·n nᵀ with n the NORMAL — so this is literally a
    rank-one update of `estimate_normals`' output (the sign squares out).
    Pass ``normals`` [..., M, 3] to reuse an existing field and skip the
    k-NN/PCA pass entirely. Scale-free by construction, so the Mahalanobis
    weights in GICP depend only on surface ORIENTATION, not sampling
    density.
    """
    nrm = (estimate_normals(points, k=k) if normals is None
           else normals.astype(jnp.float32))
    eye = jnp.eye(3, dtype=jnp.float32)
    return eye - (1.0 - eps) * nrm[..., :, None] * nrm[..., None, :]


def icp_refine(src: Array, tgt: Array, R: Array, t: Array, iters: int = 10,
               tau: float = 0.0, kernel: str = "welsch",
               min_sigma: float = 1e-3, solver: str = "svd",
               prior_weights: Array | None = None, mode: str = "point",
               tgt_normals: Array | None = None,
               src_normals: Array | None = None, normals_k: int = 16,
               trim: float | str = 0.0, min_trim: float = 0.2,
               src_cov: Array | None = None, tgt_cov: Array | None = None
               ) -> tuple[Array, Array, Array]:
    """ICP from an initial pose (R [..., 3, 3], t [..., 3]).

    src [..., N, 3] and tgt [..., M, 3] are CLOUDS, not index-aligned
    correspondences — each of the `iters` scan steps re-associates the posed
    source with its nearest target point and re-solves.

    mode='point' minimizes point-to-point distances with a weighted Kabsch
    solve. mode='plane' minimizes point-to-PLANE residuals n·(x − y) against
    the target's PCA normals (`tgt_normals`, or `estimate_normals(tgt,
    normals_k)` computed once up front): each step linearizes about the
    current pose and solves the damped 6×6 normal equations for [δω, δt],
    applying δω through the exact Rodrigues map (core/se3.matrix_exp_so3).
    Plane mode converges where point mode stalls — surfaces sampled at
    DIFFERENT points in src and tgt (no exact counterparts), the standard
    scan-matching regime; it is what open3d users pick for the same reason.
    mode='symmetric' is the symmetric point-to-plane objective
    (Rusinkiewicz, "A symmetric objective function for ICP", SIGGRAPH 2019):
    residuals (x − y)·(n_x + n_y) against the SUM of the posed source normal
    and the target normal (each source normal sign-aligned to its paired
    target normal first — PCA normals are unoriented). The combined normal
    zeroes the residual anywhere on the locally-second-order surface between
    the two samplings instead of on the target's tangent plane alone, which
    both widens the convergence basin and removes point-to-plane's bias on
    curved surfaces sampled at different points; linearization about the
    source pose (one-sided parameterization) keeps the same damped 6×6
    Gauss-Newton step as plane mode with n replaced by the combined normal.
    `src_normals` precomputes the source field (else `estimate_normals(src,
    normals_k)` once up front, rotated by the current pose each iteration).

    mode='gicp' is Generalized ICP (Segal et al.; open3d's
    registration_generalized_icp): each step minimizes Mahalanobis residuals
    rᵀ(C_y + R C_x Rᵀ)⁻¹r against plane-shaped PCA covariances on BOTH
    clouds (`point_covariances`, or pass src_cov/tgt_cov) — plane-to-plane,
    using surface orientation on the source side too; batched 3×3 inverses
    and one damped 6×6 Gauss-Newton solve per step.

    Correspondence weights per iteration: `prior_weights` (e.g. the head's
    inlier weights over src; default ones) times a robust factor of the
    residual (NN distance in point mode, |plane residual| in plane mode) —
    `tau > 0` gates hard at that radius (trimmed ICP with static shapes);
    `tau == 0` uses the MAD-scaled `kernel` ('welsch' | 'huber' | 'cauchy' |
    'geman', ops/kabsch._IRLS_KERNELS) so the trim adapts to the current
    residual scale; `trim ∈ (0, 1)` instead keeps the best `trim`-fraction
    of residuals each iteration (overlap-fraction trimmed ICP — the right
    tool when MOST source points have no counterpart, where a MAD scale is
    itself corrupted; classic TrICP semantics with static shapes via
    jnp.quantile); `trim='auto'` estimates the overlap fraction ITSELF each
    iteration by minimizing Chetverikov's TrICP objective
    ψ(ξ) = e(ξ)/ξ^(1+λ) (λ=2) over every prefix of the sorted residuals —
    one sort + cumsum, so all N candidate trims are evaluated in one
    fixed-shape pass; `min_trim` floors the search (degenerate tiny subsets
    always have small e). Returns (R, t, final_weights). NaN-safe: an all-rejected
    iteration keeps the previous pose (point mode via an explicit `where`;
    plane mode because the damped system then returns δ = 0).
    """
    if kernel not in _IRLS_KERNELS:
        raise ValueError(f"unknown ICP kernel {kernel!r}; "
                         f"expected one of {sorted(_IRLS_KERNELS)}")
    if mode not in ("point", "plane", "symmetric", "gicp"):
        raise ValueError(f"unknown ICP mode {mode!r}; expected 'point', "
                         "'plane', 'symmetric', or 'gicp'")
    kfn = _IRLS_KERNELS[kernel]

    srcf = src.astype(jnp.float32)
    tgtf = tgt.astype(jnp.float32)
    w0 = (jnp.ones(srcf.shape[:-1], jnp.float32) if prior_weights is None
          else prior_weights.astype(jnp.float32))
    if mode in ("plane", "symmetric"):
        normals = (estimate_normals(tgtf, k=normals_k) if tgt_normals is None
                   else tgt_normals.astype(jnp.float32))
    if mode == "symmetric":
        nsrc = (estimate_normals(srcf, k=normals_k) if src_normals is None
                else src_normals.astype(jnp.float32))
    if mode == "gicp":
        C_src = (point_covariances(srcf, k=normals_k) if src_cov is None
                 else src_cov.astype(jnp.float32))
        C_tgt = (point_covariances(tgtf, k=normals_k) if tgt_cov is None
                 else tgt_cov.astype(jnp.float32))

    if trim == "auto":
        pass
    elif isinstance(trim, str):
        raise ValueError(f"trim must be a fraction in [0, 1) or 'auto', "
                         f"got {trim!r}")
    elif not 0.0 <= trim < 1.0:
        raise ValueError(f"trim must be in [0, 1), got {trim}")

    def auto_cut(resid):
        """Chetverikov's automatic overlap: minimize ψ(ξ) = e(ξ)/ξ³ where
        e(ξ) is the mean squared residual of the best ξ·N points — every
        prefix scored at once via sort + cumsum."""
        n = resid.shape[-1]
        r_sorted = jnp.sort(resid, axis=-1)
        m = jnp.arange(1, n + 1, dtype=jnp.float32)
        e = jnp.cumsum(r_sorted * r_sorted, axis=-1) / m
        xi = m / n
        psi = (e + 1e-12) / (xi ** 3)
        psi = jnp.where(xi >= min_trim, psi, jnp.inf)
        best = jnp.argmin(psi, axis=-1)
        return jnp.take_along_axis(r_sorted, best[..., None], axis=-1)

    def robust(resid):
        if tau > 0:
            return w0 * (resid <= tau)
        if trim == "auto":
            return w0 * (resid <= auto_cut(resid))
        if trim > 0:
            cut = jnp.quantile(resid, trim, axis=-1, keepdims=True)
            return w0 * (resid <= cut)
        med = jnp.median(resid, axis=-1, keepdims=True)
        s = 1.4826 * jnp.median(jnp.abs(resid - med), axis=-1, keepdims=True)
        return w0 * kfn(resid / jnp.maximum(s, min_sigma))

    # trust-region radius for GN translation steps: the target's bounding
    # radius (see _guard_step). Computed once, outside the scan.
    t_scale = 2.0 * jnp.sqrt(jnp.max(jnp.sum(
        (tgtf - jnp.mean(tgtf, axis=-2, keepdims=True)) ** 2, axis=-1),
        axis=-1))                                              # [...]

    def _guard_step(delta):
        """Reject Gauss-Newton steps the quadratic model cannot justify:
        non-finite entries, a rotation step over pi, or a translation step
        beyond 2x the target's bounding radius (the damped system can still
        emit a near-null-space step of ~1/damp magnitude when the weighted
        points are collinear — one such step overflows the fp32 positions,
        the next NN pass reads inf, and every later iteration is NaN;
        observed on TPU with a junk branch pose under verified multi-branch
        selection). A rejected step solves to delta = 0, keeping the pose —
        the same semantics as an all-rejected iteration."""
        ok = (jnp.all(jnp.isfinite(delta), axis=-1)
              & (jnp.sum(delta[..., :3] ** 2, axis=-1) < jnp.pi ** 2)
              & (jnp.sum(delta[..., 3:] ** 2, axis=-1) < t_scale ** 2))
        return jnp.where(ok[..., None], delta, 0.0)

    def body(carry, _):
        R_, t_ = carry
        x = jnp.einsum("...ij,...nj->...ni", R_, srcf) + t_[..., None, :]
        nn, d2 = nearest_neighbor(x, tgtf)
        y = jnp.take_along_axis(tgtf, nn[..., None], axis=-2)
        if mode == "point":
            w = robust(jnp.sqrt(d2))
            R2, t2 = kabsch_weighted(srcf, y, w, solver=solver)
            ok = jnp.sum(w, axis=-1) > 0
            R2 = jnp.where(ok[..., None, None], R2, R_)
            t2 = jnp.where(ok[..., None], t2, t_)
        elif mode == "gicp":
            # plane-to-plane: Mahalanobis GN against the combined surface
            # covariance; trimming stays Euclidean (consistent with the
            # other modes)
            w = robust(jnp.sqrt(d2))
            Cy = jnp.take_along_axis(C_tgt, nn[..., None, None], axis=-3)
            Cx = jnp.einsum("...ab,...nbc,...dc->...nad", R_, C_src, R_)
            eye3 = jnp.eye(3, dtype=jnp.float32)
            Minv = jnp.linalg.inv(Cy + Cx + 1e-6 * eye3)     # [..., N, 3, 3]
            r0 = x - y                                        # [..., N, 3]
            J = jnp.concatenate([-skew(x),
                                 jnp.broadcast_to(eye3, x.shape + (3,))],
                                axis=-1)                      # [..., N, 3, 6]
            H = jnp.einsum("...n,...nai,...nab,...nbj->...ij", w, J, Minv, J)
            g = jnp.einsum("...n,...nai,...nab,...nb->...i", w, J, Minv, r0)
            damp = (1e-8 * jnp.trace(H, axis1=-2, axis2=-1) / 6.0 + 1e-12)
            H = H + damp[..., None, None] * jnp.eye(6, dtype=H.dtype)
            delta = _guard_step(-jnp.linalg.solve(H, g[..., None])[..., 0])
            Rd = matrix_exp_so3(delta[..., :3])
            R2 = Rd @ R_
            t2 = jnp.einsum("...ij,...j->...i", Rd, t_) + delta[..., 3:]
        else:
            n = jnp.take_along_axis(normals, nn[..., None], axis=-2)
            if mode == "symmetric":
                # combined normal n_tgt + n_src (posed): residuals vanish on
                # the locally-quadratic surface BETWEEN the two samplings,
                # not on the target's tangent plane. PCA normals are
                # unoriented, so flip each source normal to agree with its
                # paired target normal before summing (an anti-aligned pair
                # would cancel to ~0 and mute the residual).
                nx = jnp.einsum("...ij,...nj->...ni", R_, nsrc)
                sgn = jnp.sign(jnp.sum(nx * n, axis=-1, keepdims=True))
                n = n + jnp.where(sgn == 0.0, 1.0, sgn) * nx
            r = jnp.sum(n * (x - y), axis=-1)                  # [..., N]
            w = robust(jnp.abs(r))
            a = jnp.concatenate([jnp.cross(x, n), n], axis=-1)  # [..., N, 6]
            A = jnp.einsum("...n,...ni,...nj->...ij", w, a, a)
            rhs = -jnp.einsum("...ni,...n->...i", a, w * r)
            # scale-aware Tikhonov: all-zero weights (or a degenerate
            # neighborhood) solve to delta = 0, keeping the pose
            damp = 1e-8 * jnp.trace(A, axis1=-2, axis2=-1) / 6.0 + 1e-12
            A = A + damp[..., None, None] * jnp.eye(6, dtype=A.dtype)
            delta = _guard_step(jnp.linalg.solve(A, rhs[..., None])[..., 0])
            Rd = matrix_exp_so3(delta[..., :3])
            R2 = Rd @ R_
            t2 = (jnp.einsum("...ij,...j->...i", Rd, t_)
                  + delta[..., 3:])
        return (R2, t2), w

    (R, t), ws = jax.lax.scan(
        body, (R.astype(jnp.float32), t.astype(jnp.float32)), None,
        length=iters)
    return R, t, ws[-1]


def icp_refine_multiscale(src: Array, tgt: Array, R: Array, t: Array,
                          voxel_sizes=(0.10, 0.05, 0.0), iters=10,
                          prior_weights: Array | None = None, **kw
                          ) -> tuple[Array, Array, Array]:
    """Coarse-to-fine ICP over a voxel pyramid (open3d's ``multi_scale_icp``).

    Runs `icp_refine` once per entry of ``voxel_sizes`` (a static Python
    tuple, coarsest first): entries > 0 register `ops/voxel.voxel_downsample`
    centroids of both clouds at that cell size — a SMOOTHER objective (cell
    averaging low-passes surface detail, widening the convergence basin
    exactly like the classic image-pyramid argument) — and an entry of 0.0
    runs on the raw clouds. An entry may also be a ``(voxel_size, num_out)``
    pair with a static ``num_out < N``: the coarse scale then genuinely
    SHRINKS (its O(N·M) NN matmul by the square), instead of only padding.
    ``iters`` is shared per scale, or a sequence matched to ``voxel_sizes``.
    Every scale keeps static shapes (the downsample pads by replicating
    valid centroids; their weight is zeroed via the validity mask as the
    scale's `prior_weights`), so the whole pyramid jits as one program.
    ``prior_weights`` (over raw src rows) applies only to 0.0-scales — there
    is no point↔centroid correspondence to map it through at coarser ones.
    The same is true of the per-POINT field kwargs ``tgt_normals`` /
    ``src_normals`` / ``src_cov`` / ``tgt_cov``: they are sized for the raw
    clouds, so they too apply only to 0.0-scales; coarser scales recompute
    normals/covariances on their own downsampled centroids (``normals_k``
    forwards everywhere). Returns (R, t, weights-of-the-final-scale); if the
    final scale is coarser than 0.0 the weights index its downsampled cloud.
    Remaining kwargs (mode / trim / tau / kernel / solver ...) forward to
    every scale.

    Pick coarse cells well below the cloud's structure scale: a cell size
    at which many points fall in every cell collapses the centroids toward
    the voxel GRID itself, whose cubic symmetry can snap a coarse scale to
    a ~90-deg alias (measured on a dense uniform volume at ~8 points/cell —
    the same failure open3d's multi_scale_icp has there). Surface scans at
    a few points per occupied cell are the intended regime.
    """
    from .voxel import voxel_downsample
    voxel_sizes = tuple(voxel_sizes)
    if not voxel_sizes:
        raise ValueError("voxel_sizes must name at least one scale")
    if isinstance(iters, int):
        iters = (iters,) * len(voxel_sizes)
    if len(iters) != len(voxel_sizes):
        raise ValueError(f"iters has {len(iters)} entries for "
                         f"{len(voxel_sizes)} scales")
    w = (jnp.ones(src.shape[:-1], jnp.float32) if prior_weights is None
         else prior_weights.astype(jnp.float32))
    # per-point fields are sized for the RAW clouds — pairing them with
    # downsampled centroids would silently use unrelated normals/covariances
    raw_only = {f: kw.pop(f) for f in ("tgt_normals", "src_normals",
                                       "src_cov", "tgt_cov") if f in kw}
    for v, it in zip(voxel_sizes, iters):
        v, num_out = v if isinstance(v, (tuple, list)) else (v, None)
        if it <= 0:
            continue
        if v > 0:
            s, smask, _ = voxel_downsample(src, v, num_out=num_out)
            g, _, _ = voxel_downsample(tgt, v, num_out=num_out)
            R, t, w = icp_refine(s, g, R, t, iters=it,
                                 prior_weights=smask.astype(jnp.float32),
                                 **kw)
        else:
            if num_out is not None:
                raise ValueError("num_out requires a voxel size > 0")
            R, t, w = icp_refine(src, tgt, R, t, iters=it,
                                 prior_weights=prior_weights, **raw_only,
                                 **kw)
    return R, t, w
