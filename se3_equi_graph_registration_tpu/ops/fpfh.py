"""FPFH-33 descriptors as pure jnp — descriptor extraction without open3d.

The reference's offline preprocessing needs open3d for FPFH
(/root/reference/data_preprocess/process_kitti.py:21-38: voxel downsample →
normal estimation → compute_fpfh_feature), an external dependency this image
does not ship. This module provides the whole stage natively:

- `voxel_downsample` (host numpy — variable output size is inherent);
- `estimate_normals`: per-point PCA over the k-NN neighborhood, smallest
  eigenvector via the closed-form symmetric solver (ops/eig3.py), oriented
  toward the sensor origin like open3d's default;
- `fpfh`: the Rusu et al. FPFH-33: per-edge Darboux-frame angle triple
  (alpha, phi, theta), 11-bin histograms per channel accumulated with one-hot
  matmuls (no scatter — the same trick as the EGNN aggregation), SPFH
  normalized per channel to sum 100 (PCL/open3d convention), then
  FPFH_i = SPFH_i + (1/k) * sum_j SPFH_j / ||p_i − p_j||.

Fixed shapes throughout (k-NN neighborhoods with an optional radius MASK
instead of open3d's variable radius search), so the whole extractor jits and
runs on TPU. Values are a faithful FPFH, not bit-parity with open3d (its
radius search and SPFH weighting differ in the tails); rotation invariance
and correspondence-matching quality are pinned by tests/test_fpfh.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .eig3 import smallest_eigvec_sym3
from .knn import knn_graph

Array = jax.Array

_BINS = 11


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Centroid-per-voxel downsampling (host numpy; output size is data-
    dependent). Matches open3d.voxel_down_sample semantics."""
    pts = np.asarray(points, np.float64)
    keys = np.floor(pts / voxel_size).astype(np.int64)
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    sums = np.zeros((len(uniq), 3), np.float64)
    np.add.at(sums, inverse, pts)
    counts = np.bincount(inverse, minlength=len(uniq)).astype(np.float64)
    return (sums / counts[:, None]).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("k", "orient"))
def estimate_normals(x: Array, k: int = 30,
                     viewpoint: Array | None = None,
                     orient: str = "viewpoint",
                     nbr: Array | None = None) -> Array:
    """Unit normals [N, 3] from k-NN PCA.

    orient='viewpoint' (default) points them toward `viewpoint` (default:
    the origin — open3d's orient_normals_towards_camera_location semantics
    for depth-sensor clouds). That orientation is FRAME-DEPENDENT: the same
    surface rigidly moved gets a different sign pattern, which scrambles
    sign-sensitive descriptors (FPFH's Darboux angles) across the two clouds
    of a registration pair unless the caller supplies each cloud's true
    sensor origin. orient='local' instead points each normal away from its
    own neighborhood centroid — an intrinsic, pose-EQUIVARIANT orientation
    (rotating the cloud rotates the signs with it), which is what the
    checkpoint-free matcher (registration.py) uses so descriptors agree
    between frames with no pose or sensor knowledge. Signs at locally flat /
    symmetric points are noise-determined under either policy.

    `nbr` [N, >=1] supplies a precomputed neighbor table (ignoring `k`) —
    registration.py computes ONE k-NN per cloud and slices it for both this
    estimator and `fpfh` (the k-selection is the pipeline's dominant cost;
    exact top_k lowers to a full per-row sort on TPU).
    """
    n = x.shape[0]
    if nbr is None:
        nbr = knn_graph(x, min(k, n))                   # [N, K] incl. self
    nbh = x[nbr]                                        # [N, K, 3]
    mean = jnp.mean(nbh, axis=1, keepdims=True)
    centered = nbh - mean
    cov = jnp.einsum("nka,nkb->nab", centered, centered)
    # smallest eigenvector of the (symmetric PSD) covariance — closed form
    # (ops/eig3; ~98x cheaper than the jnp.linalg.svd lowering at this shape)
    normals = smallest_eigvec_sym3(cov)
    if orient == "local":
        ref = x - mean[:, 0, :]          # away from local surface mass
    elif orient == "viewpoint":
        vp = jnp.zeros((3,), x.dtype) if viewpoint is None else viewpoint
        ref = vp[None, :] - x
    else:
        raise ValueError(f"unknown orient {orient!r}; "
                         "expected 'viewpoint' or 'local'")
    sign = jnp.where(jnp.sum(normals * ref, axis=-1) < 0.0, -1.0, 1.0)
    return normals * sign[:, None]


def _accumulate_window(spfh: Array, nbr: Array, inv_w: Array,
                       tile: int, window: int) -> Array:
    """Windowed SPFH neighbor accumulation: equals
    ``einsum('nk,nkc->nc', inv_w, spfh[nbr])`` when every neighbor of tile i
    lies in [S(i), S(i)+window) — the invariant `morton.knn_graph_window`
    guarantees on curve-sorted points.

    Instead of gathering K full descriptor rows per point (TPU row-gathers
    serialize at issue rate — the measured bound of the FPFH stage,
    BASELINE.md), each tile folds its neighbor weights into a banded
    adjacency A[t] [tile, window] (one fused compare-multiply-sum, no
    [tile, K, window] materialization survives fusion) and rides the MXU:
    A[t] @ spfh[S(t):S(t)+window]. fp32 throughout — descriptors are
    bit-equal to the gather formulation up to fp add order.
    """
    from .morton import window_starts
    n, c = spfh.shape
    k = nbr.shape[1]
    starts = window_starts(n, tile, window)                   # [n//tile]
    lanes = jnp.arange(window, dtype=jnp.int32)

    def tile_fn(s, nb, ww):
        cand = jax.lax.dynamic_slice(spfh, (s, jnp.zeros((), s.dtype)),
                                     (window, c))             # [W, C]
        local = nb - s                                        # [T, K]
        adj = jnp.sum((local[..., None] == lanes) * ww[..., None],
                      axis=1)                                 # [T, W]
        # HIGHEST: the MEASURED catastrophic bf16 failure was the moment
        # cancellation in estimate_normals_window (see there); this
        # accumulation is only mildly sensitive (1/d weights, no
        # cancellation) but is pinned fp32 for consistency with the gather
        # formulation (fpfh() pins its einsum the same way) — the cost is
        # negligible and it keeps fused/approx descriptors comparable.
        # Guarded by tests/test_fpfh.py::test_window_banded_matmuls_request_fp32.
        return jnp.matmul(adj, cand,
                          precision=jax.lax.Precision.HIGHEST)  # [T, C]

    out = jax.vmap(tile_fn)(starts, nbr.reshape(-1, tile, k),
                            inv_w.reshape(-1, tile, k))
    return out.reshape(n, c)


@functools.partial(jax.jit, static_argnames=("tile", "window"))
def estimate_normals_window(x: Array, nbr: Array, tile: int,
                            window: int) -> Array:
    """estimate_normals(orient='local') for a Hilbert-window neighbor table,
    with the [N, K, 3] neighborhood gather replaced by banded moment matmuls:
    per tile, an unweighted adjacency A [tile, W] contracts the window slice
    [W, 12] of (x, x⊗x) on the MXU — mean and covariance in one pass, no row
    gathers. Same math as the gather formulation (cov = Σxxᵀ − Kμμᵀ; eig3 is
    scale-invariant), same orientation (away from the neighborhood centroid).
    """
    from .morton import window_starts
    n = x.shape[0]
    k = nbr.shape[1]
    xf = x.astype(jnp.float32)
    # second-moment columns x⊗x [N, 9] alongside x [N, 3]
    xx = (xf[:, :, None] * xf[:, None, :]).reshape(n, 9)
    tab = jnp.concatenate([xf, xx], axis=1)               # [N, 12]
    starts = window_starts(n, tile, window)
    lanes = jnp.arange(window, dtype=jnp.int32)

    def tile_fn(s, nb):
        cand = jax.lax.dynamic_slice(tab, (s, jnp.zeros((), s.dtype)),
                                     (window, 12))
        local = nb - s                                    # [T, K]
        adj = jnp.sum((local[..., None] == lanes).astype(jnp.float32),
                      axis=1)                             # [T, W]
        # HIGHEST is load-bearing: cov = Σxxᵀ − Kμμᵀ is a catastrophic
        # cancellation (second moments ~K·x² vs a neighborhood-variance
        # signal ~K·σ², 6 orders apart at scan scale), and a DEFAULT TPU
        # matmul rounds the moment table to bf16 (~0.4% of the MOMENT =
        # orders of magnitude above the signal) — measured on the real chip
        # as garbage normals → 1/3 scenario success at 60% overlap vs 3/3
        # fixed. CPU tests run fp32 at either setting and cannot catch it;
        # tests/test_fpfh.py::test_window_banded_matmuls_request_fp32 pins
        # the jaxpr instead.
        return jnp.matmul(adj, cand,
                          precision=jax.lax.Precision.HIGHEST)  # [T, 12]

    mom = jax.vmap(tile_fn)(starts, nbr.reshape(-1, tile, k)).reshape(n, 12)
    mean = mom[:, :3] / k
    cov = mom[:, 3:].reshape(n, 3, 3) - k * mean[:, :, None] * mean[:, None, :]
    normals = smallest_eigvec_sym3(cov)
    ref = xf - mean                                       # 'local' orientation
    sign = jnp.where(jnp.sum(normals * ref, axis=-1) < 0.0, -1.0, 1.0)
    return normals * sign[:, None]


@functools.partial(jax.jit, static_argnames=("tile", "window"))
def fpfh_from_spfh(spfh: Array, nbr: Array, dist: Array, tile: int,
                   window: int) -> Array:
    """Finish FPFH from a Pallas SPFH pass (ops/pallas/spfh_kernel.py):
    FPFH_i = SPFH_i + mean_j SPFH_j / ||p_i − p_j|| over the valid (non-self,
    non-duplicate) neighbors — dist carries 0 at invalid pairs, exactly the
    kernel's mask. The neighbor accumulation is the banded-MXU matmul."""
    valid = dist > 0.0
    inv_w = jnp.where(valid, 1.0 / (dist + 1e-12), 0.0)
    counts = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1.0)
    neigh = _accumulate_window(spfh, nbr, inv_w, tile, window) / counts
    return spfh + neigh


def _histogram_onehot(values: Array, lo: float, hi: float) -> Array:
    """values [N, K] → per-point histogram [N, BINS] via one-hot compare
    (scatter-free)."""
    t = jnp.clip((values - lo) / (hi - lo), 0.0, 1.0 - 1e-7)
    idx = jnp.floor(t * _BINS).astype(jnp.int32)        # [N, K]
    onehot = (idx[..., None]
              == jnp.arange(_BINS, dtype=jnp.int32)).astype(values.dtype)
    return jnp.sum(onehot, axis=1)                      # [N, BINS]


@functools.partial(jax.jit, static_argnames=("k", "window_tile"))
def fpfh(x: Array, normals: Array, k: int = 30,
         nbr: Array | None = None,
         window_tile: tuple[int, int] | None = None) -> Array:
    """FPFH-33 descriptors [N, 33] over k-NN neighborhoods.

    Per neighbor pair (i, j): pick the source s ∈ {i, j} whose normal makes
    the smaller angle with the connecting line d (Rusu's convention), build
    the Darboux frame u = n_s, v = d̂ × u, w = u × v and the features
    alpha = v·n_t, phi = u·d̂, theta = atan2(w·n_t, u·n_t).

    `nbr` [N, K] supplies a precomputed neighbor table (ignoring `k`) so one
    k-selection can feed both `estimate_normals` and this extractor.

    `window_tile=(tile, window)` declares that `nbr` satisfies the Hilbert-
    window invariant (x curve-sorted, nbr from `morton.knn_graph_window`):
    the SPFH neighbor accumulation then rides the MXU as a banded adjacency
    matmul instead of gathering K descriptor rows per point
    (`_accumulate_window`). Same math; the per-edge gathers of x/normals
    stay (they feed elementwise work, not a reduction).
    """
    n = x.shape[0]
    if nbr is None:
        nbr = knn_graph(x, min(k, n))                   # [N, K] (self first)
    p_i = x[:, None, :]                                 # [N, 1, 3]
    p_j = x[nbr]                                        # [N, K, 3]
    n_i = jnp.broadcast_to(normals[:, None, :], p_j.shape)
    n_j = normals[nbr]

    d = p_j - p_i
    dist = jnp.linalg.norm(d, axis=-1)                  # [N, K]
    self_mask = dist > 1e-12                            # drop the self pair
    dhat = d / (dist[..., None] + 1e-12)

    # source/target selection: source normal has the smaller angle to d
    cos_i = jnp.abs(jnp.sum(n_i * dhat, axis=-1))
    cos_j = jnp.abs(jnp.sum(n_j * dhat, axis=-1))
    take_i = (cos_i >= cos_j)[..., None]
    n_s = jnp.where(take_i, n_i, n_j)
    n_t = jnp.where(take_i, n_j, n_i)
    dvec = jnp.where(take_i, dhat, -dhat)

    u = n_s
    v = jnp.cross(dvec, u)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
    w = jnp.cross(u, v)

    alpha = jnp.sum(v * n_t, axis=-1)                   # [-1, 1]
    phi = jnp.sum(u * dvec, axis=-1)                    # [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * n_t, axis=-1),
                        jnp.sum(u * n_t, axis=-1))      # [-pi, pi]

    mask = self_mask.astype(x.dtype)

    def hist(vals, lo, hi):
        h = _histogram_onehot(jnp.where(self_mask, vals, lo - 1.0), lo, hi)
        # out-of-range (masked) values land in bin 0 via the clip — subtract
        h = h.at[:, 0].add(-jnp.sum(1.0 - mask, axis=1))
        total = jnp.maximum(jnp.sum(h, axis=1, keepdims=True), 1e-6)
        return 100.0 * h / total                        # PCL convention

    spfh = jnp.concatenate([
        hist(alpha, -1.0, 1.0),
        hist(phi, -1.0, 1.0),
        hist(theta, -jnp.pi, jnp.pi),
    ], axis=1)                                          # [N, 33]

    # weighted neighbor accumulation: FPFH_i = SPFH_i + mean_j SPFH_j / w_j
    inv_w = jnp.where(self_mask, 1.0 / (dist + 1e-12), 0.0)  # [N, K]
    counts = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    if window_tile is not None:
        tile, window = window_tile
        neigh = _accumulate_window(spfh, nbr, inv_w, tile, window) / counts
    else:
        # fp32 like the banded path (_accumulate_window): not the measured
        # catastrophic term (that was the normals' moment cancellation), but
        # a DEFAULT TPU matmul would bf16-round the 1/d weights here while
        # the window path computes the same sum in fp32 — pin both so the
        # two formulations stay comparable. Cost is negligible (not the hot
        # path).
        neigh = jnp.einsum("nk,nkc->nc", inv_w, spfh[nbr],
                           precision=jax.lax.Precision.HIGHEST) / counts
    return spfh + neigh


def extract_fpfh_native(points: np.ndarray, voxel_size: float = 0.05,
                        k_normals: int = 30, k_fpfh: int = 60
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Drop-in native replacement for pairs.extract_fpfh: voxel downsample →
    normals → FPFH-33, no open3d. Returns (downsampled points [M, 3],
    descriptors [M, 33])."""
    pts = voxel_downsample(points, voxel_size)
    xj = jnp.asarray(pts, jnp.float32)
    normals = estimate_normals(xj, k=k_normals)
    feats = fpfh(xj, normals, k=k_fpfh)
    return pts, np.asarray(feats, np.float32)
