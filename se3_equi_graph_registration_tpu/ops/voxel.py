"""Fixed-shape voxel-grid downsampling for TPU.

The device-side equivalent of open3d's ``voxel_down_sample`` — the
preprocessing stage the reference's KITTI pipeline runs on host CPU
(/root/reference/data_preprocess/process_kitti.py:21-38 voxel-downsamples
with open3d before FPFH) and the standard coarse stage of multiscale ICP.
A voxel downsample has a data-dependent OUTPUT SIZE, which XLA cannot
express; the TPU-native formulation keeps the input shape [N] and marks
validity instead:

- voxel ids are the integer cell coords ``floor(p / voxel)`` (origin-aligned
  grid, like open3d's ``voxel_down_sample`` contract);
- one lexicographic 3-key ``lax.sort`` groups co-voxel points into runs
  (3 key + 3 value operands — under morton's variadic-sort cap);
- run boundaries become segment ids via a cumsum, so per-voxel centroids are
  ONE ``segment_sum`` with static ``num_segments=N``;
- the V valid centroids land in rows [0, V); the N−V padding rows REPLICATE
  valid centroids cyclically (row j ← centroid[j mod V]) rather than holding
  a sentinel, so downstream fixed-shape consumers stay well-conditioned:
  nearest-neighbor queries against the result never select a bogus location
  (ties resolve to the lower, valid index), and rank statistics over
  residuals (ICP's MAD / trim quantiles) see an approximately uniformly
  re-sampled copy of the valid distribution instead of a spike at a
  sentinel.

Solvers must still zero the padding out of WEIGHTED reductions — pass
``mask`` (or ``mask.astype(float)``) as the prior weight, as
``icp_refine_multiscale`` does.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["voxel_downsample"]


def _downsample_one(points: Array, voxel: Array, num_out: int):
    n = points.shape[0]
    p = points.astype(jnp.float32)
    q = jnp.floor(p / voxel).astype(jnp.int32)              # [N, 3] cell ids
    ops = tuple(q[:, j] for j in range(3)) + tuple(p[:, j] for j in range(3))
    out = jax.lax.sort(ops, dimension=0, num_keys=3)
    qs = jnp.stack(out[:3], axis=-1)                        # sorted cells
    ps = jnp.stack(out[3:], axis=-1)                        # co-sorted points
    new = jnp.any(qs[1:] != qs[:-1], axis=-1)               # run boundaries
    seg = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(new.astype(jnp.int32))])
    sums = jax.ops.segment_sum(ps, seg, num_segments=n)
    cnts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), seg,
                               num_segments=n)
    cent = sums / jnp.maximum(cnts, 1.0)[:, None]
    v = seg[-1] + 1                                         # occupied voxels
    idx = jnp.arange(num_out, dtype=jnp.int32)
    count = jnp.minimum(v, num_out)
    mask = idx < count
    # v <= num_out: identity gather + cyclic padding. v > num_out: an even
    # SPREAD over the lexicographic run — never a prefix truncation, which
    # would keep only the low-coordinate corner of the cloud.
    # floor(idx*v/num_out) must not be computed as idx*v in int32 (overflows
    # once num_out*v > 2^31, e.g. KITTI-scale clouds): split off the
    # quotient so both partial products stay below
    # num_out*max(num_out, v/num_out) — exact (ids strictly increasing, all
    # distinct) while num_out <= 46340 (= floor(sqrt(2^31))). Beyond that,
    # fall back to a float32 spread clamped into the valid run: float32
    # can't represent idx*step exactly at that scale, so neighboring ids may
    # round together (duplicates) or apart — the spread stays monotone
    # non-decreasing and in-range, but NOT all-distinct
    # (tests/test_voxel.py::test_spread_float32_fallback).
    if num_out <= 46340:
        spread = idx * (v // num_out) + (idx * (v % num_out)) // num_out
    else:
        spread = jnp.floor(
            idx.astype(jnp.float32) * (v.astype(jnp.float32) / num_out)
        ).astype(jnp.int32)
        spread = jnp.clip(spread, 0, jnp.maximum(v - 1, 0))
    take = jnp.where(v <= num_out, jnp.where(mask, idx, idx % v), spread)
    cent = jnp.take(cent, take, axis=0)
    return cent, mask, count


def voxel_downsample(points: Array, voxel_size, num_out: int | None = None
                     ) -> tuple[Array, Array, Array]:
    """Voxel-grid centroids of ``points`` [..., N, 3] at cell edge
    ``voxel_size`` (> 0; scalar, float or traced).

    Returns ``(centroids [..., num_out, 3], mask [..., num_out] bool,
    count [...])`` with ``num_out`` defaulting to N: rows [0, count) hold
    one centroid per occupied voxel (in lexicographic cell order); rows
    [count, num_out) cyclically replicate the valid centroids (see module
    docstring). A static ``num_out < N`` shrinks the output — the fixed-
    shape payoff of downsampling (e.g. a 4x smaller coarse ICP scale makes
    its NN matmul 16x cheaper): if more than ``num_out`` voxels are
    occupied, an even spread over the cell-ordered run is kept. Jittable,
    static shapes, batched over any leading dims.
    """
    voxel = jnp.asarray(voxel_size, jnp.float32)
    if voxel.ndim != 0:
        raise ValueError(f"voxel_size must be a scalar, got shape "
                         f"{voxel.shape}")
    p = jnp.asarray(points)
    n = p.shape[-2]
    num_out = n if num_out is None else int(num_out)
    if not 1 <= num_out:
        raise ValueError(f"num_out must be >= 1, got {num_out}")
    flat = p.reshape((-1,) + p.shape[-2:])
    cent, mask, v = jax.vmap(
        lambda c: _downsample_one(c, voxel, num_out))(flat)
    lead = p.shape[:-2]
    return (cent.reshape(lead + (num_out, 3)),
            mask.reshape(lead + (num_out,)), v.reshape(lead))
