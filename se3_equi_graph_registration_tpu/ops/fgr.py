"""Fast Global Registration (graduated non-convexity), fixed-shape on TPU.

The third coarse-alignment family next to ops/ransac (multi-hypothesis
voting) and ops/spectral (consistency eigenvector): Zhou-Park-Koltun-style
FGR — the capability open3d users reach via
`registration_fgr_based_on_feature_matching`. The reference repo has no
analog; its users fall back to open3d for exactly this stage.

Two classic ingredients, both recast as fixed-shape XLA programs:

1. **Tuple test** — sample triplets of putative correspondences and keep a
   correspondence only if some triplet containing it preserves all three
   pairwise intra-cloud lengths (|d_src/d_tgt| within [scale, 1/scale]).
   Classic implementations loop with data-dependent early exit; here ALL
   `tuples` triplets evaluate as one broadcast batch and membership folds
   back with a scatter-max — one program, no trip-count dependence.
2. **Graduated non-convexity on scaled Geman-McClure** — alternate the
   closed-form line process l = (mu / (mu + r^2))^2 with a weighted Kabsch
   solve, annealing mu from (cloud diameter)^2 down to delta^2 by
   `div_factor` every `anneal_every` steps. The original linearizes each
   pose update around the current estimate (one Gauss-Newton step on the
   se(3) tangent); the weighted-Kabsch solve is the EXACT minimizer of the
   same weighted point-to-point objective, so each alternation step here is
   at least as good — and it reuses the one 3xN-contraction kernel every
   other robust stage in this package is built on (ops/kabsch).

Unlike RANSAC the search is deterministic given the key (and needs no
all-inlier sample to exist); unlike the spectral eigenvector the annealing
re-evaluates consensus at every scale instead of committing to one global
cluster. Composes the same way: follow with `kabsch_irls`/`icp_refine`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .kabsch import kabsch_weighted

Array = jax.Array

__all__ = ["fgr_pose", "tuple_test"]


def tuple_test(src: Array, tgt: Array, key: Array, tuples: int = 1024,
               scale: float = 0.95, logits: Array | None = None) -> Array:
    """Length-ratio tuple filter over matched pairs.

    src/tgt [M, 3]: row i of src corresponds to row i of tgt. Samples
    `tuples` random triplets (index draws proportional to exp(`logits`),
    uniform when None), checks all three pairwise length ratios
    d_src/d_tgt in [scale, 1/scale], and returns a float [M] mask marking
    rows that appear in at least one passing triplet. Degenerate triplets
    (repeated indices -> zero lengths) are rejected explicitly rather than
    passing on a 0/0. If NO triplet passes, returns all-ones — downstream
    weighting still sees every candidate instead of an empty problem.
    """
    m = src.shape[0]
    if logits is None:
        logits = jnp.zeros((m,), jnp.float32)
    trip = jax.random.categorical(key, logits[None, :],
                                  shape=(tuples, 3))          # [T, 3] in [0, M)
    s = src.astype(jnp.float32)[trip]                         # [T, 3, 3]
    t = tgt.astype(jnp.float32)[trip]

    # the three pair lengths of each triplet: roll pairs (0,1),(1,2),(2,0)
    ds = jnp.linalg.norm(s - jnp.roll(s, -1, axis=1), axis=-1)   # [T, 3]
    dt = jnp.linalg.norm(t - jnp.roll(t, -1, axis=1), axis=-1)
    nondegen = jnp.all((ds > 1e-9) & (dt > 1e-9), axis=-1)
    ratio = ds / jnp.maximum(dt, 1e-9)
    ok = jnp.all((ratio > scale) & (ratio < 1.0 / scale), axis=-1) & nondegen

    mask = jnp.zeros((m,), jnp.float32)
    mask = mask.at[trip.reshape(-1)].max(
        jnp.repeat(ok.astype(jnp.float32), 3))
    return jnp.where(jnp.any(ok), mask, jnp.ones_like(mask))


def fgr_pose(src: Array, tgt: Array, scores: Array, key: Array,
             top_m: int = 512, tuples: int = 1024, tuple_scale: float = 0.95,
             iters: int = 48, div_factor: float | None = None,
             anneal_every: int | None = None, delta: float = 0.09,
             solver: str = "svd") -> tuple[Array, Array, Array]:
    """Graduated-non-convexity pose from putative correspondences.

    src/tgt [N, 3]: matched point pairs (e.g. `registration.match_features`
    output); scores [N]: priors used to pick the top-M candidate subset and
    to bias the tuple draws (same contract as ops/ransac.ransac_pose).
    Returns (R [3,3], t [3], weights [N] — the final Geman-McClure line
    process over the candidate subset, zero outside it).

    `delta` is the distance at which a residual stops counting as inlier
    (the GM scale floor; default 0.09 m, the 3DMatch recall threshold).
    mu anneals (cloud diameter)^2 -> delta^2 and then holds, so trailing
    iterations polish at the final scale. `div_factor=None` (default) sizes
    the schedule FROM THE DATA: a per-step geometric divisor
    (mu0/delta^2)^(1/(0.75*iters)) reaches the floor with the last quarter
    of the fixed-length scan left to polish, for any cloud diameter. An
    explicit `div_factor` reproduces the classic fixed schedule (divide
    every `anneal_every` steps) — then size `iters` yourself: it reaches
    the floor only when 2*log(D/delta)/log(div_factor)*anneal_every <=
    iters (mu is a SQUARED scale: 48 steps at 1.4 every 4 cover
    D/delta ~ 7.5, not 56).
    """
    n = scores.shape[-1]
    m = min(int(top_m), n)
    srcf = src.astype(jnp.float32)
    tgtf = tgt.astype(jnp.float32)
    sc = scores.astype(jnp.float32)

    _, cand = jax.lax.top_k(sc, m)                            # [M]
    s = srcf[cand]
    y = tgtf[cand]

    logits = jnp.log(jnp.maximum(sc[cand], 1e-30))
    mask = tuple_test(s, y, key, tuples=tuples, scale=tuple_scale,
                      logits=logits)                          # [M]

    # mu_0 = (candidate-cloud diameter)^2: at that scale every residual is
    # an inlier and the first solve is the plain masked Kabsch
    span = jnp.max(s, axis=0) - jnp.min(s, axis=0)
    mu0 = jnp.maximum(jnp.sum(span * span), delta * delta)

    if div_factor is None:
        if anneal_every is not None:
            # the data-sized auto schedule anneals EVERY step; a lone
            # anneal_every would be silently ignored — fail loudly instead
            raise ValueError(
                "anneal_every only applies to the classic fixed schedule: "
                "set div_factor explicitly alongside it (the default "
                "div_factor=None auto-sizes a per-step divisor)")
        steps = max(int(iters * 0.75), 1)
        step_div = (mu0 / (delta * delta)) ** (1.0 / steps)   # traced, >= 1
        every = 1
    else:
        step_div = div_factor
        every = 4 if anneal_every is None else anneal_every  # classic default

    def body(carry, i):
        R, t, mu, _ = carry
        r2 = jnp.sum((s @ R.T + t - y) ** 2, axis=-1)         # [M]
        l = (mu / (mu + r2)) ** 2
        w = mask * l
        R2, t2 = kabsch_weighted(s, y, w, solver=solver)
        anneal = (i + 1) % every == 0
        mu2 = jnp.where(anneal,
                        jnp.maximum(mu / step_div, delta * delta), mu)
        return (R2, t2, mu2, w), None

    init = (jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            mu0, mask)
    (R, t, _, w_cand), _ = jax.lax.scan(body, init, jnp.arange(iters))

    w = jnp.zeros((n,), jnp.float32).at[cand].set(w_cand)
    return R, t, w
