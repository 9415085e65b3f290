"""Pose-graph optimization (multiway registration), jitted end to end.

Pairwise registration (the whole reference pipeline) leaves a scan sequence
with drift: V fragment poses constrained by E relative-pose measurements
(odometry pairs + loop closures, e.g. the 3DMatch `gt.log` graphs that
utils/trajectory.py reads). Fusing them is classic pose-graph optimization —
open3d's `global_optimization`, g2o territory. The TPU-native formulation:

- state: absolute poses (R_i, t_i); retraction R_i·exp_so3(δω), t_i + δt;
- residual per edge (i, j) with measurement (R_ij, t_ij):
  [vee(log(R_ijᵀ R_iᵀ R_j)), R_iᵀ(t_j − t_i) − t_ij], smooth everywhere
  (atan2/Taylor-blended log coefficient — NO arccos, whose gradient blows
  up exactly at convergence);
- each Gauss-Newton step builds the full Jacobian with `jax.jacfwd` over the
  [V, 6] tangent (fixed shapes — autodiff replaces hand-derived SE(3)
  adjoint Jacobians), solves the damped normal equations as ONE dense
  [6V, 6V] `linalg.solve` on the MXU, and retracts;
- the gauge is fixed by a stiff prior on `anchor`'s tangent block, and the
  iteration is a fixed-length `lax.scan` — the entire optimizer jits.

Dense 6V×6V is the right TPU trade for fragment-scale graphs (V ≲ a few
hundred: 3DMatch scenes are ~50-60 fragments); sparse factorization wins
only at SLAM scales the surrounding framework doesn't produce.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.se3 import matrix_exp_so3

Array = jax.Array

__all__ = ["optimize_pose_graph", "optimize_trajectory"]


def _log_so3_vee(R: Array) -> Array:
    """Axis-angle vector of R [..., 3, 3]; smooth through θ = 0.

    ω = c(θ)·vee(R − Rᵀ)/2 with c = θ/sin θ, θ = atan2(|s|, (tr−1)/2).
    Unlike core.se3.matrix_log_so3 (which hard-zeroes small angles — fine
    for values, fatal for the Gauss-Newton Jacobian at convergence), both
    the θ ≈ 0 branch (Taylor 1 + θ²/6) and the switch are differentiable.
    Valid for θ < π − ε, which a pose-graph residual always satisfies.
    """
    s = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], axis=-1) * 0.5
    cos = (jnp.trace(R, axis1=-2, axis2=-1) - 1.0) * 0.5
    # guarded norm: sqrt'(0) = inf would NaN the Jacobian exactly at zero
    # residual (an EXACT rotation match is a normal GN state, not an edge
    # case) — in the small branch sin/theta are constants with zero grads
    # and ω = 1·s carries the correct identity-limit derivative
    sum2 = jnp.sum(s * s, axis=-1)
    small = sum2 < 1e-12
    sin = jnp.sqrt(jnp.where(small, 1.0, sum2))
    theta = jnp.arctan2(jnp.where(small, 0.0, sin), cos)
    c = jnp.where(small, 1.0 + theta * theta / 6.0, theta / sin)
    return c[..., None] * s


def optimize_pose_graph(R0: Array, t0: Array, edges: Array, R_rel: Array,
                        t_rel: Array, weights: Array | None = None,
                        iters: int = 10, damping: float = 1e-6,
                        anchor: int = 0, rot_weight: float = 1.0,
                        robust: str | None = None, min_sigma: float = 1e-4,
                        robust_anneal: float = 0.7) -> tuple[Array, Array]:
    """Gauss-Newton over absolute poses given relative measurements.

    R0 [V, 3, 3] / t0 [V, 3]: initial absolute poses (frame→world).
    edges [E, 2] int: (i, j) pairs. R_rel/t_rel: measured pose of frame j
    expressed in frame i (what a pairwise registration of fragment j onto
    fragment i produces). weights [E]: per-edge confidence (e.g. inverse
    residual variance from `pose_covariance`, or registration recall);
    default uniform. `rot_weight` scales the rotation residual relative to
    translation (unit balance). Returns optimized (R [V, 3, 3], t [V, 3])
    with pose `anchor` held fixed (stiff gauge prior).

    `robust` ('huber' | 'cauchy' | 'geman' | 'welsch', default None =
    plain least squares) re-weights edges each GN round by a kernel of
    their residual NORM — the IRLS form of switchable constraints. A single
    grossly-wrong edge (a confidently-wrong pairwise registration, which
    its covariance does NOT flag) otherwise drags the whole trajectory;
    with a robust kernel the consistent majority votes it down. The scale
    follows graduated non-convexity: round k uses
    max(MAD, max|r₀|·robust_anneal^k, min_sigma) — starting near least
    squares and annealing. Pure MAD deadlocks when the INIT itself embeds a
    bad edge (e.g. odometry integrated through a failed registration): most
    edges then agree with the wrong init, MAD collapses, and every
    informative loop closure is crushed before it can pull — measured, not
    hypothetical (tests/test_pose_graph.py). Set robust_anneal=0 for pure
    MAD scaling.
    """
    from .kabsch import _IRLS_KERNELS
    if robust is not None and robust not in _IRLS_KERNELS:
        raise ValueError(f"unknown robust kernel {robust!r}; "
                         f"expected one of {sorted(_IRLS_KERNELS)} or None")

    V = R0.shape[0]
    w_e = (jnp.ones(edges.shape[0], jnp.float32) if weights is None
           else weights.astype(jnp.float32))
    ei = edges[:, 0]
    ej = edges[:, 1]
    Rm = R_rel.astype(jnp.float32)
    tm = t_rel.astype(jnp.float32)

    def residuals(delta, R, t):
        """[E, 6] stacked (rotation, translation) residuals at tangent
        `delta` [V, 6] about (R, t) — autodiff of THIS gives the GN
        Jacobian, replacing hand-derived adjoints."""
        Rp = R @ matrix_exp_so3(delta[:, :3])
        tp = t + delta[:, 3:]
        Ri, Rj = Rp[ei], Rp[ej]
        R_err = jnp.einsum("eab,eca,ecd->ebd", Rm, Ri, Rj)  # Rmᵀ Riᵀ Rj
        r_rot = _log_so3_vee(R_err) * rot_weight
        r_t = jnp.einsum("eab,ea->eb", Ri, tp[ej] - tp[ei]) - tm
        return jnp.concatenate([r_rot, r_t], axis=-1)

    gauge = jnp.zeros((V,), jnp.float32).at[anchor].set(1.0)
    prior = 1e8 * jnp.repeat(gauge, 6)

    zero = jnp.zeros((V, 6), jnp.float32)
    r_init = residuals(zero, R0.astype(jnp.float32), t0.astype(jnp.float32))
    s_max = jnp.sqrt(jnp.maximum(
        jnp.max(jnp.sum(r_init * r_init, -1)), 1e-20)) + min_sigma

    def gn_step(carry, k):
        R, t = carry
        r_raw = residuals(zero, R, t)                       # [E, 6]
        w_it = w_e
        if robust is not None:
            # IRLS multiplier held constant within the step (standard)
            rn = jnp.sqrt(jnp.maximum(jnp.sum(r_raw * r_raw, -1), 1e-20))
            med = jnp.median(rn)
            s = jnp.maximum(1.4826 * jnp.median(jnp.abs(rn - med)),
                            min_sigma)
            if robust_anneal > 0:
                s = jnp.maximum(s, s_max * robust_anneal ** k)
            w_it = w_e * _IRLS_KERNELS[robust](rn / s)
        sw = jnp.sqrt(jnp.maximum(w_it, 0.0))[:, None]
        r = (r_raw * sw).reshape(-1)                        # [6E]
        J = jax.jacfwd(
            lambda d: (residuals(d, R, t) * sw).reshape(-1))(zero)
        J = J.reshape(r.shape[0], V * 6)                    # [6E, 6V]
        H = J.T @ J
        H = H + jnp.diag(prior + damping * (1.0 + jnp.diag(H)))
        delta = -jnp.linalg.solve(H, J.T @ r).reshape(V, 6)
        return (R @ matrix_exp_so3(delta[:, :3]), t + delta[:, 3:]), None

    (R, t), _ = jax.lax.scan(gn_step,
                             (R0.astype(jnp.float32), t0.astype(jnp.float32)),
                             jnp.arange(iters, dtype=jnp.float32))
    return R, t


def optimize_trajectory(poses: Array, edges: Array, rel: Array,
                        weights: Array | None = None, **kw
                        ) -> Array:
    """4×4 convenience wrapper: poses [V, 4, 4], rel [E, 4, 4] measured
    inv(T_i) @ T_j — the schema utils/trajectory.py reads from gt.log files.
    Returns optimized [V, 4, 4]."""
    poses = jnp.asarray(poses, jnp.float32)
    rel = jnp.asarray(rel, jnp.float32)
    R, t = optimize_pose_graph(poses[:, :3, :3], poses[:, :3, 3],
                               jnp.asarray(edges, jnp.int32),
                               rel[:, :3, :3], rel[:, :3, 3],
                               weights=weights, **kw)
    out = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (poses.shape[0], 1, 1))
    return out.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
