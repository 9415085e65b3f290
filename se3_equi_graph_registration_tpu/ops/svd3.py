"""3x3 SVD with a degenerate-safe custom VJP for the Kabsch pose solve.

The standard SVD pullback divides by (σj² − σi²); when the cross-covariance H
degenerates (e.g. the correspondence-weight softmax collapses onto one point,
leaving H ≈ εI with all singular values equal) that division is ±inf and one
NaN gradient poisons the whole training step. The reference backprops straight
through torch.linalg.svd (:741, :1126) and inherits this landmine; here the
inverse is Tikhonov-damped — smooth everywhere, exact on well-separated
spectra (damping is scale-aware and ~1e-12 relative).

Forward is jnp.linalg.svd in float32 (TPU-safe). Only the square case is
supported (the Kabsch H is always [..., 3, 3]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_DAMP_REL = 1e-12


@jax.custom_vjp
def svd3(H: Array) -> tuple[Array, Array, Array]:
    """(U, S, Vt) of square matrices [..., 3, 3], damped-gradient."""
    return jnp.linalg.svd(H, full_matrices=False)


def _fwd(H):
    out = jnp.linalg.svd(H, full_matrices=False)
    return out, out


def _damped_inv(d: Array, scale: Array) -> Array:
    """x → x/(x² + eps) with eps ∝ scale⁴ (σ² differences have units σ²)."""
    eps = _DAMP_REL * (scale[..., None, None] ** 4) + 1e-30
    return d / (d * d + eps)


def _bwd(res, cot):
    U, S, Vt = res
    dU, dS, dVt = cot
    V = jnp.swapaxes(Vt, -1, -2)
    dV = jnp.swapaxes(dVt, -1, -2)

    s2 = S * S
    smax = jnp.max(S, axis=-1)
    # F[i, j] = damped 1/(σj² − σi²), zero diagonal
    diff = s2[..., None, :] - s2[..., :, None]
    F = _damped_inv(diff, jnp.maximum(smax, 1e-20))
    eye = jnp.eye(S.shape[-1], dtype=S.dtype)
    F = F * (1.0 - eye)

    UtdU = jnp.swapaxes(U, -1, -2) @ dU
    VtdV = jnp.swapaxes(V, -1, -2) @ dV
    Sd = S[..., None, :]  # broadcast as diag(S) on the right / left

    term_u = (F * (UtdU - jnp.swapaxes(UtdU, -1, -2))) * Sd
    term_v = S[..., :, None] * (F * (VtdV - jnp.swapaxes(VtdV, -1, -2)))
    term_s = jnp.zeros_like(term_u) + dS[..., :, None] * eye

    inner = term_u + term_v + term_s
    dH = U @ inner @ Vt
    return (dH,)


svd3.defvjp(_fwd, _bwd)
