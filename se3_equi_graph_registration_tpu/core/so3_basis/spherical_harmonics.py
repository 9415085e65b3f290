"""Real (tesseral) spherical harmonics, jit-friendly.

Capability parity with the vendored library's recursive-Legendre SH
(/root/reference/utils/spherical_harmonics.py:34-123). Instead of a Python
memo cache over (l, m) lambdas, the associated Legendre values are produced by
a statically-unrolled recurrence per degree — every op is a fixed-shape jnp
elementwise op, so the whole stack jits and vmaps.

Convention: orthonormal real SH WITHOUT the Condon-Shortley phase in the
Legendre recurrence (the (−1)^m is not applied), ordering m = −l..l:

  Y_{l,m}(θ, φ) = N_{l,|m|} P_l^{|m|}(cos θ) · {√2 sin|m|φ, 1, √2 cos mφ}
  N_{l,m} = sqrt((2l+1)/(4π) · (l−m)!/(l+m)!)

`wigner.py` builds its real-basis change to match exactly this convention
(validated by tests/test_so3_basis.py: Y(Rx) = D(R) Y(x) at 1e-8 in f64).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _legendre_all(l_max: int, x: Array):
    """Associated Legendre P_l^m(x) (no Condon-Shortley) for all 0<=m<=l<=l_max.

    Returns dict[(l, m)] of arrays shaped like x. Standard recurrences:
      P_m^m   = (2m-1)!! (1-x²)^{m/2}
      P_{m+1}^m = x (2m+1) P_m^m
      (l-m) P_l^m = x (2l-1) P_{l-1}^m − (l+m-1) P_{l-2}^m
    """
    out = {}
    somx2 = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    pmm = jnp.ones_like(x)
    for m in range(l_max + 1):
        if m > 0:
            pmm = pmm * (2 * m - 1) * somx2
        out[(m, m)] = pmm
        if m < l_max:
            pmmp1 = x * (2 * m + 1) * pmm
            out[(m + 1, m)] = pmmp1
            p_prev, p_curr = pmm, pmmp1
            for l in range(m + 2, l_max + 1):
                p_next = (x * (2 * l - 1) * p_curr - (l + m - 1) * p_prev) / (l - m)
                out[(l, m)] = p_next
                p_prev, p_curr = p_curr, p_next
    return out


def _norm(l: int, m: int) -> float:
    return math.sqrt((2 * l + 1) / (4 * math.pi)
                     * math.factorial(l - m) / math.factorial(l + m))


@partial(jax.jit, static_argnums=(0,))
def spherical_harmonics(l: int, theta: Array, phi: Array) -> Array:
    """Y_l(θ, φ) → [..., 2l+1], m ordered −l..l.

    θ = polar angle from +z (0..π), φ = azimuth (reference x_to_alpha_beta
    convention maps to θ=beta, φ=alpha — utils/irr_repr.py:82-95).
    """
    ct = jnp.cos(theta)
    P = _legendre_all(l, ct)
    cols = []
    for m in range(-l, l + 1):
        am = abs(m)
        base = _norm(l, am) * P[(l, am)]
        if m < 0:
            cols.append(math.sqrt(2.0) * base * jnp.sin(am * phi))
        elif m == 0:
            cols.append(base)
        else:
            cols.append(math.sqrt(2.0) * base * jnp.cos(m * phi))
    return jnp.stack(cols, axis=-1)


def cartesian_to_angles(xyz: Array, eps: float = 1e-12) -> tuple[Array, Array]:
    """Unit-normalize and convert to (θ polar, φ azimuth)."""
    r = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    v = xyz / jnp.maximum(r, eps)
    theta = jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    return theta, phi


@partial(jax.jit, static_argnums=(0,))
def spherical_harmonics_xyz(l: int, xyz: Array) -> Array:
    """Y_l evaluated at cartesian directions [..., 3] → [..., 2l+1]."""
    theta, phi = cartesian_to_angles(xyz)
    return spherical_harmonics(l, theta, phi)


def all_spherical_harmonics(l_max: int, xyz: Array) -> list[Array]:
    """[Y_0, ..., Y_{l_max}] for cartesian input."""
    return [spherical_harmonics_xyz(l, xyz) for l in range(l_max + 1)]
