"""Equivariant kernel basis: Q_J change-of-basis and SH-based kernels.

Capability parity with /root/reference/utils/basis.py: `basis_transformation_Q_J`
(:123-138, Sylvester-nullspace solve in float64 with caching) and `get_basis`
(:153-205, kernels K_J = Y_J · Q_Jᵀ for all (d_in, d_out) degree pairs).

Q_J is the intertwiner satisfying the defining identity (the reference's
test_basis.py oracle):

    kron(D_a(g), D_b(g)) @ Q_J = Q_J @ D_J(g)     for all g ∈ SO(3)

computed here as the common nullspace of that constraint for two generic
rotations (float64 SVD — equivalent to the reference's Sylvester solve, no
disk cache needed since generation is cheap without torch overhead). Up to the
column orthobasis choice these are the real Clebsch-Gordan coefficients.
"""
from __future__ import annotations

import functools

import numpy as np

from .spherical_harmonics import spherical_harmonics_xyz
from .wigner import irr_repr


@functools.lru_cache(maxsize=None)
def basis_transformation_Q_J(J: int, d_in: int, d_out: int) -> np.ndarray:
    """Q_J [(2d_in+1)(2d_out+1), 2J+1] with kron(D_in, D_out) Q = Q D_J."""
    assert abs(d_in - d_out) <= J <= d_in + d_out, (J, d_in, d_out)
    n_in, n_out, n_j = 2 * d_in + 1, 2 * d_out + 1, 2 * J + 1
    dim = n_in * n_out

    rng = np.random.default_rng(12345)
    blocks = []
    for _ in range(2):
        a, b, c = rng.uniform(-np.pi, np.pi, 3)
        K = np.kron(irr_repr(d_in, a, b, c), irr_repr(d_out, a, b, c))
        DJ = irr_repr(J, a, b, c)
        # constraint on vec(Q): (K ⊗ I − I ⊗ DJᵀ) vec(Q) = 0
        A = np.kron(K, np.eye(n_j)) - np.kron(np.eye(dim), DJ.T)
        blocks.append(A)
    A = np.concatenate(blocks, axis=0)
    _, s, vt = np.linalg.svd(A)
    tol = max(1e-8 * s[0], 1e-10)   # absolute floor: (0,0,0) has an all-zero A
    null_dim = int(np.sum(s < tol))
    assert null_dim == 1, f"expected 1-dim intertwiner space, got {null_dim}"
    q = vt[-1]
    Q = q.reshape(dim, n_j)
    # normalize so QᵀQ = I (columns orthonormal up to a common scale)
    scale = np.sqrt(np.trace(Q.T @ Q) / n_j)
    Q = Q / scale
    return Q


def get_basis(rel_pos: np.ndarray, max_degree: int) -> dict[str, np.ndarray]:
    """Equivariant kernel basis for every (d_in, d_out) degree pair.

    rel_pos: [..., 3] relative positions. Returns
    {'<d_in>,<d_out>': [..., 2d_out+1, 2d_in+1, n_freq]} where
    n_freq = min(d_in,d_out)·2+1 frequencies J = |d_in−d_out|..d_in+d_out,
    K_J = reshape(Y_J(r̂) @ Q_Jᵀ) — the reference get_basis contract
    (utils/basis.py:153-205) with the same key naming.
    """
    rel = np.asarray(rel_pos, np.float64)
    basis: dict[str, np.ndarray] = {}
    for d_in in range(max_degree + 1):
        for d_out in range(max_degree + 1):
            freqs = []
            for J in range(abs(d_in - d_out), d_in + d_out + 1):
                Y = np.asarray(spherical_harmonics_xyz(J, rel))   # [..., 2J+1]
                Q = basis_transformation_Q_J(J, d_in, d_out)      # [ni·no, 2J+1]
                K = Y @ Q.T                                       # [..., ni·no]
                K = K.reshape(rel.shape[:-1] + (2 * d_in + 1, 2 * d_out + 1))
                freqs.append(np.swapaxes(K, -1, -2))              # [..., no, ni]
            basis[f"{d_in},{d_out}"] = np.stack(freqs, axis=-1)
    return basis


def num_basis_entries(max_degree: int) -> int:
    """(max_degree+1)² degree pairs — the reference test_basis count oracle."""
    return (max_degree + 1) ** 2
