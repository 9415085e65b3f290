"""Ported equivariant-basis test families (reference tests/test_irrep_repr.py,
test_spherical_harmonics.py, test_basis.py — SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se3_equi_graph_registration_tpu.core.so3_basis import (  # noqa: E402
    basis, spherical_harmonics as sh, wigner)


@pytest.fixture(autouse=True)
def _x64():
    """These identities need float64, but flipping x64 at MODULE level (as
    round 1 did) leaks into every other test via pytest's collection-time
    import — toggle it per-test instead."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_sh_l0_l1_closed_forms(rng):
    x = rng.standard_normal((40, 3))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y0 = np.asarray(sh.spherical_harmonics_xyz(0, jnp.asarray(x)))
    np.testing.assert_allclose(y0, 0.5 / np.sqrt(np.pi), atol=1e-12)
    y1 = np.asarray(sh.spherical_harmonics_xyz(1, jnp.asarray(x)))
    c = np.sqrt(3.0 / (4 * np.pi))
    # m = (-1, 0, 1) ∝ (y, z, x)
    np.testing.assert_allclose(y1, c * x[:, [1, 2, 0]], atol=1e-12)


def test_sh_orthonormality_quadrature():
    """∫ Y_{l,m} Y_{l',m'} dΩ = δ — Gauss-Legendre × uniform-φ quadrature."""
    nodes, weights = np.polynomial.legendre.leggauss(64)
    theta = np.arccos(nodes)
    phi = np.linspace(0, 2 * np.pi, 128, endpoint=False)
    TH, PH = np.meshgrid(theta, phi, indexing="ij")
    W = np.broadcast_to(weights[:, None], TH.shape) * (2 * np.pi / 128)

    ys = []
    for l in range(4):
        y = np.asarray(sh.spherical_harmonics(l, jnp.asarray(TH), jnp.asarray(PH)))
        ys.append(y.reshape(-1, 2 * l + 1))
    Y = np.concatenate(ys, axis=1)          # [npts, 16]
    G = (Y * W.reshape(-1, 1)).T @ Y        # gram
    np.testing.assert_allclose(G, np.eye(16), atol=1e-10)


def test_sh_wigner_compatibility(rng):
    """Y(Rx) = D(R) Y(x) — reference test_irrep_repr.py:7-33 at 1e-10."""
    for l in range(5):
        a, b, c = rng.uniform(-np.pi, np.pi, 3)
        R = wigner.rot(a, b, c)
        x = rng.standard_normal((30, 3))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        Y = np.asarray(sh.spherical_harmonics_xyz(l, jnp.asarray(x)))
        YR = np.asarray(sh.spherical_harmonics_xyz(l, jnp.asarray(x @ R.T)))
        D = wigner.wigner_d_from_matrix(l, R)
        np.testing.assert_allclose(YR, Y @ D.T, atol=1e-10)


def test_wigner_group_properties(rng):
    l = 3
    D_id = wigner.irr_repr(l, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(D_id, np.eye(2 * l + 1), atol=1e-12)
    a1, b1, c1, a2, b2, c2 = rng.uniform(-1.5, 1.5, 6)
    comp = wigner.compose(a1, b1, c1, a2, b2, c2)
    D_comp = wigner.irr_repr(l, *comp)
    D_sep = wigner.irr_repr(l, a1, b1, c1) @ wigner.irr_repr(l, a2, b2, c2)
    np.testing.assert_allclose(D_comp, D_sep, atol=1e-10)
    D = wigner.irr_repr(l, a1, b1, c1)
    np.testing.assert_allclose(D @ D.T, np.eye(2 * l + 1), atol=1e-12)


def test_euler_roundtrip(rng):
    for _ in range(10):
        a, b, c = rng.uniform(-np.pi, np.pi, 3)
        b = abs(b) % np.pi
        R = wigner.rot(a, b, c)
        R2 = wigner.rot(*wigner.euler_angles(R))
        np.testing.assert_allclose(R2, R, atol=1e-10)


def test_basis_defining_identity(rng):
    """kron(D_in, D_out) Q_J = Q_J D_J — reference test_basis.py:10-15."""
    for (d_in, d_out, J) in [(1, 1, 0), (1, 1, 1), (1, 1, 2), (2, 1, 2), (2, 2, 3)]:
        Q = basis.basis_transformation_Q_J(J, d_in, d_out)
        a, b, c = rng.uniform(-np.pi, np.pi, 3)
        K = np.kron(wigner.irr_repr(d_in, a, b, c), wigner.irr_repr(d_out, a, b, c))
        DJ = wigner.irr_repr(J, a, b, c)
        np.testing.assert_allclose(K @ Q, Q @ DJ, atol=1e-8)


def test_basis_count_and_shapes(rng):
    max_degree = 2
    rel = rng.standard_normal((7, 3))
    out = basis.get_basis(rel, max_degree)
    assert len(out) == basis.num_basis_entries(max_degree)
    for d_in in range(max_degree + 1):
        for d_out in range(max_degree + 1):
            n_freq = min(d_in, d_out) * 2 + 1
            assert out[f"{d_in},{d_out}"].shape == (7, 2 * d_out + 1, 2 * d_in + 1, n_freq)


def test_basis_kernel_equivariance(rng):
    """K(R r) = D_out(R) K(r) D_in(R)ᵀ — full kernel equivariance."""
    d_in, d_out = 1, 1
    rel = rng.standard_normal((5, 3))
    a, b, c = 0.4, 0.8, -0.3
    R = wigner.rot(a, b, c)
    K1 = basis.get_basis(rel, 1)[f"{d_in},{d_out}"]
    K2 = basis.get_basis(rel @ R.T, 1)[f"{d_in},{d_out}"]
    D_in = wigner.irr_repr(d_in, a, b, c)
    D_out = wigner.irr_repr(d_out, a, b, c)
    for f in range(K1.shape[-1]):
        expect = np.einsum("ij,njk,lk->nil", D_out, K1[..., f], D_in)
        np.testing.assert_allclose(K2[..., f], expect, atol=1e-8)
