"""ops/eig3.smallest_eigvec_sym3: accuracy against numpy eigh across the
degenerate-spectrum zoo, plus finite gradients everywhere (the NaN-safety
invariants of CLAUDE.md applied to the closed-form eigensolver)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se3_equi_graph_registration_tpu.ops.eig3 import smallest_eigvec_sym3


def _check(A, tol):
    """Eigen-residual check: ||A v − λ_min v|| relative to |λ|_max — valid
    even when the smallest eigenpair is degenerate (any vector in the
    eigenspace passes), unlike a direct eigenvector comparison."""
    A = np.asarray(A, np.float64)
    v = np.asarray(jax.jit(smallest_eigvec_sym3)(jnp.asarray(A, jnp.float32)),
                   np.float64)
    assert np.isfinite(v).all()
    unit = np.abs(np.linalg.norm(v, axis=-1) - 1.0)
    assert unit.max() < 1e-5
    w = np.linalg.eigvalsh(A)                           # ascending
    Av = np.einsum("...ab,...b->...a", A, v)
    res = np.linalg.norm(Av - w[..., :1] * v, axis=-1)
    rel = res / np.maximum(np.abs(w).max(axis=-1), 1e-12)
    assert rel.max() < tol, rel.max()


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_random_psd(rng):
    X = rng.standard_normal((2000, 30, 3))
    _check(np.einsum("nka,nkb->nab", X, X), 2e-3)


def test_extreme_scales(rng):
    X = rng.standard_normal((2000, 30, 3))
    A = np.einsum("nka,nkb->nab", X, X)
    _check(A * (10.0 ** rng.uniform(-6, 6, (2000, 1, 1))), 2e-3)


def test_planar_neighborhoods(rng):
    # the common surface case: thin z spread, smallest eigenvalue separated
    X = rng.standard_normal((2000, 30, 3))
    X[..., 2] *= 1e-4
    _check(np.einsum("nka,nkb->nab", X, X), 1e-4)


def test_collinear_rank1(rng):
    # repeated smallest eigenvalue (0, 0): normal ambiguous but must be a
    # valid unit vector orthogonal to the line
    d = rng.standard_normal((2000, 3))
    t = rng.standard_normal((2000, 30))
    X = t[..., None] * d[:, None, :]
    A = np.einsum("nka,nkb->nab", X, X)
    _check(A, 1e-2)
    v = np.asarray(smallest_eigvec_sym3(jnp.asarray(A, jnp.float32)),
                   np.float64)
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    assert np.abs(np.sum(v * dn, axis=-1)).max() < 1e-3


def test_isotropic_and_zero(rng):
    _check(np.eye(3)[None] * rng.uniform(0.1, 10, (100, 1, 1)), 1e-5)
    _check(np.zeros((8, 3, 3)), 1e-5)


def test_near_repeated_smallest(rng):
    # two tiny, nearly-equal eigenvalues: the fp32 cross products leak a
    # dominant-direction component; the polish multiply must remove it
    w = np.stack([np.full(500, 1.0), rng.uniform(1e-7, 1e-5, 500),
                  rng.uniform(1e-7, 1e-5, 500)], -1)
    Q, _ = np.linalg.qr(rng.standard_normal((500, 3, 3)))
    _check(np.einsum("nab,nb,ncb->nac", Q, w, Q), 1e-4)


def test_repeated_largest(rng):
    w = np.stack([np.full(500, 1.0), np.full(500, 1.0),
                  rng.uniform(1e-7, 1e-5, 500)], -1)
    Q, _ = np.linalg.qr(rng.standard_normal((500, 3, 3)))
    _check(np.einsum("nab,nb,ncb->nac", Q, w, Q), 1e-4)


def test_gradients_finite_everywhere(rng):
    X = rng.standard_normal((64, 30, 3))
    A = jnp.asarray(np.einsum("nka,nkb->nab", X, X), jnp.float32)
    g = jax.jit(jax.grad(lambda a: jnp.sum(smallest_eigvec_sym3(a) ** 2)))(A)
    assert bool(jnp.isfinite(g).all())
    # the hard cases: exactly-zero, isotropic, and rank-1 inputs
    for bad in (jnp.zeros((4, 3, 3), jnp.float32),
                jnp.broadcast_to(jnp.eye(3), (4, 3, 3)).astype(jnp.float32),
                jnp.asarray(np.einsum("na,nb->nab",
                                      rng.standard_normal((4, 3)),
                                      np.ones((4, 3))) * 0.0
                            + np.einsum("na,nb->nab", np.ones((4, 3)),
                                        np.ones((4, 3))), jnp.float32)):
        gb = jax.jit(jax.grad(
            lambda a: jnp.sum(smallest_eigvec_sym3(a) ** 2)))(bad)
        assert bool(jnp.isfinite(gb).all())


def test_rotation_equivariance(rng):
    # v(R A Rᵀ) must equal R v(A) up to sign — the property the normal
    # estimator actually relies on
    X = rng.standard_normal((200, 30, 3))
    A = np.einsum("nka,nkb->nab", X, X)
    Q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    v1 = np.asarray(smallest_eigvec_sym3(jnp.asarray(A, jnp.float32)))
    AR = np.einsum("ab,nbc,dc->nad", Q, A, Q)
    v2 = np.asarray(smallest_eigvec_sym3(jnp.asarray(AR, jnp.float32)))
    dots = np.abs(np.sum(v2 * (v1 @ Q.T), axis=-1))
    assert dots.min() > 1.0 - 1e-3
