"""Native max-clique tests: exact C++ solver vs brute force; JAX heuristic;
consistency-graph pruning end-to-end."""
import itertools

import numpy as np
import pytest

from se3_equi_graph_registration_tpu.native import max_clique as mc


def _brute_force_clique(ei, ej, n):
    adj = np.zeros((n, n), bool)
    adj[ei, ej] = True
    adj[ej, ei] = True
    best = []
    for r in range(n, 0, -1):
        for comb in itertools.combinations(range(n), r):
            if all(adj[a, b] for a, b in itertools.combinations(comb, 2)):
                return list(comb)
    return best


def test_build_and_simple_triangle():
    ei = np.array([0, 1, 0, 2], np.int32)
    ej = np.array([1, 2, 2, 3], np.int32)
    clique = mc.max_clique(ei, ej, 4)
    assert sorted(clique) == [0, 1, 2]


def test_exact_vs_bruteforce_random(rng):
    for trial in range(5):
        n = 14
        p = 0.45
        adj = rng.uniform(size=(n, n)) < p
        adj = np.triu(adj, 1)
        ei, ej = np.nonzero(adj)
        got = mc.max_clique(ei.astype(np.int32), ej.astype(np.int32), n)
        want = _brute_force_clique(ei, ej, n)
        assert len(got) == len(want), f"trial {trial}"
        # verify got is actually a clique
        full = adj | adj.T
        for a, b in itertools.combinations(sorted(got), 2):
            assert full[a, b]


def test_pmc_reference_entrypoint(rng):
    ei = np.array([0, 0, 1], np.int32)
    ej = np.array([1, 2, 2], np.int32)
    clique = mc.pmc(ei, ej, 3, 3)
    assert sorted(clique) == [0, 1, 2]


def test_consistency_graph_prunes_outliers(rng):
    """Planted rigid inliers form the max clique of the consistency graph."""
    n_in, n_out = 12, 8
    src_in = rng.standard_normal((n_in, 3))
    from se3_equi_graph_registration_tpu.data.synthetic import random_rotation
    R = random_rotation(rng)
    t = rng.standard_normal(3)
    tgt_in = src_in @ R.T + t
    src_out = rng.standard_normal((n_out, 3))
    tgt_out = rng.standard_normal((n_out, 3)) * 3.0

    src = np.concatenate([src_in, src_out])
    tgt = np.concatenate([tgt_in, tgt_out])
    ei, ej = mc.consistency_graph(src, tgt, tau=0.05)
    clique = mc.max_clique(ei, ej, len(src))
    assert set(clique) >= set(range(n_in)) - set(clique) or len(clique) >= n_in
    assert all(c < n_in for c in clique) or len([c for c in clique if c < n_in]) >= n_in - 1


def test_jax_heuristic_finds_planted_clique(rng):
    import jax.numpy as jnp
    n, k = 32, 10
    adj = np.zeros((n, n), np.float32)
    members = rng.choice(n, k, replace=False)
    for a, b in itertools.combinations(members, 2):
        adj[a, b] = adj[b, a] = 1.0
    # sprinkle noise edges
    for _ in range(20):
        a, b = rng.integers(0, n, 2)
        if a != b:
            adj[a, b] = adj[b, a] = 1.0
    mask = np.asarray(mc.max_clique_heuristic_jax(jnp.asarray(adj), iters=n))
    chosen = np.flatnonzero(mask)
    # heuristic should keep a mutually-consistent set dominated by the plant
    assert len(chosen) >= 3
    sub = adj[np.ix_(chosen, chosen)]
    np.testing.assert_allclose(sub + np.eye(len(chosen)),
                               np.ones((len(chosen), len(chosen))), atol=0)
