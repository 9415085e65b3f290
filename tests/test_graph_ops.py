"""Tests for k-NN graph construction, segment ops, and edge geometry."""
import jax
import jax.numpy as jnp
import numpy as np

from se3_equi_graph_registration_tpu.ops import edge_geometry, knn, segment


def _brute_knn(x: np.ndarray, k: int, include_self=True) -> np.ndarray:
    d = np.linalg.norm(x[:, None] - x[None], axis=-1)
    if not include_self:
        np.fill_diagonal(d, np.inf)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def test_knn_matches_bruteforce(rng):
    x = rng.standard_normal((256, 3)).astype(np.float32)
    k = 16
    got = np.asarray(knn.knn_graph(jnp.asarray(x), k))
    want = _brute_knn(x, k)
    # compare as sets per row (tie order may differ)
    for i in range(x.shape[0]):
        assert set(got[i]) == set(want[i]), f"row {i}"
    # self-loop included: each row contains its own index
    assert all(i in got[i] for i in range(x.shape[0]))


def test_knn_no_self(rng):
    x = rng.standard_normal((128, 3)).astype(np.float32)
    got = np.asarray(knn.knn_graph(jnp.asarray(x), 8, include_self=False))
    assert not any(i in got[i] for i in range(x.shape[0]))


def test_knn_tiled_equals_dense(rng):
    x = rng.standard_normal((512, 3)).astype(np.float32)
    dense = np.asarray(knn.knn_graph(jnp.asarray(x), 12))
    tiled = np.asarray(knn.knn_tiled(jnp.asarray(x), 12, tile=128))
    for i in range(x.shape[0]):
        assert set(dense[i]) == set(tiled[i])


def test_knn_batched_vmap(rng):
    x = rng.standard_normal((4, 128, 3)).astype(np.float32)
    got = np.asarray(jax.vmap(lambda xx: knn.knn_graph(xx, 8))(jnp.asarray(x)))
    for b in range(4):
        want = _brute_knn(x[b], 8)
        for i in range(128):
            assert set(got[b, i]) == set(want[i])


def test_segment_sum_matches_scatter(rng):
    data = rng.standard_normal((100, 7)).astype(np.float32)
    ids = rng.integers(0, 20, size=100)
    got = np.asarray(segment.segment_sum(jnp.asarray(data), jnp.asarray(ids), 20))
    want = np.zeros((20, 7), np.float32)
    np.add.at(want, ids, data)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_segment_mean_empty_segments(rng):
    data = np.ones((4, 2), np.float32)
    ids = np.array([0, 0, 3, 3])
    got = np.asarray(segment.segment_mean(jnp.asarray(data), jnp.asarray(ids), 5))
    np.testing.assert_allclose(got[0], [1, 1])
    np.testing.assert_allclose(got[1], [0, 0])  # empty → 0, no NaN
    np.testing.assert_allclose(got[3], [1, 1])


def test_kregular_sum_equals_segment_sum(rng):
    n, k, c = 32, 4, 5
    msgs = rng.standard_normal((1, n, k, c)).astype(np.float32)
    got = np.asarray(segment.kregular_sum(jnp.asarray(msgs)))[0]
    want = msgs[0].sum(axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_kregular_sum_mask(rng):
    msgs = np.ones((1, 3, 4, 2), np.float32)
    mask = np.zeros((1, 3, 4), np.float32)
    mask[0, :, :2] = 1
    got = np.asarray(segment.kregular_sum(jnp.asarray(msgs), jnp.asarray(mask)))
    np.testing.assert_allclose(got, np.full((1, 3, 2), 2.0))


def test_edge_geometry_values(rng):
    x = rng.standard_normal((1, 16, 3)).astype(np.float32)
    nbr = np.asarray(knn.knn_graph(jnp.asarray(x[0]), 4))[None]
    geom = edge_geometry.edge_geometry(jnp.asarray(x), jnp.asarray(nbr))
    xi = x[0][:, None, :]
    xj = x[0][nbr[0]]
    rel = xi - xj
    np.testing.assert_allclose(np.asarray(geom.rel)[0], rel, atol=1e-6)
    np.testing.assert_allclose(np.asarray(geom.radial)[0, ..., 0],
                               (rel ** 2).sum(-1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(geom.dot)[0, ..., 0],
                               (xi * xj).sum(-1), atol=1e-5)


def test_so3_frame_orthonormal_and_degenerate(rng):
    x = rng.standard_normal((1, 32, 3)).astype(np.float32)
    nbr = np.asarray(knn.knn_graph(jnp.asarray(x[0]), 4))[None]
    geom = edge_geometry.edge_geometry(jnp.asarray(x), jnp.asarray(nbr))
    so3 = np.asarray(geom.so3).reshape(32, 4, 3, 3)
    # self-loop edges (first neighbor) must be identity frames
    self_pos = np.argmax(nbr[0] == np.arange(32)[:, None], axis=1)
    for i in range(32):
        np.testing.assert_allclose(so3[i, self_pos[i]], np.eye(3), atol=1e-6)
    # non-degenerate frames are orthonormal with det +1
    for i in range(0, 32, 7):
        for kk in range(4):
            M = so3[i, kk]
            if np.allclose(M, np.eye(3)):
                continue
            np.testing.assert_allclose(M.T @ M, np.eye(3), atol=1e-4)
            assert np.linalg.det(M) > 0.99


def test_edge_geometry_direction_swap(rng):
    x = rng.standard_normal((1, 16, 3)).astype(np.float32)
    nbr = np.asarray(knn.knn_graph(jnp.asarray(x[0]), 4))[None]
    g_center = edge_geometry.edge_geometry(jnp.asarray(x), jnp.asarray(nbr), "center")
    g_cluster = edge_geometry.edge_geometry(jnp.asarray(x), jnp.asarray(nbr), "cluster")
    np.testing.assert_allclose(np.asarray(g_center.rel),
                               -np.asarray(g_cluster.rel), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_center.dot),
                               np.asarray(g_cluster.dot), atol=1e-5)


def test_nbr_to_edge_list_conventions():
    nbr = jnp.asarray([[1, 2], [0, 2], [0, 1]], jnp.int32)
    row, col = knn.nbr_to_edge_list(nbr, "center")
    np.testing.assert_array_equal(np.asarray(row), [0, 0, 1, 1, 2, 2])
    np.testing.assert_array_equal(np.asarray(col), [1, 2, 0, 2, 0, 1])
    row2, col2 = knn.nbr_to_edge_list(nbr, "cluster")
    np.testing.assert_array_equal(np.asarray(row2), np.asarray(col))
    np.testing.assert_array_equal(np.asarray(col2), np.asarray(row))


def test_morton_window_graph_invariants(rng):
    """Curve perm is a permutation; window graphs satisfy the kernel's window
    invariant, include self-loops, and keep >=80% of true k-NN edges."""
    from se3_equi_graph_registration_tpu.ops import morton

    x = jnp.asarray(rng.standard_normal((1024, 3)), jnp.float32)
    for curve in ("morton", "hilbert"):
        perm = np.asarray(morton.morton_perm(x, curve=curve))
        assert sorted(perm.tolist()) == list(range(1024))

    xs = jnp.asarray(np.asarray(x)[np.asarray(morton.morton_perm(x))])
    k, tile, window = 16, 128, 384
    nbr = np.asarray(morton.knn_graph_window(xs, k, tile, window))
    starts = np.asarray(morton.window_starts(1024, tile, window))
    blocks = nbr.reshape(-1, tile, k)
    for i, s in enumerate(starts):
        assert blocks[i].min() >= s and blocks[i].max() < s + window
    assert all(i in set(nbr[i]) for i in range(1024))      # self-loops

    recall = morton.window_recall(x, k, tile, window)
    assert recall >= 0.80, recall
    # hilbert should not be worse than morton on this cloud
    assert recall >= morton.window_recall(x, k, tile, window, curve="morton") - 0.02

    # calibrate_window returns the smallest candidate meeting the target,
    # with its measured recall; an unreachable target returns the largest
    w_sel, r_sel = morton.calibrate_window(x, k, target_recall=0.80,
                                           tile=tile,
                                           candidates=(128, 256, 384))
    assert w_sel in (128, 256, 384) and r_sel >= 0.80
    assert morton.calibrate_window(x, k, target_recall=2.0, tile=tile,
                                   candidates=(128, 256))[0] == 256
    # a window covering the whole cloud is exact by construction
    assert morton.calibrate_window(x, k, tile=tile,
                                   candidates=(2048,)) == (2048, 1.0)


def test_morton_batched_perm(rng):
    from se3_equi_graph_registration_tpu.ops import morton

    x = jnp.asarray(rng.standard_normal((3, 256, 3)), jnp.float32)
    perm = np.asarray(morton.morton_perm(x))
    assert perm.shape == (3, 256)
    for b in range(3):
        assert sorted(perm[b].tolist()) == list(range(256))


def test_sort_by_curve_matches_argsort_gather(rng):
    """The fused key-value sort (morton.sort_by_curve) is bit-identical to
    the argsort+gather formulation it replaces (stable sort, same ties) —
    in BOTH branches: c=8 gathers h by perm, c=2 rides h through the sort
    (total operands <= _MAX_SORT_OPERANDS)."""
    from se3_equi_graph_registration_tpu.ops import morton

    for c in (8, 2):
        b, n = 3, 256
        x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
        h = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        hs, xs, perm = morton.sort_by_curve(h, x, "hilbert")
        want_perm = morton.morton_perm(x, curve="hilbert")
        np.testing.assert_array_equal(np.asarray(perm), np.asarray(want_perm))
        np.testing.assert_array_equal(
            np.asarray(xs), np.take_along_axis(np.asarray(x),
                                               np.asarray(perm)[..., None], 1))
        np.testing.assert_array_equal(
            np.asarray(hs), np.take_along_axis(np.asarray(h),
                                               np.asarray(perm)[..., None], 1))

        # unsort_rows inverts it exactly
        h0, x0 = morton.unsort_rows((hs, xs), perm)
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h))
        np.testing.assert_array_equal(np.asarray(x0), np.asarray(x))


def test_sort_unsort_gradients_match_autodiff(rng):
    """Custom VJPs of sort_by_curve/unsort_rows equal plain take_along_axis
    autodiff (the permutation is locally constant in both formulations)."""
    from se3_equi_graph_registration_tpu.ops import morton

    b, n, c = 2, 128, 4
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    wx = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    perm = morton.morton_perm(x, curve="hilbert")

    def f_new(h, x):
        hs, xs, p = morton.sort_by_curve(h, x, "hilbert")
        ho, xo = morton.unsort_rows((hs * 2.0, xs * 3.0), p)
        return jnp.sum(ho * wh) + jnp.sum(xo * wx)

    def f_ref(h, x):
        p = perm  # same permutation, fixed (no grad through ordering)
        hs = jnp.take_along_axis(h, p[..., None], axis=1)
        xs = jnp.take_along_axis(x, p[..., None], axis=1)
        inv = jnp.argsort(p, axis=-1)
        ho = jnp.take_along_axis(hs * 2.0, inv[..., None], axis=1)
        xo = jnp.take_along_axis(xs * 3.0, inv[..., None], axis=1)
        return jnp.sum(ho * wh) + jnp.sum(xo * wx)

    gh_new, gx_new = jax.grad(f_new, argnums=(0, 1))(h, x)
    gh_ref, gx_ref = jax.grad(f_ref, argnums=(0, 1))(h, x)
    np.testing.assert_allclose(np.asarray(gh_new), np.asarray(gh_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                               atol=1e-6)


def test_sort_by_curve_zero_feature_columns(rng):
    """ADVICE r2: C=0 feature tensors must not crash the ride-the-sort fast
    path (empty jnp.stack); they route to the gather path."""
    import jax.numpy as jnp

    from se3_equi_graph_registration_tpu.ops import morton

    x = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
    h = jnp.zeros((64, 0), jnp.float32)
    hs, xs, perm = morton.sort_by_curve(h, x)
    assert hs.shape == (64, 0)
    import numpy as np
    np.testing.assert_array_equal(
        np.asarray(xs),
        np.asarray(jnp.take_along_axis(x, perm[..., None], axis=-2)))


def test_permute_rows_matmul_semantics(rng):
    """The bf16 one-hot MXU permute (morton.permute_rows_matmul) is an EXACT
    row permutation for bf16-representable values — forward matches
    take_along_axis, invert matches unsort_rows, and the two compose to
    identity. (For general fp32 values it additionally rounds to bf16; the
    engine only applies it to h on the bf16 kernel path.)"""
    from se3_equi_graph_registration_tpu.ops import morton

    b, n, c = 3, 256, 32
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    # bf16-representable features: integers in [-8, 8)
    h = jnp.asarray(rng.integers(-8, 8, (b, n, c)), jnp.float32)
    perm = morton.morton_perm(x, curve="hilbert")

    hs = morton.permute_rows_matmul(h, perm)
    want = jnp.take_along_axis(h, perm[..., None], axis=-2)
    np.testing.assert_array_equal(np.asarray(hs), np.asarray(want))

    # invert=True matches unsort_rows' gather-by-inverse
    (want_u,) = morton.unsort_rows((hs,), perm)
    got_u = morton.permute_rows_matmul(hs, perm, invert=True)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(h))

    # general fp32 values: permutation of the bf16-rounded tensor
    hf = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    got_f = morton.permute_rows_matmul(hf, perm)
    want_f = jnp.take_along_axis(hf.astype(jnp.bfloat16).astype(jnp.float32),
                                 perm[..., None], axis=-2)
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))


def test_permute_rows_matmul_gradients(rng):
    """VJP of the one-hot permute = the transposed permute (scatter-free):
    grads match the take_along_axis formulation on bf16-exact values."""
    from se3_equi_graph_registration_tpu.ops import morton

    b, n, c = 2, 128, 8
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    h = jnp.asarray(rng.integers(-8, 8, (b, n, c)), jnp.float32)
    w = jnp.asarray(rng.integers(-4, 4, (b, n, c)), jnp.float32)
    perm = morton.morton_perm(x, curve="hilbert")

    g_new = jax.grad(
        lambda t: jnp.sum(morton.permute_rows_matmul(t, perm) * w))(h)
    g_ref = jax.grad(
        lambda t: jnp.sum(jnp.take_along_axis(t, perm[..., None], -2) * w))(h)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))

    g_inv = jax.grad(lambda t: jnp.sum(
        morton.permute_rows_matmul(t, perm, invert=True) * w))(h)
    inv = jnp.argsort(perm, axis=-1)
    g_inv_ref = jax.grad(lambda t: jnp.sum(
        jnp.take_along_axis(t, inv[..., None], -2) * w))(h)
    np.testing.assert_array_equal(np.asarray(g_inv), np.asarray(g_inv_ref))


def test_onehot_h_permute_gate():
    """The one-hot MXU h-permute only activates on the fast compiled Pallas
    path AND at N <= 2048 — its [B, N, N] bf16 one-hot is O(N^2), which
    would invalidate the near-linear dense-scaling (8K-32K) path."""
    from se3_equi_graph_registration_tpu.train import engine

    fast = engine.fast_tpu_config(num_nodes=2048)
    assert engine._use_onehot_h_permute(fast, interp=False, n=2048)
    # dense shapes: off
    assert not engine._use_onehot_h_permute(fast, interp=False, n=8192)
    # interpret (CPU) mode keeps full fp32 numerics: off
    assert not engine._use_onehot_h_permute(fast, interp=True, n=2048)
    # accurate mode and the XLA impl never use it
    import dataclasses
    acc = dataclasses.replace(fast, egnn_accurate=True)
    assert not engine._use_onehot_h_permute(acc, interp=False, n=2048)
    xla = dataclasses.replace(fast, egnn_impl="xla")
    assert not engine._use_onehot_h_permute(xla, interp=False, n=2048)
    # and it is opt-in outside the fast config
    assert not engine._use_onehot_h_permute(
        engine.EngineConfig(), interp=False, n=2048)
