"""Exact fused k-NN kernel tests (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from se3_equi_graph_registration_tpu.ops import knn
from se3_equi_graph_registration_tpu.ops.pallas.knn_kernel import knn_pallas


def test_same_neighbor_sets_as_topk(rng):
    x = jnp.asarray(rng.standard_normal((2, 256, 3)), jnp.float32)
    ref = np.asarray(jax.vmap(lambda p: knn.knn_graph(p, 16))(x))
    got = np.asarray(knn_pallas(x, 16, tile_t=128, interpret=True))
    for b in range(2):
        for r in range(256):
            # fp near-ties may permute ORDER; the neighbor SET is exact and
            # aggregation downstream is order-invariant
            assert set(ref[b, r]) == set(got[b, r]), (b, r)


def test_no_self_and_unbatched(rng):
    x = jnp.asarray(rng.standard_normal((128, 3)), jnp.float32)
    got = np.asarray(knn_pallas(x, 8, include_self=False, tile_t=128,
                                interpret=True))
    assert got.shape == (128, 8)
    assert not any(i in got[i] for i in range(128))
    with_self = np.asarray(knn_pallas(x, 8, tile_t=128, interpret=True))
    assert all(i in with_self[i] for i in range(128))


def test_engine_pallas_knn_method(rng):
    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    from se3_equi_graph_registration_tpu.train import engine
    cfg = engine.EngineConfig(num_nodes=64, k=8, in_node_nf=16, top_k=16,
                              knn_method="pallas")
    model = engine.build_model(cfg)
    pb = make_pair_batch(rng, batch=2, n=64, feat_dim=16)
    batch = engine.batch_to_device((pb.corr, pb.labels, pb.src_pts, pb.tgt_pts,
                                    pb.src_feat, pb.tgt_feat, pb.gt_pose))
    opt = engine.build_optimizer(cfg)
    state = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0), batch)
    out = engine._apply_with_graphs(model, cfg, state.params, batch)
    assert np.all(np.isfinite(np.asarray(out.R)))


def test_packed_window_mode_matches_exact_up_to_near_ties(rng):
    """Packed int32 (distance, lane) extraction keys: identical to the exact
    window kernel except for candidates whose d^2 agree within ~2^-13
    relative (the 10 mantissa bits ceded to the lane id)."""
    from se3_equi_graph_registration_tpu.ops import morton

    n, k, tile, window = 512, 16, 128, 256
    x = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    xs = jnp.take_along_axis(x, morton.morton_perm(x)[..., None], axis=0)
    exact = np.asarray(knn_pallas(xs, k, tile_t=tile, window=window,
                                  interpret=True))
    packed = np.asarray(knn_pallas(xs, k, tile_t=tile, window=window,
                                   packed=True, interpret=True))
    xs_np = np.asarray(xs)
    d2 = ((xs_np[:, None] - xs_np[None]) ** 2).sum(-1)
    diff_rows = 0
    for r in range(n):
        se, sp = set(exact[r]), set(packed[r])
        if se == sp:
            continue
        diff_rows += 1
        # every swapped pair must be a near-tie in distance
        only_e, only_p = se - sp, sp - se
        lo = min(d2[r, j] for j in only_e | only_p)
        hi = max(d2[r, j] for j in only_e | only_p)
        assert hi - lo <= 2e-3 * max(hi, 1e-12), (r, lo, hi)
    assert diff_rows <= n * 0.05, f"{diff_rows} rows differ"


def test_chunked_two_level_matches_packed(rng):
    """Two-level interleaved-chunk extraction (chunked=True): same key space
    as packed mode, so the neighbor sets must agree except where one residue
    class mod C holds more than S_pc of the true top-k — require >= 99% row
    agreement and, for disagreeing rows, that the symmetric difference is
    confined to the far tail (every swapped candidate's rank must be within
    the shortlist's blind spot, i.e. beyond the first k/2 neighbors)."""
    from se3_equi_graph_registration_tpu.ops import morton

    n, tile = 512, 128
    x = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    x = x.at[:, 2].multiply(0.2)         # surface-like (the target regime)
    xs = jnp.take_along_axis(x, morton.morton_perm(x)[..., None], axis=0)
    for k, window in ((16, 256), (60, 512)):
        packed = np.asarray(knn_pallas(xs, k, tile_t=tile, window=window,
                                       packed=True, interpret=True))
        chunked = np.asarray(knn_pallas(xs, k, tile_t=tile, window=window,
                                        packed=True, chunked=True,
                                        interpret=True))
        assert chunked.shape == (n, k)
        diff_rows = 0
        for r in range(n):
            sp, sc = set(packed[r]), set(chunked[r])
            if sp == sc:
                # ascending extraction order must match packed exactly when
                # the sets agree (same key space, same global order)
                assert list(packed[r]) == list(chunked[r]), r
                continue
            diff_rows += 1
            swapped = sp ^ sc
            ranks = {int(j): c for c, j in enumerate(packed[r])}
            assert all(ranks.get(int(j), k) >= k // 2 for j in swapped), \
                (r, swapped)
        assert diff_rows <= n * 0.01, f"{diff_rows} rows differ at k={k}"


def test_chunked_register_fpfh_smoke(rng):
    """knn_packed='chunked' flows through register_fpfh end to end."""
    from se3_equi_graph_registration_tpu.registration import register_fpfh

    pts = rng.standard_normal((300, 3)).astype(np.float32)
    pts[:, 2] *= 0.2
    R_, t_, info = register_fpfh(pts, pts.copy(), n_points=256, window=256,
                                 knn_method="fused", knn_packed="chunked",
                                 ransac_branches=1)
    assert np.allclose(R_ @ R_.T, np.eye(3), atol=1e-4)
    assert np.linalg.norm(t_) < 0.05 and np.isfinite(info["weights"]).all()


def test_packed_duplicate_points_tiebreak(rng):
    """Exact-duplicate points: packed keys still pick the lowest window lane
    among true ties (same as the exact kernel's lowest-index rule)."""
    n, k, tile, window = 256, 8, 128, 256
    x = np.zeros((n, 3), np.float32)
    x[: n // 2] = rng.standard_normal((n // 2, 3)).astype(np.float32)
    x[n // 2:] = x[: n // 2]  # every point duplicated
    xs = jnp.asarray(x)
    packed = np.asarray(knn_pallas(xs, k, tile_t=tile, window=window,
                                   packed=True, interpret=True))
    assert packed.shape == (n, k)
    assert np.all(packed >= 0) and np.all(packed < n)
    # self or duplicate (distance 0) must be among the k selected
    for i in range(n):
        dup = (i + n // 2) % n
        assert i in packed[i] or dup in packed[i], i
