"""Benchmark: registered pairs/second at 2048 correspondences (k=16, 3-layer
EGNN, weighted-Kabsch head) — the BASELINE.json headline metric.

Measures the FULL device pipeline per pair: k-NN graph construction for both
clouds + shared EGNN forward on both + top-k scoring + weighted-Kabsch SVD,
jitted as one program. Sweeps batch size for best steady-state throughput on
whatever accelerator JAX exposes (the driver runs this on one real TPU chip).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N/1000}
vs_baseline divides by the BASELINE.json target (>= 1000 pairs/s on a v5e-8),
measured here on a SINGLE chip — i.e. vs_baseline >= 1.0 beats the 8-chip
target on one chip.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench(batch_sizes=(16, 32, 64), n=2048, k=16, c=32, iters=20, warmup=3,
          verbose=False, profile_dir=None):
    import contextlib

    import jax

    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    from se3_equi_graph_registration_tpu.train import engine

    import jax.numpy as jnp

    # the production fast path: fused Pallas EGNN, approx k-selection,
    # quaternion Kabsch (checkpoint-parity eval uses the exact/svd knobs)
    cfg = engine.fast_tpu_config(num_nodes=n, k=k, in_node_nf=c, hidden_nf=32,
                                 top_k=128)
    model = engine.build_model(cfg)

    # Timing methodology: each iteration depends on the previous one through
    # `carry`, and the final scalar is fetched to host. On remote/async
    # runtimes block_until_ready can return at dispatch-ack — only a host
    # fetch of a value that transitively depends on every iteration proves
    # the device actually executed the work.
    @jax.jit
    def forward_chain(params, batch, carry):
        b2 = dict(batch)
        b2["src_pts"] = batch["src_pts"] + carry * 1e-9
        out = engine._apply_with_graphs(model, cfg, params, b2)
        return jnp.sum(out.t) + jnp.sum(out.R)

    best = 0.0
    best_b = None
    rng = np.random.default_rng(0)
    params = None
    for b in batch_sizes:
        pb = make_pair_batch(rng, batch=b, n=n, feat_dim=c)
        batch = engine.batch_to_device(
            (pb.corr, pb.labels, pb.src_pts, pb.tgt_pts, pb.src_feat,
             pb.tgt_feat, pb.gt_pose))
        batch = jax.device_put(batch)
        if params is None:
            params = jax.jit(model.init)(
                jax.random.PRNGKey(0), batch["src_feat"], batch["src_pts"],
                np.zeros((b, n, k), np.int32), batch["tgt_feat"],
                batch["tgt_pts"], np.zeros((b, n, k), np.int32),
                batch["labels"])
        carry = jnp.zeros(())
        for _ in range(warmup):
            carry = forward_chain(params, batch, carry)
        float(carry)
        trace_ctx = (jax.profiler.trace(profile_dir) if profile_dir
                     else contextlib.nullcontext())
        t0 = time.perf_counter()
        with trace_ctx:
            for _ in range(iters):
                carry = forward_chain(params, batch, carry)
            float(carry)  # host fetch forces the whole chain
        dt = (time.perf_counter() - t0) / iters
        pps = b / dt
        if verbose:
            print(f"  batch {b}: {dt * 1e3:.2f} ms -> {pps:.0f} pairs/s",
                  file=sys.stderr)
        if pps > best:
            best, best_b = pps, b
    return best, best_b


def bench_train(batch_sizes=(16, 64), n=2048, k=16, c=32, iters=20,
                verbose=False, profile_dir=None):
    """Full training step (graphs + forward + loss + backward + Adam)."""
    import contextlib

    import jax

    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    from se3_equi_graph_registration_tpu.train import engine

    best, best_b = 0.0, None
    for b in batch_sizes:
        rng = np.random.default_rng(0)
        pb = make_pair_batch(rng, batch=b, n=n, feat_dim=c)
        batch = engine.batch_to_device(
            (pb.corr, pb.labels, pb.src_pts, pb.tgt_pts, pb.src_feat,
             pb.tgt_feat, pb.gt_pose))
        cfg = engine.fast_tpu_config(num_nodes=n, k=k, in_node_nf=c,
                                     hidden_nf=32, top_k=128)
        model = engine.build_model(cfg)
        opt = engine.build_optimizer(cfg)
        state = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0), batch)
        step = engine.make_train_step(model, opt, cfg)
        for _ in range(3):
            state, m = step(state, batch)
        float(m["total"])  # host fetch — the step chains through `state`
        trace_ctx = (jax.profiler.trace(profile_dir) if profile_dir
                     else contextlib.nullcontext())
        t0 = time.perf_counter()
        with trace_ctx:
            for _ in range(iters):
                state, m = step(state, batch)
            float(m["total"])
        dt = (time.perf_counter() - t0) / iters
        if verbose:
            print(f"  train batch {b}: {dt * 1e3:.2f} ms -> {b / dt:.0f} "
                  f"pairs/s", file=sys.stderr)
        if b / dt > best:
            best, best_b = b / dt, b
    return best, best_b


def bench_global(batch_sizes=(1, 8, 32), n=2048, iters=20, verbose=False,
                 knn_method="approx", window=512, knn_packed=False,
                 ransac_branches=1):
    """Checkpoint-free global registration (registration._register_core,
    vmapped over the pair axis): FPFH + mutual matching + RANSAC + IRLS +
    trimmed plane ICP, one jitted program. knn_method='window' swaps the
    [N, N] candidate set for Hilbert windows (no [B, N, N] buffer at all —
    the reason batching pairs helps THERE and hurts the approx path)."""
    import jax
    import jax.numpy as jnp

    from se3_equi_graph_registration_tpu import registration as reg

    kw = dict(k_normals=30, k_fpfh=60, top_m=min(512, n), sigma=0.09,
              spectral_iters=12, refine_iters=5, icp_iters=10,
              icp_mode="plane", icp_tau=0.0, icp_trim=0.0,
              icp_voxels=(), coarse="ransac", hypotheses=512,
              knn_method=knn_method, window=window, knn_packed=knn_packed,
              ransac_branches=ransac_branches)

    best, best_b = 0.0, None
    rng = np.random.default_rng(0)
    for b in batch_sizes:
        src = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
        src[..., 2] = 0.3 * np.sin(2 * src[..., 0]) * np.cos(2 * src[..., 1])
        perm = rng.permutation(n)
        tgt = (src[:, perm]
               + rng.standard_normal((b, n, 3)).astype(np.float32) * 0.002)
        keys = jax.random.split(jax.random.PRNGKey(0), b)

        @jax.jit
        def chain(s, t, ks, carry):
            R, tr, _, _ = jax.vmap(
                lambda s1, t1, k1: reg._register_core(s1, t1, k1, **kw))(
                s + carry * 1e-9, t, ks)
            return jnp.sum(R) + jnp.sum(tr)

        s, t = jnp.asarray(src), jnp.asarray(tgt)
        carry = jnp.zeros(())
        for _ in range(3):
            carry = chain(s, t, keys, carry)
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = chain(s, t, keys, carry)
        float(carry)
        dt = (time.perf_counter() - t0) / iters
        if verbose:
            print(f"  global-reg n={n} b={b}: {dt * 1e3:.2f} ms "
                  f"-> {b / dt:.2f} pairs/s", file=sys.stderr)
        if b / dt > best:
            best, best_b = b / dt, b
    return best, best_b


def bench_global_stages(b=1, n=2048, iters=20, knn_method="approx",
                        solver="quaternion", window=512, knn_packed=False):
    """Per-stage attribution of the checkpoint-free global-registration
    pipeline (VERDICT r3 weak #1), by CUMULATIVE PREFIX: the pipeline is
    truncated after each stage and timed whole (carry-chained), so each
    marginal is the stage's true serialized cost inside the fused program —
    isolated-stage timings overstate it (XLA CSEs the shared [N, N]
    distance work and overlaps independent stages; measured sum-of-isolated
    was 20 ms against a 9.3 ms fused total). Prints a table to stderr and
    returns {stage: cumulative_ms}."""
    import jax
    import jax.numpy as jnp

    from se3_equi_graph_registration_tpu import registration as reg
    from se3_equi_graph_registration_tpu.ops import fpfh as fpfh_lib
    from se3_equi_graph_registration_tpu.ops.icp import (icp_refine,
                                                         nearest_neighbor)
    from se3_equi_graph_registration_tpu.ops.kabsch import (kabsch_irls,
                                                            pose_covariance)
    from se3_equi_graph_registration_tpu.ops.knn import knn_graph
    from se3_equi_graph_registration_tpu.ops.ransac import ransac_pose

    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    src[..., 2] = 0.3 * np.sin(2 * src[..., 0]) * np.cos(2 * src[..., 1])
    perm = rng.permutation(n)
    tgt = (src[:, perm]
           + rng.standard_normal((b, n, 3)).astype(np.float32) * 0.002)
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    s, t = jnp.asarray(src), jnp.asarray(tgt)
    m_top = min(512, n)

    def prefix(stage):
        def core(x, y, key):
            window_tile = None
            if knn_method in ("window", "fused"):
                from se3_equi_graph_registration_tpu.ops.morton import (
                    knn_graph_window, sort_by_curve)
                win = min(window, n)
                empty = jnp.zeros((n, 0), x.dtype)
                _, x, _ = sort_by_curve(empty, x)
                _, y, _ = sort_by_curve(empty, y)
                if knn_method == "fused":
                    from se3_equi_graph_registration_tpu.ops.pallas.knn_kernel import knn_pallas
                    interp = jax.default_backend() != "tpu"
                    pk = dict(packed=bool(knn_packed),
                              chunked=knn_packed == "chunked")
                    nbr_s = knn_pallas(x, min(60, n), tile_t=128, window=win,
                                       interpret=interp, **pk)
                    nbr_t = knn_pallas(y, min(60, n), tile_t=128, window=win,
                                       interpret=interp, **pk)
                else:
                    nbr_s = knn_graph_window(x, min(60, n), window=win)
                    nbr_t = knn_graph_window(y, min(60, n), window=win)
                window_tile = (128, win)
            else:
                nbr_s = knn_graph(x, min(60, n), method=knn_method)
                nbr_t = knn_graph(y, min(60, n), method=knn_method)
            if stage == "knn":
                return (nbr_s + nbr_t).astype(jnp.float32),
            if knn_method == "fused":
                from se3_equi_graph_registration_tpu.ops.pallas.spfh_kernel import spfh_pallas
                n_s = fpfh_lib.estimate_normals_window(x, nbr_s[:, :30],
                                                       128, win)
                n_t = fpfh_lib.estimate_normals_window(y, nbr_t[:, :30],
                                                       128, win)
                if stage == "normals":
                    return n_s + n_t,
                s_s, d_s = spfh_pallas(x, n_s, nbr_s, win, tile_t=128,
                                       interpret=interp)
                s_t, d_t = spfh_pallas(y, n_t, nbr_t, win, tile_t=128,
                                       interpret=interp)
                f_s = fpfh_lib.fpfh_from_spfh(s_s, nbr_s, d_s, 128, win)
                f_t = fpfh_lib.fpfh_from_spfh(s_t, nbr_t, d_t, 128, win)
            else:
                n_s = fpfh_lib.estimate_normals(x, orient="local",
                                                nbr=nbr_s[:, :30])
                n_t = fpfh_lib.estimate_normals(y, orient="local",
                                                nbr=nbr_t[:, :30])
                if stage == "normals":
                    return n_s + n_t,
                f_s = fpfh_lib.fpfh(x, n_s, nbr=nbr_s,
                                    window_tile=window_tile)
                f_t = fpfh_lib.fpfh(y, n_t, nbr=nbr_t,
                                    window_tile=window_tile)
            if stage == "fpfh":
                return f_s + f_t,
            j, mutual, dist = reg.match_features(f_s, f_t)
            t_corr = y[j]
            scores = mutual.astype(jnp.float32) / (1.0 + dist)
            if stage == "match":
                return t_corr * scores[:, None],
            R, tr, w = ransac_pose(x, t_corr, scores, key, top_m=m_top,
                                   hypotheses=512, inlier_tau=0.09,
                                   solver=solver)
            if stage == "ransac":
                return R, tr
            R, tr, w = kabsch_irls(x, t_corr, w, iters=5, solver=solver)
            if stage == "irls":
                return R, tr
            R_, t_, w_ = icp_refine(x[None], y[None], R[None], tr[None],
                                    iters=10, mode="plane",
                                    tgt_normals=n_t[None], solver=solver)
            R, tr, w = R_[0], t_[0], w_[0]
            posed = x @ R.T + tr
            nn, _ = nearest_neighbor(posed, y)
            return R, tr, pose_covariance(x, y[nn], R, tr, w)

        @jax.jit
        def chain(carry):
            outs = jax.vmap(core)(s + carry * 1e-9, t, keys)
            return sum(jnp.sum(o) for o in outs)
        return chain

    stages = ["knn", "normals", "fpfh", "match", "ransac", "irls", "full"]
    chains = {st: prefix(st) for st in stages}
    best = {st: 1e9 for st in stages}
    for c in chains.values():               # warm all before timing any
        carry = jnp.zeros(())
        for _ in range(3):
            carry = c(carry)
        float(carry)
    for _ in range(4):                      # interleaved min-of-4
        for st, c in chains.items():
            carry = jnp.zeros(())
            tt = time.perf_counter()
            for _ in range(iters):
                carry = c(carry)
            float(carry)
            best[st] = min(best[st], (time.perf_counter() - tt) / iters * 1e3)
    prev = 0.0
    for st in stages:
        print(f"  {st:<8s} cum {best[st]:7.2f} ms   marginal "
              f"{best[st] - prev:+6.2f} ms", file=sys.stderr)
        prev = best[st]
    print(f"  full: {b / best['full'] * 1e3:.1f} pairs/s "
          f"(b={b}, n={n}, knn={knn_method}, solver={solver})",
          file=sys.stderr)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="+", default=None,
                    help="batch sizes to sweep; per-mode defaults: "
                         "inference 16/32/64, train 16/64, global-reg "
                         "1/8/32 (its FPFH stage holds [B, N, N] buffers)")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the TRAINING step instead of inference")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="wrap the timed loop in jax.profiler.trace(DIR)")
    ap.add_argument("--global-reg", action="store_true",
                    help="benchmark checkpoint-free global registration "
                         "(FPFH + RANSAC + IRLS + plane ICP)")
    ap.add_argument("--stages", action="store_true",
                    help="with --global-reg: per-stage attribution table "
                         "(stderr) + JSON ms dict (stdout)")
    ap.add_argument("--knn", default="approx",
                    choices=("approx", "exact", "window", "fused"),
                    help="with --global-reg: descriptor-stage k-NN method "
                         "(registration.register_fpfh knn_method)")
    ap.add_argument("--window", type=int, default=512,
                    help="with --global-reg --knn window/fused: Hilbert "
                         "window width (multiple of 128)")
    ap.add_argument("--knn-packed", nargs="?", const=True, default=False,
                    type=lambda v: v if v == "chunked" else bool(v),
                    help="with --global-reg --knn fused: packed int32 "
                         "(distance, lane) extraction keys in the k-NN "
                         "kernel (window <= 1024); pass 'chunked' for the "
                         "two-level interleaved-chunk extraction")
    ap.add_argument("--branches", type=int, default=1,
                    help="with --global-reg: verified multi-branch RANSAC "
                         "(registration ransac_branches)")
    ap.add_argument("--solver", default="quaternion",
                    choices=("quaternion", "svd"),
                    help="with --global-reg --stages: Kabsch solver for "
                         "the robust stack")
    ap.add_argument("--no-extras", action="store_true",
                    help="default mode: skip the train/global-reg extra "
                         "fields (primary inference metric only)")
    args = ap.parse_args()

    if args.global_reg and args.stages:
        res = bench_global_stages(b=(args.batches or [1])[0], n=args.n,
                                  iters=args.iters, knn_method=args.knn,
                                  solver=args.solver, window=args.window,
                                  knn_packed=args.knn_packed)
        print(json.dumps({k: round(v, 3) for k, v in res.items()}))
        return
    if args.global_reg:
        value, _ = bench_global(batch_sizes=tuple(args.batches or (1, 8, 32)),
                                n=args.n, iters=args.iters,
                                verbose=args.verbose, knn_method=args.knn,
                                window=args.window,
                                knn_packed=args.knn_packed,
                                ransac_branches=args.branches)
        print(json.dumps({
            "metric": f"global_registration_pairs_per_sec_{args.n}pts_single_chip",
            "value": round(value, 2),
            "unit": "pairs/s",
            "vs_baseline": round(value / 1000.0, 4),
        }))
        return
    if args.train:
        value, best_b = bench_train(batch_sizes=tuple(args.batches or (16, 64)),
                                    n=args.n, k=args.k, iters=args.iters,
                                    verbose=args.verbose,
                                    profile_dir=args.profile)
        print(json.dumps({
            "metric": f"training_pairs_per_sec_{args.n}pts_single_chip",
            "value": round(value, 1),
            "unit": "pairs/s",
            "vs_baseline": round(value / 1000.0, 3),
        }))
        return
    value, best_b = bench(batch_sizes=tuple(args.batches or (16, 32, 64)),
                          n=args.n, k=args.k,
                          iters=args.iters, verbose=args.verbose,
                          profile_dir=args.profile)
    target = 1000.0  # BASELINE.json: >=1000 pairs/s @ 2048 pts on v5e-8
    out = {
        "metric": f"registration_pairs_per_sec_{args.n}pts_single_chip",
        "value": round(value, 1),
        "unit": "pairs/s",
        "vs_baseline": round(value / target, 3),
    }
    # Regression-guard the OTHER two headline paths in the same driver
    # artifact (VERDICT r4 weak #7): full training step and the
    # checkpoint-free global-registration pipeline, each at its best-known
    # knobs (BASELINE.md). Extra fields only — the primary metric/value pair
    # stays what the driver's parser expects. --no-extras skips them.
    if not args.no_extras:
        train_v, _ = bench_train(batch_sizes=(64,), n=args.n, k=args.k,
                                 iters=args.iters, verbose=args.verbose)
        out["train_pairs_per_sec"] = round(train_v, 1)
        # shipped defaults (fused+packed descriptor kernels, verified
        # 4-branch RANSAC) and the branches=1 speed mode — the robust
        # default trades ~23% for the measured 20-seed low-overlap wins
        # (BASELINE.md scenario table)
        glob_v, _ = bench_global(batch_sizes=(1,), n=args.n,
                                 iters=args.iters, verbose=args.verbose,
                                 knn_method="fused", window=768,
                                 knn_packed="chunked", ransac_branches=4)
        out["global_reg_pairs_per_sec"] = round(glob_v, 2)
        glob_s, _ = bench_global(batch_sizes=(1,), n=args.n,
                                 iters=args.iters, verbose=args.verbose,
                                 knn_method="fused", window=768,
                                 knn_packed="chunked", ransac_branches=1)
        out["global_reg_speed_mode_pairs_per_sec"] = round(glob_s, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
