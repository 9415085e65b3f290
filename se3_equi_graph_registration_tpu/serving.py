"""Production serving API: a warm, jit-cached registration callable.

The reference has no inference API at all — eval is a 1.4k-line script. Here:

    reg = Registrar.from_checkpoint("checkpoint-3dmatch.pth")
    R, t, info = reg.register(src_pts, src_feat, tgt_pts, tgt_feat)

- accepts single pairs [N, ·] or batches [B, N, ·];
- pads/samples to the compiled shape so ONE compiled program serves any input
  size (XLA static shapes without per-request recompiles);
- `fast=True` (default) uses the fused-Pallas / approx-selection / quaternion
  pipeline benchmarked in bench.py; `fast=False` is the checkpoint-parity path;
- `clique_prefilter=True` prunes outlier correspondences with the native
  exact max-clique over the rigid-consistency graph (native/max_clique.py,
  the reference's libpmc capability) before the model runs;
- `info` carries a 6x6 Gauss-Newton pose covariance (ops/kabsch.py);
- `BatchingServer` micro-batches concurrent register() calls from many
  client threads into single device dispatches.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.kabsch import kabsch_irls, pose_covariance
from .train import engine
from .train.checkpoints import convert_reference_checkpoint


class Registrar:
    def __init__(self, params, cfg: engine.EngineConfig,
                 head_mode: str = "eval_fusion", mesh=None,
                 refine_iters: Optional[int] = None,
                 refine_kernel: Optional[str] = None,
                 spectral_topm: Optional[int] = None,
                 icp_iters: Optional[int] = None):
        """`mesh`: optional `jax.sharding.Mesh` with a 'data' axis — the pair
        axis of every register() call is sharded over it (params replicated),
        scaling batch serving across chips with zero per-request collectives
        (each pair is independent; XLA partitions the whole program). Batches
        are padded up to a multiple of the axis size.

        `refine_iters>0` appends IRLS robust refinement (ops/kabsch.py
        kabsch_irls) to the head's pose inside the same jitted program —
        down-weights outlier correspondences by their residuals under the
        current pose; the covariance then reflects the refined weights.

        `spectral_topm>0` first REPLACES the head's Kabsch weights with the
        spectral-matching consistency eigenvector over the top-M scoring
        correspondences (ops/spectral.py) — the global inlier-cluster
        locator for very low inlier ratios, composing with IRLS which then
        polishes locally.

        `icp_iters>0` finishes with point-to-point ICP (ops/icp.py) — 1-NN
        re-association by geometry each iteration, the classic fine-
        registration stage (what reference users run open3d for), refining
        through bad putative correspondences from the robust pose's basin.

        All robustness knobs default to the matching EngineConfig fields, so
        `from_checkpoint(..., spectral_topm=256, refine_iters=5)`
        (or `engine.robust_eval_config()`) flows straight through; explicit
        constructor args override the config."""
        refine_iters = (cfg.refine_iters if refine_iters is None
                        else refine_iters)
        refine_kernel = (cfg.refine_kernel if refine_kernel is None
                         else refine_kernel)
        spectral_topm = (cfg.spectral_topm if spectral_topm is None
                         else spectral_topm)
        icp_iters = cfg.icp_iters if icp_iters is None else icp_iters
        if icp_iters > 0 and cfg.icp_voxels and cfg.icp_voxels[-1]:
            raise ValueError(
                "cfg.icp_voxels must end at 0.0 (raw clouds): the final ICP "
                "weights pair with the raw source points for the pose "
                f"covariance; got {cfg.icp_voxels}")
        self.cfg = cfg
        self.mesh = mesh
        self.model = engine.build_model(cfg, head_mode=head_mode)
        if mesh is not None:
            from .parallel.mesh import replicated
            params = jax.device_put(params, replicated(mesh))
        self.params = params

        def _fwd(p, b):
            out = engine._apply_with_graphs(self.model, cfg, p, b)
            R, t, w = out.R, out.t, out.weights
            if spectral_topm > 0:
                from .ops.kabsch import kabsch_weighted
                from .ops.spectral import spectral_match_weights
                w = spectral_match_weights(
                    b["src_pts"], b["tgt_pts"], w, top_m=spectral_topm,
                    sigma=cfg.spectral_sigma, iters=cfg.spectral_iters)
                R, t = kabsch_weighted(b["src_pts"], b["tgt_pts"], w,
                                       solver=cfg.kabsch_solver)
            if refine_iters > 0:
                R, t, w = kabsch_irls(b["src_pts"], b["tgt_pts"], w,
                                      iters=refine_iters,
                                      kernel=refine_kernel,
                                      solver=cfg.kabsch_solver)
            cov_tgt = b["tgt_pts"]
            if icp_iters > 0:
                from .ops.icp import (icp_refine, icp_refine_multiscale,
                                      nearest_neighbor)
                if cfg.icp_voxels:
                    R, t, w = icp_refine_multiscale(
                        b["src_pts"], b["tgt_pts"], R, t,
                        voxel_sizes=cfg.icp_voxels, iters=icp_iters,
                        tau=cfg.icp_tau, mode=cfg.icp_mode,
                        trim=cfg.icp_trim, solver=cfg.kabsch_solver,
                        prior_weights=w)
                else:
                    R, t, w = icp_refine(b["src_pts"], b["tgt_pts"], R, t,
                                         iters=icp_iters, tau=cfg.icp_tau,
                                         mode=cfg.icp_mode, trim=cfg.icp_trim,
                                         solver=cfg.kabsch_solver,
                                         prior_weights=w)
                # ICP re-associates by geometry: the covariance must pair
                # each source point with its NN target, not the (now stale)
                # putative index-aligned correspondence
                posed = (jnp.einsum("bij,bnj->bni", R, b["src_pts"])
                         + t[:, None, :])
                nn, _ = nearest_neighbor(posed, b["tgt_pts"])
                cov_tgt = jnp.take_along_axis(b["tgt_pts"], nn[..., None],
                                              axis=-2)
            # covariance AND the similarity reduction inside the SAME jitted
            # program — eagerly they cost per-op dispatches on the serving hot
            # path, and returning the full [B, N] similarity would drag a
            # large fetch over the host link (measured: the B=1 compute is
            # ~1.2 ms; every avoidable dispatch/fetch dwarfs it)
            cov = pose_covariance(b["src_pts"], cov_tgt, R, t, w)
            # per-pair similarity mean (a [B] vector): mesh-mode pads the
            # pair axis, so the batch reduction must happen AFTER the host
            # slices the padding off
            return R, t, jnp.mean(out.similarity, axis=-1), cov

        self._apply = jax.jit(_fwd)

    @classmethod
    def from_checkpoint(cls, path: str, fast: bool = True,
                        num_nodes: int = 2048, head_mode: str = "eval_fusion",
                        robust: bool = False, **cfg_overrides) -> "Registrar":
        """`robust=True` selects `engine.robust_eval_config` (sharp fusion
        weighting + spectral reweighting + IRLS — recall at the metric
        ceiling down to 5% inliers, BASELINE.md); otherwise `fast` picks
        between the throughput and checkpoint-parity configs."""
        if robust:
            base = engine.robust_eval_config
        else:
            base = engine.fast_tpu_config if fast else engine.EngineConfig
        cfg = base(num_nodes=num_nodes, **cfg_overrides)
        if path.endswith(".pth"):
            params = convert_reference_checkpoint(
                path, n_layers=cfg.n_layers, num_heads=cfg.num_heads,
                hidden=cfg.hidden_nf)
        else:
            from .train.checkpoints import TrainCheckpointer
            model = engine.build_model(cfg, head_mode=head_mode)
            opt = engine.build_optimizer(cfg)
            dummy = {k: jnp.zeros(v) for k, v in {
                "src_feat": (1, num_nodes, cfg.in_node_nf),
                "src_pts": (1, num_nodes, 3),
                "tgt_feat": (1, num_nodes, cfg.in_node_nf),
                "tgt_pts": (1, num_nodes, 3),
                "labels": (1, num_nodes),
            }.items()}
            template = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0),
                                         dummy)
            restored = TrainCheckpointer(path).restore_latest(template)
            if restored is None:
                raise FileNotFoundError(f"no checkpoint under {path}")
            params = restored[0].params
        return cls(params, cfg, head_mode)

    def export_compiled(self, path: str, batch: int = 1,
                        platforms: Optional[tuple] = None) -> int:
        """AOT-export the jitted forward as a portable serialized program
        (`jax.export` / StableHLO) and write it to `path`; returns the
        artifact size in bytes.

        The artifact captures graph build + EGNN + head + covariance as ONE
        compiler-ready program with static shapes — a deployment story the
        reference (a 1.4k-line eval script that re-traces python every run)
        has no analog for. Weights stay OUTSIDE the artifact and are passed
        at call time, so one artifact serves every fine-tune of the same
        architecture. Always exports the single-device program (abstract
        specs carry no sharding), portable regardless of this Registrar's
        `mesh`. `platforms` pins the target list (e.g. ``("tpu",)``);
        default = the platform exporting. Reload with
        :meth:`load_exported` — no model/config code needed at the
        deployment site, only jax.
        """
        from jax import export as jexport

        n, c = self.cfg.num_nodes, self.cfg.in_node_nf
        p_specs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
            self.params)
        b_specs = {
            "src_pts": jax.ShapeDtypeStruct((batch, n, 3), jnp.float32),
            "src_feat": jax.ShapeDtypeStruct((batch, n, c), jnp.float32),
            "tgt_pts": jax.ShapeDtypeStruct((batch, n, 3), jnp.float32),
            "tgt_feat": jax.ShapeDtypeStruct((batch, n, c), jnp.float32),
            "labels": jax.ShapeDtypeStruct((batch, n), jnp.float32),
        }
        kw = {} if platforms is None else {"platforms": list(platforms)}
        try:
            exp = jexport.export(self._apply, **kw)(p_specs, b_specs)
        except ValueError as e:
            if "custom_call" not in str(e):
                raise
            # the fused-Pallas fast path lowers to a TPU custom call, which
            # export's safety checks flag as non-portable by default; it IS
            # replayable on TPU runtimes of the same libtpu generation
            kw["disabled_checks"] = [
                jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
            exp = jexport.export(self._apply, **kw)(p_specs, b_specs)
        data = exp.serialize()
        with open(path, "wb") as f:
            f.write(data)
        return len(data)

    @staticmethod
    def load_exported(path: str):
        """Load an :meth:`export_compiled` artifact; returns
        ``fn(params, batch) -> (R, t, similarity_mean, pose_covariance)``.
        Only jax is required at the deployment site (no framework code)."""
        from jax import export as jexport

        with open(path, "rb") as f:
            exp = jexport.deserialize(f.read())
        return jax.jit(exp.call)

    def _fit_n(self, arr: np.ndarray, n: int, rng: np.random.Generator):
        """Sample down or pad (with replacement) to the compiled point count."""
        from .data.sampling import fit_to_count
        return fit_to_count(arr, n, rng)

    def _clique_labels(self, src_pts, tgt_pts, tau: float) -> np.ndarray:
        """Exact max-clique inlier mask over the rigid-consistency graph
        (the reference's libpmc pruning step, native/max_clique.py)."""
        from .native.max_clique import consistency_graph, max_clique
        ei, ej = consistency_graph(src_pts, tgt_pts, tau=tau)
        lbl = np.zeros(len(src_pts), np.float32)
        if len(ei):
            lbl[max_clique(ei, ej, len(src_pts))] = 1.0
        if lbl.sum() < 3:   # degenerate clique: fall back to all-inlier
            lbl[:] = 1.0
        return lbl

    def register_raw(self, src_pts, tgt_pts, voxel: float = 0.0,
                     k_normals: int = 30, k_fpfh: int = 60,
                     orient: str = "local", seed: int = 0, **kw):
        """Register two RAW clouds through the LEARNED model.

        Reproduces the reference's OFFLINE preprocessing online and on
        device: FPFH-33 descriptors (ops/fpfh — the KITTI preset's feature
        type, L2-row-normalized like data/kitti.py:40-41) at the compiled
        point count, then putative correspondences by nearest-descriptor
        matching (the model, like the reference's, consumes index-ALIGNED
        correspondence sets built by feature matching —
        data_preprocess/process_kitti.py), then the normal register() path.
        Only meaningful with a 33-feature checkpoint (in_node_nf=33); raises
        otherwise. `orient` defaults to the pose-equivariant 'local' policy;
        pass 'viewpoint' to reproduce the open3d-style convention the KITTI
        archives were built with. For model-free registration of raw clouds
        see `registration.register_fpfh`.
        """
        if self.cfg.in_node_nf != 33:
            raise ValueError(
                "register_raw computes FPFH-33 features; this Registrar's "
                f"model takes in_node_nf={self.cfg.in_node_nf}. Load a "
                "33-feature (KITTI-style) checkpoint, or call register() "
                "with your own descriptors.")
        import jax.numpy as jnp

        from .ops import fpfh as fpfh_lib
        from .registration import match_features

        squeeze = np.asarray(src_pts).ndim == 2
        if squeeze:
            src_pts, tgt_pts = src_pts[None], tgt_pts[None]
        rng = np.random.default_rng(seed)
        n = self.cfg.num_nodes

        def descriptors(cloud):
            p = np.asarray(cloud, np.float32)
            if voxel > 0:
                p = fpfh_lib.voxel_downsample(p, voxel)
            p, _ = self._fit_n(p, n, rng)
            xj = jnp.asarray(p)
            nrm = fpfh_lib.estimate_normals(xj, k=k_normals, orient=orient)
            f = np.asarray(fpfh_lib.fpfh(xj, nrm, k=k_fpfh))
            return p, (f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-6)
                       ).astype(np.float32)

        sp_l, sf_l, tp_l, tf_l = [], [], [], []
        for i in range(len(src_pts)):
            sp, sf = descriptors(src_pts[i])
            tp, tf = descriptors(tgt_pts[i])
            j, _, _ = match_features(jnp.asarray(sf), jnp.asarray(tf))
            j = np.asarray(j)
            sp_l.append(sp)
            sf_l.append(sf)
            tp_l.append(tp[j])       # aligned putative correspondences
            tf_l.append(tf[j])
        R, t, info = self.register(np.stack(sp_l), np.stack(sf_l),
                                   np.stack(tp_l), np.stack(tf_l),
                                   seed=seed, **kw)
        if squeeze:
            def _one(v):
                a = np.asarray(v)
                return a[0] if a.ndim > 0 else a.item()
            return R[0], t[0], {k: _one(v) for k, v in info.items()}
        return R, t, info

    def register(self, src_pts, src_feat, tgt_pts, tgt_feat,
                 labels: Optional[np.ndarray] = None, seed: int = 0,
                 clique_prefilter: bool = False, clique_tau: float = 0.10):
        """Returns (R [B,3,3], t [B,3], info dict). Unbatched inputs accepted.

        info: similarity_mean, pose_covariance [B,6,6] over [δω, δt], and
        (with clique_prefilter) the clique inlier counts.
        """
        squeeze = (not isinstance(src_pts, (list, tuple))
                   and np.asarray(src_pts).ndim == 2)
        if squeeze:
            src_pts, src_feat = src_pts[None], src_feat[None]
            tgt_pts, tgt_feat = tgt_pts[None], tgt_feat[None]
            if labels is not None:
                labels = labels[None]
        if clique_prefilter:
            labels = [self._clique_labels(np.asarray(src_pts[i], np.float32),
                                          np.asarray(tgt_pts[i], np.float32),
                                          clique_tau)
                      for i in range(len(src_pts))]

        n = self.cfg.num_nodes
        rng = np.random.default_rng(seed)
        b = len(src_pts)
        out_s_pts, out_s_feat, out_t_pts, out_t_feat, out_lbl = [], [], [], [], []
        for i in range(b):
            sp, idx = self._fit_n(np.asarray(src_pts[i], np.float32), n, rng)
            tp, _ = (np.asarray(tgt_pts[i], np.float32)[idx], idx) \
                if len(tgt_pts[i]) == len(src_pts[i]) else \
                self._fit_n(np.asarray(tgt_pts[i], np.float32), n, rng)
            out_s_pts.append(sp)
            out_s_feat.append(np.asarray(src_feat[i], np.float32)[idx])
            out_t_pts.append(tp)
            out_t_feat.append(np.asarray(tgt_feat[i], np.float32)[idx]
                              if len(tgt_feat[i]) == len(src_feat[i])
                              else self._fit_n(np.asarray(tgt_feat[i], np.float32), n, rng)[0])
            out_lbl.append(np.asarray(labels[i], np.float32)[idx]
                           if labels is not None else np.ones(n, np.float32))

        batch = {
            "src_pts": np.stack(out_s_pts),
            "src_feat": np.stack(out_s_feat),
            "tgt_pts": np.stack(out_t_pts),
            "tgt_feat": np.stack(out_t_feat),
            "labels": np.stack(out_lbl),
        }
        if self.mesh is not None:
            # pad the pair axis to a multiple of the mesh's data axis (the
            # last pair repeats; padded rows are sliced off below), then
            # shard it — XLA partitions the whole program, no collectives
            from .parallel.mesh import shard_pair_batch
            nd = self.mesh.shape["data"]
            pad = -b % nd
            if pad:
                batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                         for k, v in batch.items()}
            batch = shard_pair_batch(batch, self.mesh)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        # ONE host round trip for all four results (4 separate np.asarray
        # fetches quadruple the link latency)
        R, t, sim, cov = jax.device_get(self._apply(self.params, batch))
        R, t, cov = np.asarray(R)[:b], np.asarray(t)[:b], np.asarray(cov)[:b]
        info = {"similarity_mean": float(np.mean(np.asarray(sim)[:b])),
                "pose_covariance": cov}
        if clique_prefilter:
            info["clique_inliers"] = [int(l.sum()) for l in out_lbl]
        if squeeze:
            info["pose_covariance"] = info["pose_covariance"][0]
            return R[0], t[0], info
        return R, t, info


class BatchingServer:
    """Micro-batching front end: concurrent register() calls from many client
    threads coalesce into single padded device dispatches.

    submit() returns a concurrent.futures.Future resolving to (R, t, info).
    Requests queue until `max_batch` pairs accumulate or `max_wait_ms`
    elapses since the first queued request, then run as ONE Registrar call —
    the standard online-serving pattern the reference (a research script
    pinned at batch 1) cannot express.
    """

    def __init__(self, registrar: Registrar, max_batch: int = 16,
                 max_wait_ms: float = 5.0):
        self.reg = registrar
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def submit(self, src_pts, src_feat, tgt_pts, tgt_feat, **kw) -> Future:
        fut: Future = Future()
        self._q.put((fut, (src_pts, src_feat, tgt_pts, tgt_feat), kw))
        return fut

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def _serve(self):
        import time as _time

        carry = None  # a dequeued request that didn't match the batch's kwargs
        while not self._stop.is_set():
            if carry is not None:
                first, carry = carry, None
            else:
                try:
                    first = self._q.get(timeout=0.05)
                except queue.Empty:
                    continue
            pending = [first]
            # only kwarg-free requests coalesce — options like
            # clique_prefilter/labels/seed must not leak between clients;
            # requests carrying kwargs run as their own dispatch
            t0 = _time.monotonic()
            while (len(pending) < self.max_batch and not first[2]
                   and _time.monotonic() - t0 < self.max_wait):
                try:
                    nxt = self._q.get(timeout=self.max_wait / 4)
                except queue.Empty:
                    continue
                if not nxt[2]:
                    pending.append(nxt)
                else:
                    carry = nxt
                    break
            futs = [p[0] for p in pending]
            try:
                stack = lambda i: [np.asarray(p[1][i]) for p in pending]
                R, t, info = self.reg.register(
                    stack(0), stack(1), stack(2), stack(3), **first[2])
                for j, fut in enumerate(futs):
                    per = {"similarity_mean": info["similarity_mean"],
                           "pose_covariance": info["pose_covariance"][j]}
                    if "clique_inliers" in info:
                        per["clique_inliers"] = info["clique_inliers"][j]
                    fut.set_result((R[j], t[j], per))
            except BaseException as e:
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)
