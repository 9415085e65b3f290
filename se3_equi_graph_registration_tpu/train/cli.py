"""Train / eval command-line entry points.

Replaces the reference's three driver scripts with two commands over one engine:

  python -m se3_equi_graph_registration_tpu.train.cli train --preset 3dmatch
  python -m se3_equi_graph_registration_tpu.train.cli eval  --preset 3dmatch \
      --checkpoint /path/checkpoint-3dmatch.pth

`.pth` checkpoints convert on the fly (train/checkpoints.py); native orbax
checkpoints restore directly. The 'synthetic' preset needs no data on disk.
"""
from __future__ import annotations

import json
import os
import sys
from typing import Iterable

import jax
import numpy as np

from ..data.pipeline import PairLoader
from ..data.synthetic import make_pair_batch
from . import engine
from .checkpoints import TrainCheckpointer, convert_reference_checkpoint
from .config import ExperimentConfig, parse_cli, to_flat_dict


def _build_dataset(cfg: ExperimentConfig, split: str):
    d = cfg.data
    if d.dataset == "3dmatch":
        from ..data.threedmatch import ThreeDMatchPairDataset
        return ThreeDMatchPairDataset(root=d.root, split=split,
                                      descriptor=d.descriptor,
                                      num_node=d.num_node, seed=d.seed,
                                      legacy_sampling_rng=d.legacy_sampling_rng)
    if d.dataset == "kitti":
        from ..data.kitti import KITTIPairDataset
        return KITTIPairDataset(root=d.root, split=split,
                                descriptor=d.descriptor,
                                num_node=d.num_node, seed=d.seed,
                                legacy_sampling_rng=d.legacy_sampling_rng)
    if d.dataset == "synthetic":
        return None
    raise ValueError(f"unknown dataset {d.dataset!r}")


def _synthetic_batches(cfg: ExperimentConfig, n_batches: int = 4) -> Iterable:
    rng = np.random.default_rng(cfg.data.seed)
    feat_dim = cfg.engine.in_node_nf
    for _ in range(n_batches):
        pb = make_pair_batch(rng, batch=cfg.data.batch_size,
                             n=cfg.engine.num_nodes, feat_dim=feat_dim)
        yield (pb.corr, pb.labels, pb.src_pts, pb.tgt_pts, pb.src_feat,
               pb.tgt_feat, pb.gt_pose)


def _loader(cfg: ExperimentConfig, split: str, shuffle: bool, dataset=None):
    """dataset: pass a pre-built dataset to avoid constructing it twice
    (None still means 'build it here'; synthetic presets have no dataset)."""
    ds = dataset if dataset is not None else _build_dataset(cfg, split)
    if ds is None:
        return lambda: _synthetic_batches(cfg)
    # multi-host: each process loads its interleaved slice of the global
    # batch (parallel/distributed.py); single-process this is (0, 1) = all
    from ..parallel.distributed import process_shard_info
    proc_idx, proc_cnt = process_shard_info()
    per_process = max(1, cfg.data.batch_size // proc_cnt)
    return lambda: PairLoader(ds, per_process, shuffle=shuffle,
                              seed=cfg.data.seed,
                              num_workers=cfg.data.num_workers,
                              process_shard=(proc_idx, proc_cnt)
                              if proc_cnt > 1 else None)


def _jsonl_logger(path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    f = open(path, "a")

    def log(epoch: int, metrics: dict):
        rec = {"epoch": epoch, **{k: float(v) for k, v in metrics.items()}}
        f.write(json.dumps(rec) + "\n")
        f.flush()
        pretty = ", ".join(f"{k}={v:.4f}" for k, v in rec.items() if k != "epoch")
        print(f"[epoch {epoch}] {pretty}", flush=True)

    return log


def _load_params(path: str, cfg: ExperimentConfig, model, template_state):
    if path.endswith(".pth"):
        return convert_reference_checkpoint(
            path, n_layers=cfg.engine.n_layers, num_heads=cfg.engine.num_heads,
            hidden=cfg.engine.hidden_nf)
    ckpt = TrainCheckpointer(path)
    restored = ckpt.restore_latest(template_state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    return restored[0].params


def cmd_train(cfg: ExperimentConfig, args) -> None:
    ecfg = cfg.engine
    model = engine.build_model(ecfg)
    # micro-batches per epoch for epoch-unit LR boundaries (engine.lr_schedule);
    # 4 = _synthetic_batches' per-epoch count. Dataset built ONCE, reused below.
    train_ds = _build_dataset(cfg, "train")
    steps_per_epoch = (4 if train_ds is None
                       else max(1, len(train_ds) // cfg.data.batch_size))
    opt = engine.build_optimizer(ecfg, steps_per_epoch=steps_per_epoch)

    train_batches = _loader(cfg, "train", shuffle=True, dataset=train_ds)
    val_batches = _loader(cfg, "val", shuffle=False) \
        if cfg.data.dataset != "synthetic" else None

    first = engine.batch_to_device(next(iter(train_batches())))
    state = engine.init_state(model, opt, ecfg, jax.random.PRNGKey(cfg.data.seed),
                              first)
    ckpt = TrainCheckpointer(cfg.run.checkpoint_dir)
    if cfg.run.resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state, step = restored
            print(f"resumed from step {step}")

    mesh = None
    train_step = None
    n_dev = len(jax.devices())
    pp = cfg.run.point_parallel
    if pp > 1:
        # 2-axis (data x point) mesh: the sequence-parallel analog for dense
        # clouds (parallel/point_sharding.py); halo>0 picks the O(halo)
        # boundary-exchange comm regime
        from ..parallel.distributed import global_mesh
        from ..parallel.point_sharding import make_point_sharded_train_step
        assert n_dev % pp == 0 and ecfg.num_nodes % pp == 0, (n_dev, pp)
        mesh = global_mesh({"data": n_dev // pp, "point": pp},
                           dcn_axis="data")
        train_step = make_point_sharded_train_step(
            model, opt, ecfg, mesh, halo=cfg.run.halo or None)
        print(f"2-axis mesh: data={n_dev // pp} x point={pp}"
              + (f", halo={cfg.run.halo}" if cfg.run.halo else ""))
    elif cfg.run.data_parallel and n_dev > 1:
        from ..parallel.distributed import global_mesh
        if cfg.data.batch_size % n_dev == 0:
            # data axis crosses hosts over DCN when this is a multi-process
            # run; pure ICI mesh otherwise
            mesh = global_mesh({"data": n_dev}, dcn_axis="data")
            print(f"data-parallel over {n_dev} devices, "
                  f"{jax.process_count()} process(es)")

    print(json.dumps(to_flat_dict(cfg), indent=2, default=str))
    state = engine.fit(
        model, opt, ecfg, state, train_batches=train_batches,
        epochs=cfg.run.epochs, val_batches=val_batches, checkpointer=ckpt,
        checkpoint_every=cfg.run.checkpoint_every,
        logger=_jsonl_logger(cfg.run.log_path), mesh=mesh,
        train_step=train_step)
    ckpt.save(int(state.step), state)
    print(f"done; final checkpoint at step {int(state.step)}")


def cmd_eval(cfg: ExperimentConfig, args) -> None:
    ecfg = cfg.engine
    model = engine.build_model(ecfg, head_mode="eval_fusion")
    # optimizer only shapes the template state here; any schedule works
    opt = engine.build_optimizer(ecfg, steps_per_epoch=1)

    batches_fn = _loader(cfg, "test", shuffle=False) \
        if cfg.data.dataset != "synthetic" else _loader(cfg, "test", False)
    first = engine.batch_to_device(next(iter(batches_fn())))
    template = engine.init_state(model, opt, ecfg,
                                 jax.random.PRNGKey(0), first)
    if args.checkpoint is None:
        raise SystemExit("--checkpoint required for eval")
    params = _load_params(args.checkpoint, cfg, model, template)

    os.makedirs(os.path.dirname(cfg.run.eval_output) or ".", exist_ok=True)
    summary = engine.evaluate(model, ecfg, params, batches_fn(),
                              save_path=cfg.run.eval_output)
    print(json.dumps(summary, indent=2))


def cmd_export(cfg: ExperimentConfig, args) -> None:
    """Convert a checkpoint between this framework and the reference:
    orbax dir (or reference .pth) → reference-schema .pth the upstream
    scripts load strict (train/checkpoints.py:export_reference_checkpoint)."""
    from .checkpoints import export_reference_checkpoint

    if args.checkpoint is None or args.out is None:
        raise SystemExit("export requires --checkpoint <orbax-dir|.pth> "
                         "--out <file.pth>")
    ecfg = cfg.engine
    model = engine.build_model(ecfg)
    template = None
    if not args.checkpoint.endswith(".pth"):
        # orbax restore needs a template state; only parameter SHAPES matter,
        # so build it from zeros at the config's shapes (no dataset required
        # — export must work without data.root on disk)
        import numpy as _np

        opt = engine.build_optimizer(ecfg, steps_per_epoch=1)
        n, c = ecfg.num_nodes, ecfg.in_node_nf
        zero_batch = {
            "labels": _np.zeros((1, n), _np.float32),
            "src_pts": _np.zeros((1, n, 3), _np.float32),
            "tgt_pts": _np.zeros((1, n, 3), _np.float32),
            "src_feat": _np.zeros((1, n, c), _np.float32),
            "tgt_feat": _np.zeros((1, n, c), _np.float32),
            "gt_pose": _np.tile(_np.eye(4, dtype=_np.float32), (1, 1, 1)),
        }
        template = engine.init_state(model, opt, ecfg, jax.random.PRNGKey(0),
                                     zero_batch)
    params = _load_params(args.checkpoint, cfg, model, template)
    export_reference_checkpoint(
        params, args.out, epoch=args.epoch, n_layers=ecfg.n_layers,
        num_heads=ecfg.num_heads, hidden=ecfg.hidden_nf)
    print(f"wrote reference-schema checkpoint to {args.out}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("train", "eval", "export"):
        raise SystemExit("usage: cli.py {train|eval|export} [--preset ...] ...")
    command, rest = argv[0], argv[1:]
    # multi-process runs (pods / multi-slice) initialize before first
    # backend touch; single-process is a no-op (parallel/distributed.py)
    from ..parallel.distributed import init_distributed
    init_distributed()
    cfg, args = parse_cli(rest, description=f"{command} entry point")
    if cfg.run.compile_cache:
        from ..utils.compile_cache import enable_compilation_cache
        enable_compilation_cache(cfg.run.compile_cache)
    if command == "train":
        cmd_train(cfg, args)
    elif command == "export":
        cmd_export(cfg, args)
    else:
        cmd_eval(cfg, args)


if __name__ == "__main__":
    main()
