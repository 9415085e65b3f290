"""Config system and CLI plumbing tests."""
import json

import numpy as np
import pytest

from se3_equi_graph_registration_tpu.train import config as cfg_lib
from se3_equi_graph_registration_tpu.train import engine


def test_presets():
    c3 = cfg_lib.preset("3dmatch")
    assert c3.engine.in_node_nf == 32 and c3.run.epochs == 500
    ck = cfg_lib.preset("kitti")
    assert ck.engine.in_node_nf == 33 and ck.engine.top_k == 2048
    # KITTI loss = corr + equi, no pose terms (kitti driver :1089)
    assert ck.engine.loss_weights.equi == 1.0
    assert ck.engine.loss_weights.rot == 0.0
    with pytest.raises(ValueError):
        cfg_lib.preset("nope")


def test_overrides_and_types():
    cfg = cfg_lib.preset("3dmatch")
    cfg = cfg_lib.apply_overrides(cfg, {"engine.lr": 3e-4,
                                        "data.batch_size": 16,
                                        "run.resume": True})
    assert cfg.engine.lr == pytest.approx(3e-4)
    assert cfg.data.batch_size == 16 and cfg.run.resume is True


def test_config_file_roundtrip(tmp_path):
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps({"engine.hidden_nf": 64, "data.descriptor": "fpfh"}))
    cfg = cfg_lib.from_file(str(path))
    assert cfg.engine.hidden_nf == 64
    assert cfg.data.descriptor == "fpfh"


def test_parse_cli_with_sets():
    cfg, args = cfg_lib.parse_cli([
        "--preset", "synthetic", "--set", "engine.num_nodes=128",
        "engine.loss_weights.equi=2.0", "data.batch_size=4"])
    assert cfg.engine.num_nodes == 128
    assert cfg.data.batch_size == 4
    assert cfg.engine.loss_weights.equi == 2.0


def test_flat_dict_contains_loss_weights():
    flat = cfg_lib.to_flat_dict(cfg_lib.preset("kitti"))
    assert flat["engine.loss_weights.equi"] == 1.0
    assert flat["data.dataset"] == "kitti"


def test_fast_tpu_config_helper():
    cfg = engine.fast_tpu_config(num_nodes=512)
    assert cfg.egnn_impl == "pallas" and cfg.knn_method == "morton"
    assert cfg.kabsch_solver == "quaternion" and cfg.num_nodes == 512


def test_robust_eval_config_and_cli_flag():
    cfg = engine.robust_eval_config(num_nodes=512)
    assert cfg.fusion_weighting == "sharp" and cfg.spectral_topm == 256
    assert cfg.refine_iters == 5 and cfg.egnn_impl == "pallas"

    # --robust sets the same knobs on any preset; explicit --set wins over it
    ecfg, _ = cfg_lib.parse_cli(["--preset", "synthetic", "--robust",
                                 "--set", "engine.spectral_topm=128"])
    assert ecfg.engine.fusion_weighting == "sharp"
    assert ecfg.engine.refine_iters == 5
    assert ecfg.engine.spectral_topm == 128


def test_remat_flag_runs(rng):
    import jax
    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    cfg = engine.EngineConfig(num_nodes=64, k=8, in_node_nf=16, top_k=16,
                              remat=True)
    model = engine.build_model(cfg)
    opt = engine.build_optimizer(cfg)
    pb = make_pair_batch(rng, batch=2, n=64, feat_dim=16)
    batch = engine.batch_to_device((pb.corr, pb.labels, pb.src_pts, pb.tgt_pts,
                                    pb.src_feat, pb.tgt_feat, pb.gt_pose))
    state = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0), batch)
    step = engine.make_train_step(model, opt, cfg)
    state, m = step(state, batch)
    assert np.isfinite(float(m["total"]))


def test_lr_schedule_epoch_unit_boundaries():
    """lr_step_unit='epoch' must reproduce StepLR(step_size epochs, gamma)
    exactly given steps_per_epoch (reference :1412-1413)."""
    import numpy as np

    cfg = engine.EngineConfig(lr=1e-4, lr_step=2, lr_gamma=0.5,
                              lr_step_unit="epoch")
    sched = engine.lr_schedule(cfg, steps_per_epoch=5)
    # 2 epochs x 5 steps = decay every 10 optimizer steps
    assert np.isclose(float(sched(0)), 1e-4)
    assert np.isclose(float(sched(9)), 1e-4)
    assert np.isclose(float(sched(10)), 5e-5)
    assert np.isclose(float(sched(19)), 5e-5)
    assert np.isclose(float(sched(20)), 2.5e-5)

    # grad accumulation: the optimizer advances once per k micro-batches
    cfg2 = engine.EngineConfig(lr=1e-4, lr_step=2, lr_gamma=0.5,
                               lr_step_unit="epoch", grad_accum_steps=5)
    sched2 = engine.lr_schedule(cfg2, steps_per_epoch=5)
    assert np.isclose(float(sched2(1)), 1e-4)
    assert np.isclose(float(sched2(2)), 5e-5)

    # epoch unit without steps_per_epoch must fail loudly
    import pytest
    with pytest.raises(ValueError):
        engine.lr_schedule(cfg, None)

    # the dataset presets opt into epoch units
    from se3_equi_graph_registration_tpu.train import config as config_lib
    assert config_lib.preset("3dmatch").engine.lr_step_unit == "epoch"
    assert config_lib.preset("kitti").engine.lr_step_unit == "epoch"
    # step-unit default stays valid without steps_per_epoch
    assert np.isclose(float(engine.lr_schedule(engine.EngineConfig())(0)), 1e-4)


def test_cli_export_roundtrip(tmp_path):
    """`cli export` writes a reference-schema .pth from a .pth or orbax
    checkpoint (the reverse-migration entry point)."""
    from se3_equi_graph_registration_tpu.train import cli

    out = str(tmp_path / "exported.pth")
    cli.main(["export", "--preset", "synthetic",
              "--checkpoint", "/root/reference/checkpoints/checkpoint-3dmatch.pth",
              "--out", out, "--epoch", "7"])
    import torch
    ck = torch.load(out, map_location="cpu", weights_only=False)
    assert ck["epoch"] == 7
    assert set(ck) >= {"egnn_state_dict", "cross_attention_state_dict",
                       "optimizer_state_dict"}


def test_cli_train_point_parallel(tmp_path):
    """`--set run.point_parallel=4 run.halo=16`: the CLI trains on a 2-axis
    (data x point) mesh with the halo-exchange step."""
    import jax

    from se3_equi_graph_registration_tpu.train import cli

    cli.main([
        "train", "--preset", "synthetic",
        "--set", "run.epochs=1", "run.point_parallel=4", "run.halo=16",
        "engine.num_nodes=128", "engine.k=8", "engine.top_k=32",
        "engine.hidden_nf=32", "data.batch_size=4",
        f"run.checkpoint_dir={tmp_path}/ckpt",
        f"run.log_path={tmp_path}/log.jsonl",
    ])
    import json
    rows = [json.loads(l) for l in open(f"{tmp_path}/log.jsonl")]
    assert rows and "total" in rows[-1]
    import numpy as np
    assert np.isfinite(rows[-1]["total"])


def test_repeated_set_flags_accumulate():
    """Regression: repeated `--set` occurrences must ACCUMULATE (argparse
    nargs='*' alone silently keeps only the last occurrence — earlier
    overrides were dropped)."""
    from se3_equi_graph_registration_tpu.train.config import parse_cli

    cfg, _ = parse_cli(["--preset", "synthetic",
                        "--set", "run.epochs=1",
                        "--set", "run.compile_cache=/tmp/cc",
                        "--set", "engine.lr=0.002"])
    assert cfg.run.epochs == 1
    assert cfg.run.compile_cache == "/tmp/cc"
    assert cfg.engine.lr == 0.002


def test_invalid_scalar_override_raises_at_cli():
    """Regression: a non-convertible scalar override (typo'd number) was
    silently stored as a string and exploded much later inside a jitted
    step; it must fail AT THE CLI with the field named."""
    import pytest
    from se3_equi_graph_registration_tpu.train.config import parse_cli

    with pytest.raises(ValueError, match="icp_iters"):
        parse_cli(["--preset", "synthetic", "--set", "engine.icp_iters=abc"])
    with pytest.raises(ValueError, match="lr"):
        parse_cli(["--preset", "synthetic", "--set", "engine.lr=3e-4x"])

    # string-sentinel fields keep their mode strings...
    cfg, _ = parse_cli(["--preset", "synthetic",
                        "--set", "engine.icp_trim=auto"])
    assert cfg.engine.icp_trim == "auto"
    # ...and a bare scalar for a tuple field becomes a 1-entry tuple
    # (tuple(0.4) used to raise a raw TypeError)
    cfg, _ = parse_cli(["--preset", "synthetic",
                        "--set", "engine.icp_voxels=0.4"])
    assert cfg.engine.icp_voxels == (0.4,)


def test_invalid_tuple_override_raises_named_error():
    """ADVICE r3: a tuple-field override with a non-numeric entry must raise
    the same NAMED ValueError contract as scalar overrides (was: a bare
    float() ValueError with no field name)."""
    import pytest
    from se3_equi_graph_registration_tpu.train.config import parse_cli

    with pytest.raises(ValueError, match="icp_voxels"):
        parse_cli(["--preset", "synthetic",
                   "--set", "engine.icp_voxels=0.4,abc"])


def test_numeric_override_on_string_sentinel_field():
    """ADVICE r3: when a sentinel field currently holds a string mode
    (icp_trim='auto'), a later NUMERIC override must take effect as a float
    (was: str()-coerced to '0.4' and rejected much later inside icp)."""
    from se3_equi_graph_registration_tpu.train import config as cfg_lib

    cfg = cfg_lib.preset("synthetic")
    cfg = cfg_lib.apply_overrides(cfg, {"engine.icp_trim": "auto"})
    assert cfg.engine.icp_trim == "auto"
    cfg = cfg_lib.apply_overrides(cfg, {"engine.icp_trim": 0.4})
    assert cfg.engine.icp_trim == 0.4 and isinstance(cfg.engine.icp_trim,
                                                     float)
