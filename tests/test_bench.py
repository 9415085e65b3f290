"""Smoke tests for bench.py — the driver runs it on real TPU at the end of
every round, so every mode must stay importable and runnable. These run the
three benchmark bodies at tiny shapes on CPU (the numbers are meaningless;
only "compiles, runs, returns a positive rate, prints valid JSON" matters).

Regression context: the icp_voxels parameter added to
registration._register_core broke `bench.py --global-reg` silently because
nothing in the suite invoked bench_global.
"""
import json
import sys

import pytest


@pytest.fixture(scope="module")
def bench_mod():
    sys.path.insert(0, "/root/repo")
    import bench
    return bench


def test_bench_inference_smoke(bench_mod):
    pps, best_b = bench_mod.bench(batch_sizes=(2,), n=256, k=8, iters=1,
                                  warmup=1)
    assert pps > 0 and best_b == 2


def test_bench_train_smoke(bench_mod):
    pps, best_b = bench_mod.bench_train(batch_sizes=(2,), n=256, k=8, iters=1)
    assert pps > 0 and best_b == 2


def test_bench_global_smoke(bench_mod):
    pps, best_b = bench_mod.bench_global(batch_sizes=(1,), n=256, iters=1)
    assert pps > 0 and best_b == 1


def test_main_prints_one_json_line(bench_mod, capsys, monkeypatch):
    """The driver contract: exactly one JSON line on stdout, with the
    metric/value/unit/vs_baseline keys."""
    for argv in (
        ["bench.py", "--n", "256", "--k", "8", "--iters", "1",
         "--batches", "2", "--no-extras"],
        ["bench.py", "--global-reg", "--n", "256", "--iters", "1",
         "--batches", "1"],
    ):
        monkeypatch.setattr(sys, "argv", argv)
        bench_mod.main()
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        rec = json.loads(out[0])
        assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
        assert rec["value"] > 0


def test_main_default_carries_all_three_throughputs(bench_mod, capsys,
                                                    monkeypatch):
    """The driver-captured artifact regression-guards the learned path,
    training, AND the checkpoint-free pipeline (VERDICT r4 weak #7): the
    default line keeps the primary keys and adds the two extra fields."""
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--n", "256", "--k", "8", "--iters", "1",
                         "--batches", "2"])
    bench_mod.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline",
                        "train_pairs_per_sec", "global_reg_pairs_per_sec",
                        "global_reg_speed_mode_pairs_per_sec"}
    assert rec["value"] > 0
    assert rec["train_pairs_per_sec"] > 0
    assert rec["global_reg_pairs_per_sec"] > 0
    assert rec["global_reg_speed_mode_pairs_per_sec"] > 0
