"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
`--xla_force_host_platform_device_count=8` (SURVEY.md §4 implication). These
env vars must be set before jax initializes, hence module scope here.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import faulthandler  # noqa: E402

import jax  # noqa: E402

# The hosted TPU plugin force-registers itself ahead of the JAX_PLATFORMS env
# var, so pin the platform through the config API instead.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()

# Crash-artifact capture (VERDICT r3 weak #6): a native crash (ctypes
# max-clique, torch+jax cohabitation, Gloo) must name its test even when the
# head of the console log is lost. faulthandler redirects the fatal-error
# traceback into tests/.crash_dump.log (last enable() wins over pytest's
# stderr default), and .last_test_started records the running test at each
# test start — together they attribute any hard abort.
_ART_DIR = os.path.dirname(os.path.abspath(__file__))
_CRASH_LOG = open(os.path.join(_ART_DIR, ".crash_dump.log"), "w")
_LAST_TEST = os.path.join(_ART_DIR, ".last_test_started")


def pytest_sessionstart(session):
    # must run AFTER pytest's builtin faulthandler plugin re-enables to
    # stderr at configure time — the last enable() owns the dump target
    faulthandler.enable(file=_CRASH_LOG, all_threads=True)


def pytest_runtest_logstart(nodeid, location):
    with open(_LAST_TEST, "w") as f:
        f.write(nodeid + "\n")


# Fast lane (VERDICT r3 weak #7): the parity/multiprocess/dense-scaling
# suites dominate the ~40-min wall time; `-m "not slow"` deselects them for
# quick iterations (documented in CLAUDE.md). Module-level classification so
# new tests in a slow file inherit the marker automatically.
_SLOW_MODULES = {
    "test_accuracy_budget.py",   # N=2048 trained-checkpoint runs on 1 CPU
    "test_bench.py",             # bench.py entry points end-to-end
    "test_bf16_training.py",     # multi-epoch training convergence
    "test_checkpoint_parity.py", # torch oracles + imported reference heads
    "test_dense_scaling.py",     # 8K-32K windowed-graph steps
    "test_examples.py",          # full example scripts
    "test_global_registration.py",  # multi-seed FPFH pipelines
    "test_grad_budget.py",       # interpret-mode fast+accurate grad twins
    "test_graft_entry.py",       # driver dryrun incl. 8-device mesh step
    "test_loss_parity.py",       # imports the reference train module (torch)
    "test_multiprocess.py",      # 2-process jax.distributed subprocess runs
    "test_pallas_backward.py",   # interpret-mode backward kernels
    "test_pallas_kernels.py",    # interpret-mode forward kernels
    "test_parallel.py",          # sharded-vs-unsharded train-step twins
    "test_pipeline_parity.py",   # imported reference evaluate_model E2E
    "test_kitti_driver_parity.py",  # imported KITTI driver at N=2048
    "test_train_parity.py",      # imported reference backward + Adam step
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(item.fspath) in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
