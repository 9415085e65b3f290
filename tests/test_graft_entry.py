"""Guard the driver-facing entry points (__graft_entry__.py).

The driver compile-checks `entry()` single-chip and runs
`dryrun_multichip(n)` on virtual CPU devices; a regression here silently
fails the round's MULTICHIP artifact, so keep both under test. The suite's
conftest already provisions the 8-device CPU platform the dryrun wants.
"""
import os
import sys

import jax
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import __graft_entry__ as graft  # noqa: E402


def test_entry_forward_compiles_and_runs():
    fn, (params, batch) = graft.entry()
    R, t, scores = jax.jit(fn)(params, batch)
    assert R.shape == (1, 3, 3) and t.shape == (1, 3)
    assert scores.shape[0] == 1


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    graft.dryrun_multichip(8)  # raises on any sharded-vs-unsharded mismatch
