"""Debugging / failure-detection helpers.

The reference leaves `torch.autograd.set_detect_anomaly(True)` permanently on
inside its train step (a large slowdown, SURVEY.md §5.1) and its only failure
handling is skipping None batches. Here the equivalents are explicit, opt-in,
and cheap when off:

- `nan_checks(True)` toggles jax_debug_nans (trap at the op that produced it);
- `assert_finite(tree, name)` — a jit-safe checkify-style guard for states;
- `guard_fit(...)` wraps the training loop with emergency checkpointing so a
  crash (preemption, data corruption, NaN blowup) saves a resumable state.
"""
from __future__ import annotations

import traceback
from typing import Callable

import jax
import jax.numpy as jnp


def nan_checks(enable: bool = True) -> None:
    """Global NaN trap (jax_debug_nans): raises at the producing op."""
    jax.config.update("jax_debug_nans", enable)


def tree_all_finite(tree) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite (jit-safe)."""
    leaves = [jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack(leaves))


def find_nonfinite(tree) -> list[str]:
    """Host-side: paths of non-finite leaves (for post-mortem reports)."""
    import numpy as np
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))
    return bad


def guard_fit(fit_fn: Callable, checkpointer, state_getter: Callable):
    """Run `fit_fn()`; on ANY exception save an emergency checkpoint of
    `state_getter()` before re-raising. Returns fit_fn's result."""
    try:
        return fit_fn()
    except BaseException:
        try:
            state = state_getter()
            step = int(state.step) if hasattr(state, "step") else 0
            checkpointer.save(step, state, metrics={"emergency": 1.0})
            print(f"[guard_fit] emergency checkpoint saved at step {step}")
        except Exception:
            traceback.print_exc()
        raise
