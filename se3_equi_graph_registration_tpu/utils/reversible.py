"""Reversible (RevNet-style) residual sequences with O(1) activation memory.

Capability parity with the vendored utils/reversible.py (ReversibleBlock /
_ReversibleFunction / ReversibleSequence over paired streams), JAX-native:
the backward pass RECONSTRUCTS inputs from outputs via the additive-coupling
inverse inside a `jax.custom_vjp`, so no intermediate activations are stored —
the same O(1) memory property the torch autograd.Function version hand-rolls.
(The reference's copy is vendored and unused by its train path; here it is a
usable memory-scaling tool for deep EGNN stacks.)

Coupling: y1 = x1 + f(x2); y2 = x2 + g(y1). Inverse: x2 = y2 − g(y1);
x1 = y1 − f(x2).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def reversible_sequence(fs: Sequence[Callable], gs: Sequence[Callable],
                        x1: Array, x2: Array,
                        params_list: Sequence) -> tuple[Array, Array]:
    """Run len(fs) reversible blocks; activations are never saved — backward
    reconstructs them block by block from the outputs."""
    assert len(fs) == len(gs) == len(params_list)

    def make_block(f, g):
        @jax.custom_vjp
        def block(p, a1, a2):
            pf, pg = p
            b1 = a1 + f(pf, a2)
            b2 = a2 + g(pg, b1)
            return b1, b2

        def fwd(p, a1, a2):
            out = block(p, a1, a2)
            return out, (p, out)          # store only OUTPUTS + params

        def bwd(res, cot):
            p, (b1, b2) = res
            pf, pg = p
            db1, db2 = cot
            # reconstruct inputs (additive-coupling inverse)
            a2 = b2 - g(pg, b1)
            a1 = b1 - f(pf, a2)
            # re-linearize each sub-function at the reconstructed points
            g_fn = lambda pg_, b1_: g(pg_, b1_)
            f_fn = lambda pf_, a2_: f(pf_, a2_)
            _, g_vjp = jax.vjp(g_fn, pg, b1)
            dpg, db1_extra = g_vjp(db2)
            db1_total = db1 + db1_extra
            _, f_vjp = jax.vjp(f_fn, pf, a2)
            dpf, da2_extra = f_vjp(db1_total)
            da1 = db1_total
            da2 = db2 + da2_extra
            return ((dpf, dpg), da1, da2)

        block.defvjp(fwd, bwd)
        return block

    for f, g, p in zip(fs, gs, params_list):
        x1, x2 = make_block(f, g)(p, x1, x2)
    return x1, x2


def invert_sequence(fs: Sequence[Callable], gs: Sequence[Callable],
                    y1: Array, y2: Array,
                    params_list: Sequence) -> tuple[Array, Array]:
    """Exact inverse of `reversible_sequence` (for testing / invertible flows)."""
    for f, g, p in zip(reversed(fs), reversed(gs), reversed(params_list)):
        pf, pg = p
        y2 = y2 - g(pg, y1)
        y1 = y1 - f(pf, y2)
    return y1, y2
