"""bf16 parameter training with stochastic rounding (ROADMAP item).

Keeps an fp32 master copy of every parameter inside the optimizer state and
materializes the LIVE parameters in bfloat16 via stochastic rounding — the
standard recipe for training in reduced precision without the systematic
bias of round-to-nearest (small updates below half a bf16 ULP would otherwise
never change a weight; SR applies them in expectation).

Implementation is pure XLA bit arithmetic, so it works identically on TPU,
CPU tests, and inside pjit: fp32 → bf16 truncation rounds DOWN in magnitude;
adding uniform random 16-bit noise to the low mantissa bits before truncating
makes the round direction a Bernoulli draw with the exact residual
probability. Carries propagate into the exponent, which is precisely the
correct SR behavior at binade boundaries.

Usage:
    opt = bf16_sr_optimizer(optax.adam(1e-4))
    state = opt.init(params_fp32)           # params may be fp32 or bf16
    updates, state = opt.update(grads, state, params_bf16)
    params_bf16 = optax.apply_updates(params_bf16, updates)

The returned `updates` are bf16 deltas (new_bf16 - old_bf16), so the standard
optax.apply_updates contract holds and TrainState/checkpoint code needs no
changes. Live params may drift up to 1 bf16 ulp from SR(master) through the
delta re-rounding; the fp32 master inside the state stays exact and is what
checkpoints should restore from for continued training.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def stochastic_round_to_bf16(key: Array, x: Array) -> Array:
    """Stochastically round fp32 `x` to bfloat16.

    P(round up) equals the fractional position of x between its two
    neighboring bf16 values — unbiased: E[SR(x)] == x (up to fp32 precision).
    NaN/inf pass through (noise addition is masked for non-finite inputs).
    """
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = jax.random.bits(key, x.shape, dtype=jnp.uint32) & jnp.uint32(0xFFFF)
    finite = jnp.isfinite(x)
    rounded = jnp.where(finite, bits + noise, bits) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)


def tree_stochastic_round(key: Array, tree) -> object:
    """Stochastically round every floating leaf of a pytree to bf16."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = [stochastic_round_to_bf16(k, l)
           if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating) else l
           for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, out)


class Bf16SRState(NamedTuple):
    inner: optax.OptState
    master: object          # fp32 master parameters
    key: Array              # SR PRNG key


def bf16_sr_optimizer(inner: optax.GradientTransformation,
                      seed: int = 0) -> optax.GradientTransformation:
    """Wrap an optax optimizer with fp32 master weights + SR-to-bf16 params."""

    def init(params):
        master = jax.tree_util.tree_map(
            lambda p: jnp.asarray(p, jnp.float32), params)
        return Bf16SRState(inner=inner.init(master), master=master,
                           key=jax.random.PRNGKey(seed))

    def update(grads, state: Bf16SRState, params=None):
        grads32 = jax.tree_util.tree_map(
            lambda g: jnp.asarray(g, jnp.float32), grads)
        upd, inner_state = inner.update(grads32, state.inner, state.master)
        master = optax.apply_updates(state.master, upd)
        key, sub = jax.random.split(state.key)
        new_params = tree_stochastic_round(sub, master)
        if params is None:
            params = jax.tree_util.tree_map(
                lambda m: m.astype(jnp.bfloat16), state.master)
        deltas = jax.tree_util.tree_map(
            lambda n, p: (n.astype(jnp.float32)
                          - p.astype(jnp.float32)).astype(p.dtype), new_params,
            params)
        return deltas, Bf16SRState(inner=inner_state, master=master, key=key)

    return optax.GradientTransformation(init, update)
