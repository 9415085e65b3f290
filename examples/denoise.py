"""Coordinate-denoising training demo with the EGNN.

Capability parity with the reference's denoise.py (a sidechainnet protein
coordinate-denoising script around the vendored SE3Transformer, :1-93) —
here a self-contained demo: corrupt synthetic point clouds with Gaussian
noise, train the EGNN's coordinate stream to undo it, with gradient
accumulation (the reference's GRADIENT_ACCUMULATE_EVERY=16 lives here too).

Run: PYTHONPATH=. python examples/denoise.py [--steps 50]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from se3_equi_graph_registration_tpu.models import EGNN
from se3_equi_graph_registration_tpu.ops import knn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--noise", type=float, default=0.1)
    ap.add_argument("--accumulate-every", type=int, default=4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    model = EGNN(in_node_nf=16, hidden_nf=32, out_node_nf=16, n_layers=3)

    def make_batch():
        clean = rng.standard_normal((args.n, 3)).astype(np.float32)
        noisy = clean + rng.standard_normal((args.n, 3)).astype(np.float32) * args.noise
        feats = rng.standard_normal((args.n, 16)).astype(np.float32)
        nbr = knn.knn_graph(jnp.asarray(noisy), args.k)
        return jnp.asarray(feats), jnp.asarray(noisy), nbr, jnp.asarray(clean)

    h, x, nbr, clean = make_batch()
    params = model.init(jax.random.PRNGKey(0), h, x, nbr)

    opt = optax.MultiSteps(optax.adam(1e-3), args.accumulate_every)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, h, x, nbr, clean):
        def loss_fn(p):
            _, x_out = model.apply(p, h, x, nbr)
            return jnp.mean((x_out - clean) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    baseline = float(jnp.mean((x - clean) ** 2))
    print(f"noise MSE before training: {baseline:.5f}")
    for i in range(args.steps):
        h, x, nbr, clean = make_batch()
        params, opt_state, loss = step(params, opt_state, h, x, nbr, clean)
        if (i + 1) % 10 == 0:
            print(f"step {i + 1}: denoise MSE {float(loss):.5f}")
    final = float(loss)
    print(f"final MSE {final:.5f} vs noise floor {baseline:.5f}")
    # the coord stream init gain is 1e-3, so meaningful denoising needs a few
    # hundred steps; short runs should at least not diverge
    assert final < baseline * 1.5, "training diverged"
    print("done")


if __name__ == "__main__":
    main()
