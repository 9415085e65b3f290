"""Tests for nn_extras (vendored-utils parity), reversible sequences, and the
file-based evaluation harness."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from se3_equi_graph_registration_tpu.tools import eval_files
from se3_equi_graph_registration_tpu.utils import nn_extras, reversible


def test_to_order_and_fourier():
    assert nn_extras.to_order(0) == 1 and nn_extras.to_order(3) == 7
    x = jnp.asarray([[1.0, 2.0]])
    enc = nn_extras.fourier_encode(x, num_encodings=3, include_self=True)
    assert enc.shape == (1, 2 * (2 * 3 + 1))
    enc2 = nn_extras.fourier_encode(x, num_encodings=3, include_self=False)
    assert enc2.shape == (1, 2 * 2 * 3)


def test_masked_mean():
    t = jnp.asarray([[1.0, 2.0, 3.0, 100.0]])
    m = jnp.asarray([[1, 1, 1, 0]])
    np.testing.assert_allclose(np.asarray(nn_extras.masked_mean(t, m)), [2.0])
    np.testing.assert_allclose(
        np.asarray(nn_extras.masked_mean(t, jnp.zeros_like(m))), [0.0])


def test_batched_index_select(rng):
    v = jnp.asarray(rng.standard_normal((2, 10, 4)), jnp.float32)
    idx = jnp.asarray([[3, 1], [0, 9]])
    out = nn_extras.batched_index_select(v, idx, axis=1)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(v[0, 3]))
    np.testing.assert_allclose(np.asarray(out[1, 1]), np.asarray(v[1, 9]))


def test_rotary_norm_preserving(rng):
    x = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    pos = jnp.arange(5, dtype=jnp.float32)
    sincos = nn_extras.sinusoidal_embeddings(pos, 8)
    y = nn_extras.apply_rotary_pos_emb(x, sincos)
    # rotary is a per-pair rotation → norms preserved
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(y, axis=-1)),
                               np.asarray(jnp.linalg.norm(x, axis=-1)),
                               rtol=1e-5)


def _mlp(p, x):
    return jnp.tanh(x @ p["w"]) + p["b"]


def _make_params(rng, d, n_blocks):
    ps = []
    for _ in range(n_blocks):
        pf = {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32),
              "b": jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)}
        pg = {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32),
              "b": jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)}
        ps.append((pf, pg))
    return ps


def test_reversible_roundtrip_and_grads(rng):
    d, n_blocks = 8, 3
    ps = _make_params(rng, d, n_blocks)
    fs = [_mlp] * n_blocks
    gs = [_mlp] * n_blocks
    x1 = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)

    y1, y2 = reversible.reversible_sequence(fs, gs, x1, x2, ps)
    r1, r2 = reversible.invert_sequence(fs, gs, y1, y2, ps)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(x1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(x2), atol=1e-5)

    # gradients through the reconstruct-in-backward path == direct autodiff
    def loss_rev(ps_):
        a, b = reversible.reversible_sequence(fs, gs, x1, x2, ps_)
        return jnp.sum(a ** 2) + jnp.sum(b ** 2)

    def forward_plain(ps_, a1, a2):
        for f, g, p in zip(fs, gs, ps_):
            pf, pg = p
            a1 = a1 + f(pf, a2)
            a2 = a2 + g(pg, a1)
        return a1, a2

    def loss_plain(ps_):
        a, b = forward_plain(ps_, x1, x2)
        return jnp.sum(a ** 2) + jnp.sum(b ** 2)

    g_rev = jax.grad(loss_rev)(ps)
    g_plain = jax.grad(loss_plain)(ps)
    for (grf, grg), (gpf, gpg) in zip(g_rev, g_plain):
        np.testing.assert_allclose(np.asarray(grf["w"]), np.asarray(gpf["w"]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(grg["b"]), np.asarray(gpg["b"]),
                                   atol=1e-4)


def test_evaluate_pairwise_frames(tmp_path, rng):
    from se3_equi_graph_registration_tpu.data.synthetic import random_rotation
    gt_dir = tmp_path / "gt"; gt_dir.mkdir()
    pred_dir = tmp_path / "pred"; pred_dir.mkdir()
    R = random_rotation(rng)
    t = np.asarray([0.1, 0.2, 0.3])
    src = rng.standard_normal((100, 3))
    tgt = src @ R.T + t
    pose = np.eye(4); pose[:3, :3] = R; pose[:3, 3] = t
    with open(gt_dir / "0001.pkl", "wb") as f:
        pickle.dump({"gt_pose": pose, "xyz_0": src, "xyz_1": tgt}, f)
    # prediction = exact gt pose as qx qy qz qw tx ty tz (scipy quat order)
    # build quaternion via our converter (no scipy dependency)
    import jax.numpy as jnp
    from se3_equi_graph_registration_tpu.core.quaternions import (
        rotation_matrix_to_quaternion)
    q_wxyz = np.asarray(rotation_matrix_to_quaternion(jnp.asarray(R)))
    q_xyzw = np.concatenate([q_wxyz[1:], q_wxyz[:1]])
    (pred_dir / "0001.txt").write_text(
        " ".join(map(str, np.concatenate([q_xyzw, t]))))
    summary = eval_files.evaluate_pairwise_frames(
        ["0001.pkl"], ["0001.txt"], str(gt_dir), str(pred_dir), str(tmp_path))
    assert summary["avg_rotation_error_deg"] < 0.1
    assert summary["avg_translation_error_cm"] < 0.1
    assert summary["avg_registration_recall"] > 0.99
    assert (tmp_path / "evaluation_results.txt").exists()
