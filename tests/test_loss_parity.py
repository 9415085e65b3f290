"""Golden parity of the loss library vs the reference's OWN loss functions.

train/losses.py claims the five loss families of the reference train driver
(/root/reference/src/3dmatch_train_egnn_with_batch.py); here each is fed
identical random tensors through BOTH the imported reference implementation
(tests/reference_oracle.py) and ours, and must agree at fp32 tolerance —
extending the pipeline-parity program to the training-objective seam.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import reference_oracle  # noqa: E402
from se3_equi_graph_registration_tpu.data.synthetic import (  # noqa: E402
    random_rotation)
from se3_equi_graph_registration_tpu.train import losses  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return reference_oracle.train_module()


def _pose_batch(rng, b):
    poses = []
    for _ in range(b):
        p = np.eye(4, dtype=np.float32)
        p[:3, :3] = random_rotation(rng).astype(np.float32)
        p[:3, 3] = rng.standard_normal(3).astype(np.float32)
        poses.append(p)
    return np.stack(poses)


@pytest.fixture()
def data(rng):
    b, n, c = 3, 64, 32
    return dict(
        h_src=rng.standard_normal((b, n, c)).astype(np.float32),
        h_tgt=rng.standard_normal((b, n, c)).astype(np.float32),
        x_src=rng.standard_normal((b, n, 3)).astype(np.float32),
        x_tgt=rng.standard_normal((b, n, 3)).astype(np.float32),
        labels=(rng.uniform(size=(b, n)) < 0.6).astype(np.float32),
        gt_pose=_pose_batch(rng, b),
        R=np.stack([random_rotation(rng).astype(np.float32)
                    for _ in range(b)]),
        t=rng.standard_normal((b, 3)).astype(np.float32),
    )


def test_egnn_equi_loss_matches_reference(ref, data):
    d = {k: torch.from_numpy(v) for k, v in data.items()}
    want = ref.egnn_equi_loss(d["h_src"], d["x_src"], d["h_tgt"], d["x_tgt"],
                              d["gt_pose"][:, :3, :3], d["gt_pose"][:, :3, 3],
                              d["labels"]).item()
    got = float(losses.egnn_equi_loss(
        jnp.asarray(data["h_src"]), jnp.asarray(data["x_src"]),
        jnp.asarray(data["h_tgt"]), jnp.asarray(data["x_tgt"]),
        jnp.asarray(data["gt_pose"]), jnp.asarray(data["labels"])))
    assert np.isclose(got, want, rtol=1e-5, atol=1e-5), (got, want)


def test_compute_losses_matches_reference(ref, data):
    d = {k: torch.from_numpy(v) for k, v in data.items()}
    want_pt, want_ft = ref.compute_losses(
        d["R"], d["t"], d["h_src"], d["x_src"], d["h_tgt"], d["x_tgt"],
        d["labels"])
    got_pt, got_ft = losses.masked_point_and_feature_loss(
        jnp.asarray(data["R"]), jnp.asarray(data["t"]),
        jnp.asarray(data["h_src"]), jnp.asarray(data["x_src"]),
        jnp.asarray(data["h_tgt"]), jnp.asarray(data["x_tgt"]),
        jnp.asarray(data["labels"]))
    assert np.isclose(float(got_pt), want_pt.item(), rtol=1e-5, atol=1e-5)
    assert np.isclose(float(got_ft), want_ft.item(), rtol=1e-5, atol=1e-5)


def test_pose_loss_matches_reference(ref, data):
    d = {k: torch.from_numpy(v) for k, v in data.items()}
    want_rot, want_trans = ref.pose_loss(d["R"], d["t"], d["gt_pose"])
    got_rot, got_trans = losses.pose_loss(
        jnp.asarray(data["R"]), jnp.asarray(data["t"]),
        jnp.asarray(data["gt_pose"]))
    # our arccos clips at 1-1e-6 (gradient-NaN defusal); random poses sit far
    # from the clip so the values match to fp32 tolerance
    np.testing.assert_allclose(np.asarray(got_rot), want_rot.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_trans), want_trans.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_correspondence_loss_matches_reference(rng):
    scores = rng.standard_normal((3, 128)).astype(np.float32) * 3
    labels = (rng.uniform(size=(3, 128)) < 0.5).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(scores),
                                        torch.from_numpy(labels)).item()
    got = float(losses.correspondence_loss(jnp.asarray(scores),
                                           jnp.asarray(labels)))
    assert np.isclose(got, want, rtol=1e-6, atol=1e-6), (got, want)


def test_similarity_loss_matches_reference(rng):
    """Reference (:777-781): standardize with torch std (UNBIASED, ddof=1),
    then MSE."""
    sim = rng.standard_normal((3, 256)).astype(np.float32) * 2 + 1
    raw = rng.standard_normal((3, 256)).astype(np.float32)
    ts, tr = torch.from_numpy(sim), torch.from_numpy(raw)
    ts = (ts - ts.mean()) / (ts.std() + 1e-6)
    tr = (tr - tr.mean()) / (tr.std() + 1e-6)
    want = torch.nn.MSELoss()(ts, tr).item()
    got = float(losses.similarity_consistency_loss(jnp.asarray(sim),
                                                   jnp.asarray(raw)))
    assert np.isclose(got, want, rtol=1e-5, atol=1e-6), (got, want)
