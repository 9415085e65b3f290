"""Serving API and debugging-helper tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3_equi_graph_registration_tpu.utils import debugging

CKPT = "/root/reference/checkpoints/checkpoint-3dmatch.pth"


@pytest.mark.skipif(not os.path.exists(CKPT), reason="reference ckpt absent")
def test_registrar_identity_translation(rng):
    from se3_equi_graph_registration_tpu.serving import Registrar
    reg = Registrar.from_checkpoint(CKPT, fast=False, num_nodes=256, k=8,
                                    top_k=64)
    src = rng.standard_normal((300, 3)).astype(np.float32)   # ragged: 300 -> 256
    feat = rng.standard_normal((300, 32)).astype(np.float32)
    R, t, info = reg.register(src, feat, src + 0.1, feat)
    assert R.shape == (3, 3)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-3)
    np.testing.assert_allclose(t, [0.1, 0.1, 0.1], atol=1e-3)

    # batched call with the compiled shape reuses the same jit program
    src2 = rng.standard_normal((2, 256, 3)).astype(np.float32)
    feat2 = rng.standard_normal((2, 256, 32)).astype(np.float32)
    R2, t2, _ = reg.register(src2, feat2, src2, feat2)
    assert R2.shape == (2, 3, 3)
    np.testing.assert_allclose(R2[0], np.eye(3), atol=1e-3)


def test_tree_all_finite_and_find():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert bool(debugging.tree_all_finite(good))
    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, jnp.nan])}}
    assert not bool(debugging.tree_all_finite(bad))
    paths = debugging.find_nonfinite(bad)
    assert len(paths) == 1 and "c" in paths[0]


def test_guard_fit_saves_emergency(tmp_path):
    class FakeCkpt:
        saved = None

        def save(self, step, state, metrics=None):
            FakeCkpt.saved = (step, metrics)

    class FakeState:
        step = jnp.asarray(7)

    def boom():
        raise RuntimeError("preempted")

    with pytest.raises(RuntimeError):
        debugging.guard_fit(boom, FakeCkpt(), lambda: FakeState())
    assert FakeCkpt.saved == (7, {"emergency": 1.0})


def test_guard_fit_emergency_checkpoint(tmp_path):
    """A crash inside the guarded fit must save a resumable emergency
    checkpoint of the latest state before re-raising (the failure-recovery
    story, utils/debugging.py)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from se3_equi_graph_registration_tpu.train import engine
    from se3_equi_graph_registration_tpu.train.checkpoints import TrainCheckpointer

    state = engine.TrainState(params={"w": jnp.ones((3,))},
                              opt_state=(), step=jnp.asarray(7, jnp.int32))
    ckpt = TrainCheckpointer(str(tmp_path / "emergency"))

    def crashing_fit():
        raise RuntimeError("data corruption at step 7")

    with pytest.raises(RuntimeError, match="data corruption"):
        debugging.guard_fit(crashing_fit, ckpt, lambda: state)

    restored = ckpt.restore_latest(state)
    assert restored is not None
    rstate, step = restored
    assert step == 7
    assert jnp.array_equal(rstate.params["w"], state.params["w"])
