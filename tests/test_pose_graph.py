"""Pose-graph optimization / multiway registration (ops/pose_graph.py).

The reference stops at pairwise registration; fusing a fragment sequence
into a consistent trajectory (the gt.log graphs utils/trajectory.py reads)
is the open3d `global_optimization` capability these tests pin on the
jitted Gauss-Newton optimizer.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from se3_equi_graph_registration_tpu.core.se3 import matrix_exp_so3
from se3_equi_graph_registration_tpu.ops.pose_graph import (
    optimize_pose_graph, optimize_trajectory)


def _circle_gt(V):
    R, t = [np.eye(3, dtype=np.float32)], [np.zeros(3, np.float32)]
    for i in range(1, V):
        a = 2 * np.pi * i / V
        R.append(np.array([[np.cos(a), -np.sin(a), 0],
                           [np.sin(a), np.cos(a), 0],
                           [0, 0, 1]], np.float32))
        t.append(np.array([np.cos(a) - 1, np.sin(a), 0.1 * i], np.float32))
    return np.stack(R), np.stack(t)


def _rel(Rg, tg, i, j, rng=None, noise=0.0):
    Rr = Rg[i].T @ Rg[j]
    tr = Rg[i].T @ (tg[j] - tg[i])
    if noise:
        w = rng.standard_normal(3).astype(np.float32) * noise
        Rr = np.asarray(matrix_exp_so3(jnp.asarray(w))) @ Rr
        tr = tr + rng.standard_normal(3).astype(np.float32) * noise
    return Rr.astype(np.float32), tr.astype(np.float32)


def _drifted_init(Rg, tg, edges_chain, rng, noise):
    R, t = [Rg[0]], [tg[0]]
    for i, _ in edges_chain:
        Rr, tr = _rel(Rg, tg, i, i + 1, rng, noise)
        t.append(t[-1] + R[-1] @ tr)
        R.append(R[-1] @ Rr)
    return np.stack(R), np.stack(t)


def _max_rot_deg(R, Rg):
    d = np.linalg.norm(R - Rg, axis=(1, 2)) / np.sqrt(2.0)
    return np.degrees(2 * np.arcsin(np.clip(d / 2, 0, 1))).max()


def test_exact_measurements_exact_recovery(rng):
    """Noiseless relative measurements + drifted init: GN recovers the GT
    trajectory to fp precision (measured ~1e-5 deg)."""
    V = 12
    Rg, tg = _circle_gt(V)
    chain = [(i, i + 1) for i in range(V - 1)]
    edges = np.array(chain + [(0, V - 1), (2, 8), (4, 10)], np.int32)
    R_rel, t_rel = map(np.stack,
                       zip(*[_rel(Rg, tg, i, j) for i, j in edges]))
    R0, t0 = _drifted_init(Rg, tg, chain, rng, 0.03)

    R, t = optimize_pose_graph(jnp.asarray(R0), jnp.asarray(t0),
                               jnp.asarray(edges), jnp.asarray(R_rel),
                               jnp.asarray(t_rel), iters=15)
    assert _max_rot_deg(np.asarray(R), Rg) < 1e-3
    assert np.abs(np.asarray(t) - tg).max() < 1e-5
    # gauge: the anchor did not move
    np.testing.assert_allclose(np.asarray(R)[0], Rg[0], atol=1e-6)


def test_loop_closure_fixes_drift(rng):
    """Noisy odometry + loop closures: optimization shrinks the drifted
    trajectory's translation error by >5x and improves rotation."""
    V = 12
    Rg, tg = _circle_gt(V)
    chain = [(i, i + 1) for i in range(V - 1)]
    edges = np.array(chain + [(0, V - 1), (2, 8), (4, 10)], np.int32)
    R_rel, t_rel = map(np.stack,
                       zip(*[_rel(Rg, tg, i, j, rng, 0.01) for i, j in edges]))
    R0, t0 = _drifted_init(Rg, tg, chain, rng, 0.03)
    rot0, t_err0 = _max_rot_deg(R0, Rg), np.abs(t0 - tg).max()

    R, t = optimize_pose_graph(jnp.asarray(R0), jnp.asarray(t0),
                               jnp.asarray(edges), jnp.asarray(R_rel),
                               jnp.asarray(t_rel), iters=15)
    rot1, t_err1 = _max_rot_deg(np.asarray(R), Rg), np.abs(np.asarray(t) - tg).max()
    assert t_err1 < t_err0 / 5, (t_err0, t_err1)
    assert rot1 < rot0, (rot0, rot1)


def test_edge_weights_downweight_bad_closure(rng):
    """One corrupted loop closure with low weight: the weighted solution
    stays near GT; with uniform weights it is dragged off."""
    V = 8
    Rg, tg = _circle_gt(V)
    chain = [(i, i + 1) for i in range(V - 1)]
    edges = np.array(chain + [(0, V - 1), (1, 5)], np.int32)
    rels = [_rel(Rg, tg, i, j) for i, j in edges]
    # corrupt the (1, 5) closure badly
    bad = list(rels[-1])
    bad[1] = bad[1] + np.float32([0.5, -0.4, 0.3])
    rels[-1] = tuple(bad)
    R_rel, t_rel = map(np.stack, zip(*rels))
    R0, t0 = _drifted_init(Rg, tg, chain, rng, 0.02)

    w_uni = np.ones(len(edges), np.float32)
    w_down = w_uni.copy()
    w_down[-1] = 1e-4
    args = (jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(edges),
            jnp.asarray(R_rel), jnp.asarray(t_rel))
    _, t_uni = optimize_pose_graph(*args, weights=jnp.asarray(w_uni), iters=15)
    _, t_dn = optimize_pose_graph(*args, weights=jnp.asarray(w_down), iters=15)
    assert np.abs(np.asarray(t_dn) - tg).max() < 1e-3
    assert (np.abs(np.asarray(t_uni) - tg).max()
            > 5 * np.abs(np.asarray(t_dn) - tg).max())


def test_trajectory_wrapper_jits(rng):
    """4x4 wrapper round-trips the gt.log schema and runs under jit."""
    V = 6
    Rg, tg = _circle_gt(V)
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    poses[:, :3, :3], poses[:, :3, 3] = Rg, tg
    chain = [(i, i + 1) for i in range(V - 1)]
    edges = np.array(chain + [(0, V - 1)], np.int32)
    rel = np.stack([np.linalg.inv(poses[i]) @ poses[j] for i, j in edges])

    init = poses.copy()
    init[1:, :3, 3] += rng.standard_normal((V - 1, 3)).astype(np.float32) * 0.05
    out = jax.jit(lambda p: optimize_trajectory(p, edges, rel, iters=10))(
        jnp.asarray(init))
    out = np.asarray(out)
    np.testing.assert_allclose(out, poses, atol=1e-4)
    np.testing.assert_allclose(
        out[:, 3], np.tile([0, 0, 0, 1], (len(out), 1)).astype(np.float32),
        atol=0)


def test_robust_kernel_repairs_corrupted_chain_edge():
    """A corrupted odometry link whose error is EMBEDDED in the init (the
    chain was integrated through it): most edges then agree with the wrong
    init, so plain least squares compromises and pure-MAD IRLS deadlocks
    (the collapsed scale crushes the informative closures — measured). The
    GNC-annealed geman kernel recovers the exact trajectory from the
    redundant spanning closures."""
    V = 4
    Rg = jnp.tile(jnp.eye(3), (V, 1, 1))
    edges = jnp.asarray(np.array([(0, 1), (1, 2), (2, 3), (0, 3), (0, 2)],
                                 np.int32))
    # chain measurements with edge (1, 2) corrupted by +0.3; closures exact
    t_rel = jnp.asarray(np.array([[1, 0, 0], [1.3, 0, 0], [1, 0, 0],
                                  [3, 0, 0], [2, 0, 0]], np.float32))
    R_rel = jnp.tile(jnp.eye(3), (5, 1, 1))
    t0 = jnp.asarray(np.array([[0, 0, 0], [1, 0, 0], [2.3, 0, 0],
                               [3.3, 0, 0]], np.float32))
    t_true = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]],
                      np.float32)

    _, t_rob = optimize_pose_graph(Rg, t0, edges, R_rel, t_rel,
                                   robust="geman", iters=20)
    np.testing.assert_allclose(np.asarray(t_rob), t_true, atol=1e-3)

    # plain least squares only splits the difference
    _, t_lsq = optimize_pose_graph(Rg, t0, edges, R_rel, t_rel, iters=20)
    assert np.abs(np.asarray(t_lsq) - t_true).max() > 0.02

    with pytest.raises(ValueError, match="unknown robust"):
        optimize_pose_graph(Rg, t0, edges, R_rel, t_rel, robust="bogus")


def test_multiway_tool_log_round_trip(tmp_path):
    """tools/multiway: gt.log in (odometry + a corrupted link + closures) ->
    optimized absolute-pose log out; the written poses match ground truth."""
    from se3_equi_graph_registration_tpu.tools.multiway import main
    from se3_equi_graph_registration_tpu.utils.trajectory import (
        read_trajectory_log, write_trajectory_log)

    V = 5
    Rg, tg = _circle_gt(V)
    gt = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    gt[:, :3, :3], gt[:, :3, 3] = Rg, tg

    odo = {}
    for i in range(V - 1):
        odo[f"{i}_{i + 1}"] = np.linalg.inv(gt[i]) @ gt[i + 1]
    odo["1_2"] = odo["1_2"].copy()
    odo["1_2"][:3, 3] += [0.25, 0, 0]          # corrupted odometry link
    closures = {f"{i}_{i + 2}": np.linalg.inv(gt[i]) @ gt[i + 2]
                for i in range(V - 2)}
    closures[f"0_{V - 1}"] = np.linalg.inv(gt[0]) @ gt[V - 1]

    write_trajectory_log(str(tmp_path / "odo.log"), odo)
    write_trajectory_log(str(tmp_path / "loops.log"), closures)
    main(["--log", str(tmp_path / "odo.log"),
          "--log", str(tmp_path / "loops.log"),
          "--out", str(tmp_path / "opt.log")])

    out = read_trajectory_log(str(tmp_path / "opt.log"))
    assert len(out) == V
    for k in range(V):
        T = out[f"0_{k}"]
        assert np.abs(T[:3, 3] - tg[k]).max() < 1e-3, k
        assert np.linalg.norm(T[:3, :3] - Rg[k]) < 1e-3, k
