"""Multi-host training quickstart — the distributed launch pattern.

Run ONE copy of this script per host with a shared coordinator address:

    # host 0                                    # host 1
    python examples/multihost_train.py \\       python examples/multihost_train.py \\
        --coordinator host0:9876 \\                 --coordinator host0:9876 \\
        --num-processes 2 --process-id 0            --num-processes 2 --process-id 1

(on TPU pods the three arguments auto-discover — just run the script).
Every process: initializes jax.distributed, builds ONE global mesh whose
'data' axis crosses hosts over DCN (parallel/distributed.global_mesh), feeds
its disjoint slice of the dataset (PairLoader process sharding), and runs
the standard engine.fit — gradients psum across hosts automatically.

`--demo` self-spawns 2 local CPU processes and runs the whole flow on this
machine, printing each process's (identical) final loss — the smoke mode the
test suite drives.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np


def worker(coordinator: str, num_processes: int, process_id: int,
           epochs: int, n: int, cpu_devices: int) -> None:
    import jax
    if cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices)

    from se3_equi_graph_registration_tpu.data.pipeline import PairLoader
    from se3_equi_graph_registration_tpu.data.synthetic import make_pair_batch
    from se3_equi_graph_registration_tpu.parallel.distributed import (
        global_mesh, init_distributed, process_shard_info)
    from se3_equi_graph_registration_tpu.train import engine

    init_distributed(coordinator, num_processes, process_id)
    pid, nproc = process_shard_info()

    class DemoDataset:
        """Deterministic synthetic pairs — replace with ThreeDMatchPairDataset
        / KITTIPairDataset pointed at your archive root."""

        def __len__(self):
            return 16

        def __getitem__(self, i):
            pb = make_pair_batch(np.random.default_rng(i), batch=1, n=n,
                                 feat_dim=16)
            return tuple(np.asarray(v)[0] for v in pb)

    cfg = engine.EngineConfig(num_nodes=n, k=8, in_node_nf=16, hidden_nf=32,
                              top_k=16, lr=1e-3)
    model = engine.build_model(cfg)
    opt = engine.build_optimizer(cfg)

    mesh = global_mesh(dcn_axis="data")           # 'data' over all devices
    loader = PairLoader(DemoDataset(), batch_size=16 // nproc, shuffle=True,
                        seed=0, num_workers=1, process_shard=(pid, nproc))

    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P

    first = engine.batch_to_device(next(iter(loader)))
    state = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0), first)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    logs = []
    state = engine.fit(model, opt, cfg, state, train_batches=lambda: loader,
                       epochs=epochs, mesh=mesh,
                       logger=lambda e, m: logs.append(m["total"]))
    print(f"process {pid}/{nproc}: loss {logs[0]:.4f} -> {logs[-1]:.4f}",
          flush=True)


def demo(epochs: int, n: int) -> None:
    """Self-spawn 2 local CPU processes and run the multi-host flow."""
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--coordinator", f"localhost:{port}", "--num-processes", "2",
             "--process-id", str(i), "--epochs", str(epochs), "--n", str(n),
             "--cpu-devices", "2"],
            env=env)
        for i in range(2)
    ]
    rcs = [p.wait(timeout=540) for p in procs]
    assert rcs == [0, 0], rcs
    print("demo: both processes finished")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (auto on TPU pods)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help=">0: force a CPU platform with this many devices")
    ap.add_argument("--demo", action="store_true",
                    help="self-spawn 2 local CPU processes")
    args = ap.parse_args()
    if args.demo:
        demo(args.epochs, args.n)
    else:
        worker(args.coordinator, args.num_processes, args.process_id,
               args.epochs, args.n, args.cpu_devices)


if __name__ == "__main__":
    main()
