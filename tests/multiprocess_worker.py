"""Worker process for the REAL multi-process distributed test.

Each OS process runs this script with (port, process_id, num_processes, out):
it initializes jax.distributed on CPU (2 local devices per process), builds
the hybrid DCN x ICI global mesh through parallel/distributed.global_mesh,
feeds its process-local shard through PairLoader(process_shard=...) and
fit()'s host_local_to_global path, trains 3 epochs of data-parallel steps,
and dumps the final replicated params for the parent to compare.

This promotes the multi-host layer (SURVEY.md §7.8, parallel/distributed.py)
from "degrades to a no-op on one process" to actually-executed code:
jax.distributed.initialize, create_hybrid_device_mesh, and
make_array_from_process_local_data all run for real here.
"""
import sys

import numpy as np


class DeterministicPairs:
    """Deterministic by index — every process (and the parent test's
    single-process reference) reconstructs the SAME dataset; PairLoader's
    process_shard gives each its disjoint slice."""

    def __len__(self):
        return 8

    def __getitem__(self, i):
        from se3_equi_graph_registration_tpu.data.synthetic import (
            make_pair_batch)
        pb = make_pair_batch(np.random.default_rng(100 + i), batch=1,
                             n=64, feat_dim=16)
        return tuple(np.asarray(v)[0] for v in pb)


def main():
    port, pid, nproc, out = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                             sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from se3_equi_graph_registration_tpu.parallel.distributed import (
        global_mesh, init_distributed, process_shard_info)

    assert init_distributed(f"localhost:{port}", nproc, pid) is True
    assert jax.process_count() == nproc, jax.process_count()
    assert process_shard_info() == (pid, nproc)
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 2 * nproc

    from jax.sharding import NamedSharding, PartitionSpec as P

    from se3_equi_graph_registration_tpu.data.pipeline import PairLoader
    from se3_equi_graph_registration_tpu.train import engine

    cfg = engine.EngineConfig(num_nodes=64, k=8, in_node_nf=16, hidden_nf=32,
                              top_k=16)
    model = engine.build_model(cfg)
    opt = engine.build_optimizer(cfg)

    DS = DeterministicPairs  # shared with the parent test's reference run

    # hybrid mesh: the 'data' axis crosses the two processes over DCN
    mesh = global_mesh({"data": 2 * nproc}, dcn_axis="data")
    assert mesh.shape == {"data": 2 * nproc}

    loader = PairLoader(DS(), batch_size=8 // nproc, shuffle=True, seed=5,
                        num_workers=1, process_shard=(pid, nproc))

    first = engine.batch_to_device(next(iter(loader)))
    state = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0), first)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    # val_batches exercises the multi-process validation loop (per-pair
    # metrics span non-addressable devices; fit reduces them to replicated
    # scalars on device) and the best-val-by-loss selection
    val_loader = PairLoader(DS(), batch_size=8 // nproc, shuffle=False,
                            seed=5, num_workers=1,
                            process_shard=(pid, nproc))
    state = engine.fit(model, opt, cfg, state,
                       train_batches=lambda: loader, epochs=3, mesh=mesh,
                       val_batches=lambda: val_loader)

    leaves = jax.tree_util.tree_leaves(state.params)
    for leaf in leaves:
        assert leaf.sharding.is_fully_replicated, leaf.sharding
    np.savez(out, **{f"p{i}": np.asarray(leaf.addressable_data(0))
                     for i, leaf in enumerate(leaves)})

    # --- phase 2: 2-axis composition — data axis ACROSS processes (DCN),
    # point axis within each process's devices (the multi-host context-
    # parallel regime; fit() routes through the process-aware
    # shard_points_batch) ---
    from se3_equi_graph_registration_tpu.parallel.point_sharding import (
        make_point_sharded_train_step)
    mesh2 = global_mesh({"data": nproc, "point": 2}, dcn_axis="data")
    loader2 = PairLoader(DS(), batch_size=8 // nproc, shuffle=True, seed=5,
                         num_workers=1, process_shard=(pid, nproc))
    first2 = engine.batch_to_device(next(iter(loader2)))
    state2 = engine.init_state(model, opt, cfg, jax.random.PRNGKey(0), first2)
    state2 = jax.device_put(state2, NamedSharding(mesh2, P()))
    ps_step = make_point_sharded_train_step(model, opt, cfg, mesh2)
    state2 = engine.fit(model, opt, cfg, state2,
                        train_batches=lambda: loader2, epochs=2, mesh=mesh2,
                        train_step=ps_step)
    leaves2 = jax.tree_util.tree_leaves(state2.params)
    np.savez(out.replace(".npz", "_2axis.npz"),
             **{f"p{i}": np.asarray(leaf.addressable_data(0))
                for i, leaf in enumerate(leaves2)})
    print(f"worker {pid}/{nproc}: ok ({len(leaves)} param leaves; "
          f"2-axis data x point phase ok)", flush=True)


if __name__ == "__main__":
    main()
