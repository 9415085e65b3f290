"""Multi-host / multi-slice execution layer (SURVEY.md §7.8).

The reference is strictly single-process single-GPU (§2.5: no DDP/NCCL/MPI).
This module provides the TPU-native equivalent for pod-scale runs:

- `init_distributed()` — `jax.distributed.initialize` with env fallbacks
  (JAX on TPU pods auto-discovers; explicit args cover GPU/CPU clusters);
- `global_mesh()` — one mesh over every process's devices; when `dcn_axis`
  is set, a hybrid DCN×ICI mesh (`mesh_utils.create_hybrid_device_mesh`) so
  the data axis crosses slices over DCN while point/model axes stay on ICI;
- `host_local_to_global()` — assemble a globally-sharded batch from each
  process's LOCAL shard (`jax.make_array_from_process_local_data`), the
  multi-host input-pipeline pattern: every host loads only its slice;
- `PairLoader(process_shard=...)` (data/pipeline.py) partitions the sample
  index space disjointly across processes with a shared shuffle seed.

Everything degrades to a no-op on a single process, so the same train script
runs unmodified from 1 chip to a multi-slice pod.
"""
from __future__ import annotations

import os
from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed if this looks like a multi-process run.

    Returns True if distributed mode is active. Safe to call repeatedly and
    on single-process runs (no-op). TPU pods auto-populate the arguments;
    explicit values / JAX_COORDINATOR_ADDRESS-style env vars cover the rest.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        # No explicit multi-process config. Only NOW may we touch the
        # backend (jax.process_count() initializes it, after which
        # jax.distributed.initialize would refuse to run).
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized (repeat call) — report the live state
    return jax.process_count() > 1


def global_mesh(axes: Mapping[str, int] | None = None,
                dcn_axis: Optional[str] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over ALL processes' devices.

    axes: name → size over the global device count (default: one 'data'
    axis). dcn_axis: which named axis crosses slices/hosts over DCN — that
    axis gets the slice-granularity factor of a hybrid mesh; all other axes
    ride ICI. Layout rule of thumb: put pure data parallelism on DCN, keep
    point/tensor axes inside a slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh axes {dict(axes)} need {int(np.prod(sizes))} "
                         f"devices, have {len(devices)}")
    if dcn_axis is not None and jax.process_count() > 1:
        if dcn_axis not in axes:
            raise ValueError(f"dcn_axis {dcn_axis!r} not in axes {dict(axes)}")
        # Granule choice: multi-SLICE TPU pods carry distinct slice_index
        # attributes and the DCN boundary is the SLICE; CPU/GPU clusters and
        # single-slice multi-host TPUs have one (or no) slice, so the DCN
        # boundary is the PROCESS (discovered the hard way by the real
        # 2-process test: slice-granule grouping off-TPU raises 'Number of
        # slices 1 must equal ...'). The dcn mesh dimension must be sized by
        # the GRANULE count either way — a multi-slice pod with several hosts
        # per slice has n_proc > n_slices.
        slices = {getattr(d, "slice_index", None) for d in devices}
        process_granule = len(slices) <= 1
        n_granules = jax.process_count() if process_granule else len(slices)
        if axes[dcn_axis] % n_granules != 0:
            raise ValueError(
                f"axis {dcn_axis!r}={axes[dcn_axis]} must divide by the "
                f"DCN granule count {n_granules} "
                f"({'processes' if process_granule else 'slices'})")
        ici = dict(axes)
        dcn = {k: 1 for k in axes}
        ici[dcn_axis] = axes[dcn_axis] // n_granules
        dcn[dcn_axis] = n_granules
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=[ici[k] for k in names],
            dcn_mesh_shape=[dcn[k] for k in names],
            devices=devices, process_is_granule=process_granule)
        return Mesh(dev_array, names)
    dev_array = mesh_utils.create_device_mesh(sizes, devices=devices)
    return Mesh(dev_array, names)


def host_local_to_global(batch, mesh: Mesh, axis: str = "data"):
    """Assemble globally-[axis]-sharded arrays from each process's LOCAL
    batch shard (jax.make_array_from_process_local_data). On a single
    process this equals a plain sharded device_put."""
    sharding = NamedSharding(mesh, P(axis))

    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(sharding, a)

    return jax.tree_util.tree_map(put, batch)


def process_shard_info() -> tuple[int, int]:
    """(process_index, process_count) for data-loader sharding."""
    return jax.process_index(), jax.process_count()
