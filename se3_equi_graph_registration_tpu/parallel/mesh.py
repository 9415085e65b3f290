"""Device-mesh setup and sharding helpers.

The layer the reference entirely lacks (SURVEY.md §2.5: no DDP/NCCL/MPI — a
single cuda:0 process with Python batch loops). Here distribution is
first-class: a `jax.sharding.Mesh` over ICI with named axes

  'data'  — pair-batch data parallelism (v5e-8 target config)
  'point' — point-axis sharding for dense 8-16K-point clouds (the sequence-
            parallel analog; see point_sharding.py)

All collectives are XLA collectives inserted by pjit/shard_map from sharding
annotations — never hand-written sends.
"""
from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Mapping[str, int] | None = None,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a mesh over `devices` (default: all) with named axis sizes.

    axes=None uses every device on a single 'data' axis. Axis sizes must
    multiply to the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh axes {dict(axes)} need {int(np.prod(sizes))} devices, "
            f"have {len(devices)}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for [B, ...] arrays: batch dim split over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pair_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put every [B, ...] leaf of a pytree with the batch axis sharded."""
    sh = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)


def local_mesh_for_testing(n: int = 8) -> Mesh:
    """Mesh over the first n devices (tests use the 8-device virtual CPU)."""
    return make_mesh({"data": n}, jax.devices()[:n])
