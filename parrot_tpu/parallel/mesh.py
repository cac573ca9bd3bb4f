"""Device mesh + sharding layout for data-parallel training.

The reference is single-process single-GPU (SURVEY.md §2.4); scaling here
is native JAX SPMD: a 1-D `data` mesh axis, batches sharded along it,
parameters replicated. Gradient allreduce is inserted by XLA from the
sharded-batch loss mean and rides ICI on a real slice (BASELINE.json:5).
The mesh is built with a trailing `model` axis of size 1 so a tensor-
parallel axis can be introduced later without relayout (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D DP mesh over `num_devices` (0 = all visible devices)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        if num_devices > len(devices):
            raise ValueError(f"requested {num_devices} devices but only "
                             f"{len(devices)} are visible")
        devices = devices[:num_devices]
    arr = np.asarray(devices).reshape(len(devices), 1)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_template) -> "jax.tree":
    """Per-leaf shardings for a data.Batch: batch-dim arrays along 'data',
    scalars replicated."""
    def leaf_sharding(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P("data"))
    return jax.tree.map(leaf_sharding, batch_template)


def state_sharding(mesh: Mesh, state_template) -> "jax.tree":
    """DecoderState is batch-major in every leaf -> shard along 'data'."""
    return jax.tree.map(lambda x: NamedSharding(mesh, P("data")),
                        state_template)
