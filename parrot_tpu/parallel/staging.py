"""Multi-host-correct host→device staging.

On a single process, `jax.device_put(x, sharding)` stages a host array
onto every shard. On a multi-host slice (train.py's
`jax.distributed.initialize` branch, BASELINE.json:11 pod-slice config)
that call is wrong twice over: each host only holds its slice of the
global batch, and device_put cannot address the other hosts' shards.
The correct primitive is `jax.make_array_from_process_local_data`,
which assembles one global jax.Array from per-process locals without
any cross-host data movement.

Two entry points:

- `stage_local(tree, shardings)` — leaves are this process's LOCAL
  slice (batch-dim leaves) or full replicated values (scalars, params).
  This is what the per-process data stream produces.
- `stage_global(tree, shardings)` — leaves are GLOBAL host arrays that
  every process holds identically (state templates, restored
  checkpoints); each process carves out its local rows per the
  sharding spec before assembly.

Both degrade to plain `device_put` when `jax.process_count() == 1`, so
the single-host path (and the 8-virtual-device CPU tests) is unchanged.
"""

from __future__ import annotations

import jax
import numpy as np


def _local_row_range(n_rows: int):
    """[lo, hi) of the global batch rows owned by this process.

    Row-block assignment matches JAX's even process sharding: process i
    of P owns rows [i*n/P, (i+1)*n/P). Requires n_rows % P == 0 (the
    Trainer already enforces batch_size % num_devices == 0, which
    implies divisibility by process count on homogeneous hosts).
    """
    pc, pi = jax.process_count(), jax.process_index()
    if n_rows % pc:
        raise ValueError(f"global batch dim {n_rows} not divisible by "
                         f"{pc} processes")
    per = n_rows // pc
    return pi * per, (pi + 1) * per


def stage_local(tree, shardings):
    """Stage a pytree of per-process-local host arrays as global arrays.

    `shardings` is a matching pytree of NamedShardings. Leaves whose
    sharding is fully replicated must hold the full (identical) value on
    every process; leaves sharded along a mesh axis hold only this
    process's rows, and the global shape is inferred by JAX from the
    process span of the sharding.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def stage_leaf(x, sh):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(stage_leaf, tree, shardings)


def stage_global(tree, shardings):
    """Stage a pytree of GLOBAL host arrays every process holds in full.

    For leaves sharded along the leading mesh axis, each process slices
    out its own rows first; replicated leaves pass through whole.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def stage_leaf(x, sh):
        x = np.asarray(x)
        spec = sh.spec
        if x.ndim > 0 and len(spec) > 0 and spec[0] is not None:
            lo, hi = _local_row_range(x.shape[0])
            x = x[lo:hi]
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(stage_leaf, tree, shardings)
