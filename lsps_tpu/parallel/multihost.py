"""Multi-host initialization for TPU slices.

The reference is single-process (SURVEY.md §2.8).  On a multi-host TPU
slice, call :func:`initialize` once at program start; afterwards
``jax.devices()`` spans the slice and the mesh/sharding utilities in
:mod:`lsps_tpu.parallel.mesh` work unchanged (collectives ride ICI).

Per-host input: each host feeds its local shard of the global batch;
``global_batch_from_host_shards`` assembles the global array from
host-local data (the standard single-controller JAX recipe).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    No-ops (returns False) in single-process runs so the same entry
    points work everywhere.  On TPU pods the arguments are usually
    auto-detected from the environment.
    """
    try:
        if num_processes is not None and num_processes <= 1:
            return False
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return True
    except Exception as e:
        print(f"multihost initialize skipped: {e}")
        return False


def global_batch_from_host_shards(mesh, host_arrays: Sequence[np.ndarray]):
    """Assemble a global batch array from per-host local shards.

    ``host_arrays`` is this process's local data (one array per batch
    field); returns global jax.Arrays sharded over the ``data`` axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    out = []
    for local in host_arrays:
        global_shape = (local.shape[0] * jax.process_count(),
                        *local.shape[1:])
        arr = jax.make_array_from_process_local_data(sharding, local,
                                                     global_shape)
        out.append(arr)
    return tuple(out) if len(out) > 1 else out[0]
