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

import logging
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

log = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[bool, str]:
    """Initialize jax.distributed when running multi-process.

    Returns ``(ok, reason)``: ``(False, "single-process")`` without
    touching jax.distributed when ``num_processes <= 1`` (so the same
    entry points work everywhere), ``(True, "initialized")`` on success,
    and ``(False, "<error>")`` — logged, never swallowed silently — when
    initialization fails.  On TPU pods the arguments are usually
    auto-detected from the environment.
    """
    if num_processes is not None and num_processes <= 1:
        return False, "single-process"
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return True, "initialized"
    except Exception as e:
        reason = f"{type(e).__name__}: {e}"
        log.warning("multihost initialize failed: %s", reason)
        return False, reason


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
