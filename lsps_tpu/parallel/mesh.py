"""Device mesh + sharding rules.

The reference is single-GPU (SURVEY.md §2.8: ``trainer.cuda(gpu)`` pins
one device, no torch.distributed anywhere).  The TPU-native design scales
by data parallelism over ICI: a 1-D (or 2-D) ``jax.sharding.Mesh``, batch
arrays sharded on the ``data`` axis, parameters/optimizer state
replicated.  Updates are batch-mean losses, so under GSPMD the gradient
all-reduce is inserted by XLA automatically — no hand-written
collectives.  An optional ``model`` axis is exposed for headroom (models
here are small; it shards the widest conv channels if ever needed).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``
on TPU slices; per-host input sharding comes from
``shard_batch`` which lays host-local arrays onto the global mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Create an (data, model) mesh over available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host batch arrays sharded over the data axis."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_state(mesh: Mesh, state):
    """Replicate the train state across the mesh."""
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def pjit_update(update_fn, mesh: Mesh, n_batch_args: int,
                static_argnames: Sequence[str] = (),
                donate_state: bool = True, batch_axis: int = 0):
    """jit an update ``(state, *batch, rng, **static) -> (state, ...)``
    with batch args sharded on ``data`` and everything else replicated.

    XLA/GSPMD inserts the gradient all-reduce over ICI; parameters stay
    replicated so each step is one compiled program.

    ``batch_axis=1`` shards the SECOND axis of each batch arg instead —
    the layout of the multi-step scan updates (``trainer.*_scan``),
    whose inputs are stacked to ``(K, B, ...)`` with K steps scanned
    sequentially on every device and B sharded over ``data``.
    """
    rep = replicated(mesh)
    bsh = NamedSharding(mesh, P(*([None] * batch_axis + ["data"])))
    in_shardings = (rep,) + (bsh,) * n_batch_args + (rep,)
    return jax.jit(update_fn, in_shardings=in_shardings,
                   static_argnames=tuple(static_argnames),
                   donate_argnums=(0,) if donate_state else ())


def tp_param_shardings(mesh: Mesh, state, min_out_ch: int = 512):
    """Tensor-parallel sharding rules for the ``model`` axis.

    The reference has no model sharding (single GPU, SURVEY.md §2.8) and
    these models fit one chip, so this is scaling headroom: conv/linear
    kernels with a large output-channel dimension shard that dimension
    over ``model`` (their biases too); everything else replicates.
    GSPMD keeps the wide trunk activations channel-sharded and inserts
    the collectives at the narrow heads automatically.

    Returns a pytree of NamedSharding matching ``state``.
    """
    n_model = mesh.shape["model"]

    def rule(path, leaf):
        shape = np.shape(leaf)
        if n_model > 1:
            if len(shape) == 4 and shape[-1] % n_model == 0 \
                    and shape[-1] >= min_out_ch:
                return NamedSharding(mesh, P(None, None, None, "model"))
            if len(shape) == 1 and shape[0] % n_model == 0 \
                    and shape[0] >= min_out_ch:
                return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, state)


def shard_state_tp(mesh: Mesh, state, min_out_ch: int = 512):
    """Place a state with tensor-parallel kernels over the model axis."""
    sh = tp_param_shardings(mesh, state, min_out_ch)
    return jax.tree_util.tree_map(jax.device_put, state, sh)
