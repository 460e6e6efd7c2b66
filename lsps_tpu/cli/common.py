"""Shared CLI plumbing for the training entry points."""

from __future__ import annotations

import argparse
import os

# NOTE: the persistent XLA compilation cache is configured once at
# package import (lsps_tpu.__init__._enable_xla_cache, opt-out
# LSPS_XLA_CACHE=0) — do not add a second env-var-based cache config
# here: it would silently override the opt-out and split the cache
# across two directories.

import numpy as np

from lsps_tpu.config import NetConfig
from lsps_tpu.eval import (ICVLHandposeEvaluation, NYUHandposeEvaluation,
                           HandposeEvaluation)
from lsps_tpu.registry import lookup
from lsps_tpu.utils.skeleton import tables_for

# import for registration side effects
import lsps_tpu.data.datasets  # noqa: F401
import lsps_tpu.data.synthetic  # noqa: F401
import lsps_tpu.train.trainer  # noqa: F401


def _positive_int(value: str) -> int:
    """argparse type for flags where 0 would otherwise be silently
    replaced by a default through an ``x or default`` expression."""
    n = int(value)
    if n <= 0:
        raise argparse.ArgumentTypeError(f"must be a positive integer, "
                                         f"got {n}")
    return n


def base_parser(description: str) -> argparse.ArgumentParser:
    """Flags mirroring the reference CLIs (pose_train.py:29-34,
    depth_train.py:26-34); ``--gpu`` becomes ``--device``."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--device", "--gpu", type=int, default=0,
                   help="device index")
    p.add_argument("--resume", type=int, default=0)
    p.add_argument("--frac", type=float, default=1.0,
                   help="fraction of real labels to use")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--log", type=str, default="./logs")
    p.add_argument("--seed", type=int, default=23455)
    p.add_argument("--max-iterations", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="override config batch size (TPU efficiency knob)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--orbax-dir", type=str, default=None,
                   help="async full-state checkpoints (params + optimizer "
                        "+ step) for preemption-safe resume")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute for the conv-heavy updates (params/"
                        "losses stay f32); same as hyperparameters."
                        "compute_dtype: bfloat16")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="data-parallel mesh size: 0 = single device "
                        "(default), -1 = all local devices, N = N devices."
                        " The global batch shards over the mesh's data "
                        "axis; gradients all-reduce over ICI (GSPMD)")
    p.add_argument("--steps-per-call", type=int, default=0,
                   help="train K steps per XLA dispatch (lax.scan over K "
                        "pre-staged batches).  Amortizes per-dispatch "
                        "host overhead K-fold with bit-identical "
                        "numerics; chunks clip to image/snapshot "
                        "cadences.  1 = classic loop; 0 = auto "
                        "(measured: 8 for the dispatch-bound pose step "
                        "~2x wall win, 1 for the large depth steps where "
                        "chunk staging costs more than it saves)")
    p.add_argument("--snapshot-prefix", type=str, default=None,
                   help="override the config's snapshot_prefix (where "
                        "checkpoints are read/written).  Lets one YAML "
                        "drive several runs without copies that differ "
                        "only in the output directory")
    p.add_argument("--sch-interval", type=_positive_int, default=None,
                   help="override the LR scheduler step interval "
                        "(reference: 1000 in pretrain/pose, 100 in "
                        "estimate — depth_train.py:154-164).  Smaller "
                        "values compress the MultiStepLR milestones so "
                        "decay boundaries can be exercised in short runs")
    return p


def select_eval(config_path: str):
    """Evaluation class + skeleton tables by config name
    (pose_train.py:66-75)."""
    color_idx, bones = tables_for(os.path.basename(config_path))
    if "icvl" in config_path:
        return ICVLHandposeEvaluation, color_idx, bones
    if "nyu" in config_path:
        return NYUHandposeEvaluation, color_idx, bones
    return HandposeEvaluation, color_idx, bones


def load_experiment(opts):
    config = NetConfig(opts.config)
    if opts.max_iterations is not None:
        config.hyperparameters["max_iterations"] = opts.max_iterations
    if getattr(opts, "bf16", False):
        config.hyperparameters["compute_dtype"] = "bfloat16"
    if getattr(opts, "snapshot_prefix", None):
        config.snapshot_prefix = opts.snapshot_prefix
    return config


def make_datasets(config):
    from lsps_tpu.data.loader import get_dataset

    ds_a = get_dataset(config.datasets["train_a"])
    ds_b = get_dataset(config.datasets["train_b"])
    ds_test = get_dataset(config.datasets["test_b"])
    return ds_a, ds_b, ds_test


def resolve_steps_per_call(opts, auto: int) -> int:
    """Resolve ``--steps-per-call`` (0 = auto) to a concrete chunk
    size.  ``auto`` is the CLI's measured default: 8 for the
    dispatch-bound pose step (~2x wall win), 1 for the large depth
    steps where chunk staging costs more than the dispatches it saves
    (docs/BENCHMARKS.md round-3).  Scan chunks are single-process only
    (per-host shard staging is not wired)."""
    import jax

    k = auto if opts.steps_per_call == 0 else max(1, opts.steps_per_call)
    if k > 1 and jax.process_count() > 1:
        print("--steps-per-call > 1 is single-process only; using 1 "
              "(per-host shard staging for scan chunks is not wired)")
        k = 1
    return k


def make_trainer(config, sch_interval: int):
    cls = lookup("trainer", config.hyperparameters.get("trainer",
                                                       "LSPSTrainer"))
    # CLI loops thread the state linearly -> donation is safe and
    # halves peak HBM
    return cls(config.hyperparameters, sch_interval=sch_interval,
               donate=True)


class MeshRunner:
    """Data-parallel execution context for the training CLIs.

    The reference trains on exactly one GPU (``trainer.cuda(gpu)``,
    src/depth_train.py:114); this scales the same loop
    (src/depth_train.py:140-166) over a ``jax.sharding.Mesh``: the
    train state is replicated, batch arrays shard over the ``data``
    axis, the update is pjit-compiled once, and XLA/GSPMD inserts the
    gradient all-reduce over ICI.  Multi-process (one process per TPU
    host) feeds per-host shards through
    ``multihost.global_batch_from_host_shards``.
    """

    def __init__(self, n_data: int):
        import jax

        from lsps_tpu.parallel import make_mesh

        n_avail = len(jax.devices())
        if n_data == -1:
            n_data = n_avail
        if n_data < 2:
            raise ValueError(f"--mesh-data {n_data}: need >= 2 devices "
                             "(use 0 for the single-device path)")
        if n_data > n_avail:
            raise ValueError(
                f"--mesh-data {n_data} exceeds the {n_avail} available "
                f"devices ({jax.devices()})")
        self.n_data = n_data
        self.mesh = make_mesh(n_data=n_data)
        self._n_proc = jax.process_count()

    def check_batch(self, batch_size: int, what: str = "batch size"):
        """The global batch must split evenly over the data axis, or
        GSPMD cannot lay it out; fail up front with a clear message."""
        global_batch = batch_size * self._n_proc
        if global_batch % self.n_data != 0:
            raise ValueError(
                f"{what} {batch_size} (global {global_batch} over "
                f"{self._n_proc} process(es)) is not divisible by the "
                f"data-mesh size {self.n_data}")

    def shard_state(self, state):
        from lsps_tpu.parallel import shard_state

        return shard_state(self.mesh, state)

    def wrap(self, update_fn, n_batch_args: int, donate: bool = True,
             batch_axis: int = 0):
        """pjit an update ``(state, *batch, rng) -> (state, ...)`` with
        batch args sharded on ``data``, everything else replicated.
        ``batch_axis=1`` for the multi-step scan updates, whose batch
        args are stacked to ``(K, B, ...)``."""
        from lsps_tpu.parallel import pjit_update

        return pjit_update(update_fn, self.mesh, n_batch_args=n_batch_args,
                           donate_state=donate, batch_axis=batch_axis)

    def place(self, *arrays):
        """Lay host batch arrays onto the mesh, sharded over ``data``."""
        import jax

        if self._n_proc > 1:
            from lsps_tpu.parallel.multihost import (
                global_batch_from_host_shards)

            return global_batch_from_host_shards(self.mesh, arrays)
        from lsps_tpu.parallel import shard_batch

        return shard_batch(self.mesh, *arrays)

    def place_padded(self, *arrays):
        """Pad the leading axis up to a multiple of the mesh size (by
        repeating the last row), shard, and return ``(arrays, n_valid)``
        — for eval batches whose size the mesh doesn't divide (the test
        set's final short batch)."""
        n = int(arrays[0].shape[0])
        pad = (-n) % self.n_data
        if pad:
            arrays = tuple(
                np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], 0)
                for a in arrays)
        out = self.place(*arrays)
        if len(arrays) == 1:
            out = (out,)
        return out, n


def make_mesh_runner(opts):
    """CLI hook: a MeshRunner when ``--mesh-data`` asks for one, else
    None (single-device path, bit-identical to round 2)."""
    n = getattr(opts, "mesh_data", 0)
    if n == 0:
        return None
    return MeshRunner(n)


def chunk_len(it, k, cadences, max_iterations):
    """Plan the next multi-step chunk: the longest n <= k such that no
    cadence boundary (a step whose completion satisfies
    ``(step + 1) % c == 0``) falls strictly INSIDE steps
    ``[it, it + n)`` — a boundary may only land on the chunk's last
    step, after which the caller runs its cadence work (images,
    snapshots, eval) with the chunk's final state and carried outputs.

    The CLIs scan only when the plan returns exactly ``k`` (a single
    compiled K-program); shorter plans near boundaries fall back to the
    already-compiled single-step path until re-aligned, so cadences
    divisible by k never leave the fast path.
    """
    n = max(1, int(k))
    for c in cadences:
        if c and c > 0:
            b = (it + c) // c * c - 1  # first step >= it ending on c
            n = min(n, b - it + 1)
    if max_iterations is not None:
        n = min(n, max_iterations - it)
    return max(n, 1)


def fold_chain(rng, it0, n):
    """The single-step loop's rng chain, pre-folded on the host: keys
    ``[fold(rng, it0), fold(fold(rng, it0), it0+1), ...]`` stacked to
    (n, 2) for a scan chunk.  Returns (stacked keys, final key)."""
    keys = []
    for j in range(n):
        rng = host_fold_in(rng, it0 + j)
        keys.append(rng)
    return np.stack(keys), rng


_HOST_CPU = None


def host_fold_in(key, step: int):
    """``jax.random.fold_in`` computed on the host CPU backend.

    Identical threefry stream to running it on the accelerator, but no
    accelerator dispatch: interleaving a tiny device program with the
    big training step measured ~50 ms/step of extra wall time on the
    tunneled TPU platform (docs/BENCHMARKS.md round-2 profile notes).
    Returns a host numpy key so the training jit treats it as ordinary
    uncommitted input.
    """
    global _HOST_CPU
    import jax

    if _HOST_CPU is None:
        try:
            _HOST_CPU = jax.devices("cpu")[0]
        except RuntimeError:
            _HOST_CPU = False  # no CPU backend registered
    if _HOST_CPU is False:
        # no CPU backend: keep the numpy-key contract (callers rely on
        # it) even though the fold itself must run on the accelerator
        return np.asarray(jax.random.fold_in(key, step))
    with jax.default_device(_HOST_CPU):
        return np.asarray(jax.random.fold_in(np.asarray(key), step))
