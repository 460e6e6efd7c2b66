"""Torch-free batch loader.

Replaces ``torch.utils.data.DataLoader`` (reference: src/common.py:16-17,
4 workers) with a prefetching iterator: a background thread builds the
next numpy batch while the device computes on the current one — the
host/TPU overlap that matters here, since per-sample work is light
numpy/cv2.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


def _stack(samples):
    first = samples[0]
    if isinstance(first, tuple):
        return tuple(np.stack([s[i] for s in samples]).astype(np.float32)
                     for i in range(len(first)))
    return np.stack(samples).astype(np.float32)


class DataLoader:
    """Iterate minibatches of stacked numpy arrays.

    Matches the reference loader contract: new shuffle order each epoch,
    final short batch included (the loops skip it themselves,
    depth_train.py:143-144).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 seed: int = 0, prefetch: int = 2, drop_last: bool = False,
                 fast: bool = False, fast_backend: str = "native"):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.RandomState(seed)
        # batched augmentation path (one fused call per batch:
        # C++ host kernel or jitted device program); 'step' defers the
        # image work to the training step itself (raw params only)
        self.fast = bool(fast and hasattr(dataset, "enable_fast_augment")
                         and dataset.enable_fast_augment(fast_backend))
        self.raw = bool(self.fast and fast_backend == "step")

    def disable_raw(self) -> None:
        """Fall back from raw ('step') yields to in-loader augmented
        images.  Used by the training CLIs when the PEER loader cannot
        supply warp params (e.g. its dataset has augment off), so the
        training step must consume images from both sides: mixing one
        raw 7-tuple loader with one image loader would feed ragged
        tuples into the image path.  Keeps the fused batched path on
        the always-available 'jax' backend."""
        if not self.raw:
            return
        self.raw = False
        self.fast = bool(self.dataset.enable_fast_augment("jax"))

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # -- input-pipeline checkpointing (absent in the reference) ---------
    def get_state(self) -> dict:
        """Shuffle-RNG state; restoring it resumes the exact epoch
        order sequence where training left off."""
        return {"rng_state": self._rng.get_state()}

    def set_state(self, state: dict) -> None:
        self._rng.set_state(state["rng_state"])

    def _epoch_order(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        return order

    def __iter__(self) -> Iterator:
        return self.iter_from(0)

    def iter_from(self, start_batch: int) -> Iterator:
        """Iterate this epoch starting at ``start_batch`` (mid-epoch
        resume; the epoch permutation is drawn first either way so the
        RNG stream stays aligned)."""
        order = self._epoch_order()
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        cancel = threading.Event()  # set when the consumer abandons us

        def _put(item) -> bool:
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in range(start_batch, nb):
                    if cancel.is_set():
                        return
                    idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                    if self.raw:
                        batch = self.dataset.raw_fast_batch(
                            [int(i) for i in idx])
                    elif self.fast:
                        batch = self.dataset.fast_batch(
                            [int(i) for i in idx])
                    else:
                        batch = _stack([self.dataset[int(i)] for i in idx])
                    if not _put(batch):
                        return
            except Exception as e:  # surface worker errors to the consumer
                _put(e)
            finally:
                _put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # abandoned mid-epoch (zip with a shorter loader, early
            # return): unblock and retire the producer instead of leaking
            # a thread + prefetched batches per epoch
            cancel.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


def get_data_loader(dataset, batch_size: int, shuffle: bool,
                    seed: int = 0) -> DataLoader:
    """Reference-named factory (common.py:16-17).  ``LSPS_AUGMENT``
    selects the augmentation backend: ``host`` (default, per-sample cv2
    bit-parity), ``native`` (fused C++ batch; also via ``LSPS_NATIVE=1``),
    ``jax`` (fused device batch) or ``step`` (warp params only; the
    image work runs inside the jitted training step — one XLA program
    per iteration including augmentation)."""
    import os

    backend = os.environ.get("LSPS_AUGMENT", "").lower()
    if not backend and os.environ.get("LSPS_NATIVE", "0") == "1":
        backend = "native"
    if backend not in ("", "host", "native", "jax", "step"):
        raise ValueError(
            f"LSPS_AUGMENT={backend!r} is not one of host|native|jax|step")
    fast = backend in ("native", "jax", "step")
    return DataLoader(dataset, batch_size, shuffle, seed=seed, fast=fast,
                      fast_backend=backend or "native")


def get_dataset(conf: dict):
    """Registry-dispatch dataset factory (replaces exec at
    common.py:10-14)."""
    from lsps_tpu.registry import lookup

    return lookup("dataset", conf["class_name"])(conf)
