"""Metrics logging and run artifacts.

Reference: src/common.py:19-80 — snapshot/image folder prep, HTML
gallery, and ``write_loss`` which reflects trainer attrs containing
``loss``/``acc`` into TensorBoard scalars.  Here updates return a metrics
dict, so ``write_loss`` logs every entry (same names), to tensorboardX if
available, else JSONL.  Also includes jax.profiler trace hooks (the
reference has no profiler, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import numpy as np


def prepare_snapshot_folder(snapshot_prefix: str) -> str:
    d = os.path.dirname(snapshot_prefix) or "."
    os.makedirs(d, exist_ok=True)
    return d


def prepare_image_folder(snapshot_directory: str) -> str:
    d = os.path.join(snapshot_directory, "images")
    os.makedirs(d, exist_ok=True)
    return d


def prepare_snapshot_and_image_folder(snapshot_prefix: str, iterations: int,
                                      image_save_iterations: int,
                                      all_size: int = 1536):
    snap = prepare_snapshot_folder(snapshot_prefix)
    img = prepare_image_folder(snap)
    write_html(os.path.join(snap, "index.html"), iterations + 1,
               image_save_iterations, img, all_size)
    return img, snap


def write_html(filename: str, iterations: int, image_save_iterations: int,
               image_directory: str, all_size: int = 1536) -> None:
    """Auto-refreshing gallery of generated strips (common.py:37-69)."""
    parts = [
        "<!DOCTYPE html><html><head>",
        "<title>LSPS-TPU training gallery</title>",
        '<meta content="1" http-equiv="refresh">',
        "</head><body>",
        "<h3>current</h3>",
        f'<p><a href="{image_directory}/gen.jpg">'
        f'<img src="{image_directory}/gen.jpg" style="width:{all_size}px">'
        "</a><br><p>",
    ]
    for j in range(iterations, image_save_iterations - 1, -1):
        if j % image_save_iterations == 0:
            img = f"{image_directory}/gen_{j:08d}.jpg"
            parts.append(f"<h3>iteration [{j}]</h3>")
            parts.append(f'<p><a href="{img}"><img src="{img}" '
                         f'style="width:{all_size}px"></a><br><p>')
    parts.append("</body></html>")
    with open(filename, "w") as f:
        f.write("\n".join(parts))


class MetricsWriter:
    """Scalar logger: tensorboardX when present, JSONL always."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self.tb = None
        try:
            import tensorboardX

            self.tb = tensorboardX.SummaryWriter(logdir)
        except Exception:
            pass

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(np.asarray(v))
            except Exception:
                continue
            if self.tb is not None:
                self.tb.add_scalar(k, rec[k], step)
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()

    def close(self) -> None:
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


def write_loss(iterations: int, max_iterations: int,
               metrics: Dict[str, float], writer: MetricsWriter,
               elapsed_time: float) -> None:
    """Reference-named loop hook (common.py:71-80): prints progress and
    logs every loss/acc metric."""
    print(f"Iteration: {iterations + 1:08d}/{max_iterations:08d} "
          f"{elapsed_time:.2f}s")
    writer.write(iterations + 1,
                 {k: v for k, v in metrics.items()
                  if "loss" in k or "acc" in k or k.endswith("_lr")})


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-window step time / throughput tracker."""

    def __init__(self):
        self.t0 = time.time()
        self.steps = 0

    def tick(self, n: int = 1):
        self.steps += n

    def window(self):
        dt = time.time() - self.t0
        sps = self.steps / dt if dt > 0 else 0.0
        self.t0 = time.time()
        self.steps = 0
        return dt, sps
