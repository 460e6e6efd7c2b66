"""Load the reference's OWN torch code as a parity oracle.

The reference (/root/reference/src/trainers/) is Python-2-era PyTorch,
but its net definitions (lsps_nets.py, common_net.py, init.py,
helpers.py) parse and run unmodified under this environment's Python 3 /
torch-CPU once three shims are in place:

* ``torch.Tensor.cuda`` / ``nn.Module.cuda`` -> no-ops (the reference
  calls ``.cuda(gpu)`` inside forward paths, lsps_nets.py:77,
  common_net.py:39);
* a stub ``utils.evaluation`` module (lsps_trainer.py:12 imports it but
  the update rules never use it);
* ``lsps_trainer.py`` mixes tabs and spaces (py2 tab == 8 columns), so
  its source is loaded via ``str.expandtabs(8)`` before compiling.

Nothing is copied: the reference modules are imported from their own
files read-only and used purely as a numeric oracle in tests.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_TRAINERS_DIR = "/root/reference/src/trainers"
_PKG = "lsps_reference_oracle"
_cache = {}


def load_reference():
    """Import the reference trainer stack; returns the namespace holding
    ``lsps_nets`` (module) and ``LSPSTrainer`` (class).  Idempotent."""
    if _cache:
        return _cache

    import torch
    import torch.nn as nn

    # cuda no-ops: this box has no CUDA; the reference hard-codes .cuda
    # calls in its forward paths so they must become identities.
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    # lsps_trainer.py:12 `from utils.evaluation import Evaluation` — the
    # symbol is unused by the update rules; stub it rather than dragging
    # the reference's matplotlib-heavy utils package in.
    if "utils.evaluation" not in sys.modules:
        u = sys.modules.get("utils") or types.ModuleType("utils")
        ue = types.ModuleType("utils.evaluation")
        ue.Evaluation = type("Evaluation", (), {})
        u.evaluation = ue
        sys.modules.setdefault("utils", u)
        sys.modules["utils.evaluation"] = ue

    pkg = types.ModuleType(_PKG)
    pkg.__path__ = [REF_TRAINERS_DIR]
    sys.modules[_PKG] = pkg
    nets = importlib.import_module(f"{_PKG}.lsps_nets")

    # lsps_trainer.py needs tab expansion (py2 tabs) before compiling
    path = f"{REF_TRAINERS_DIR}/lsps_trainer.py"
    with open(path) as f:
        src = f.read().expandtabs(8)
    mod = types.ModuleType(f"{_PKG}.lsps_trainer")
    mod.__package__ = _PKG
    mod.__file__ = path
    sys.modules[f"{_PKG}.lsps_trainer"] = mod
    exec(compile(src, path, "exec"), mod.__dict__)

    _cache["nets"] = nets
    _cache["LSPSTrainer"] = mod.LSPSTrainer
    _cache["trainer_mod"] = mod
    return _cache


class zero_noise_torch:
    """Context manager: every torch noise source the reference uses
    (``torch.randn`` in GaussianNoiseLayer, ``torch.normal`` in
    poseVAE.encode) returns zeros, making the stochastic paths
    deterministic for loss-value comparison."""

    def __enter__(self):
        import torch

        self._randn = torch.randn
        self._normal = torch.normal
        torch.randn = lambda *s, **k: torch.zeros(*s)
        torch.normal = lambda mean, std=1.0, **k: torch.zeros_like(mean)
        return self

    def __exit__(self, *exc):
        import torch

        torch.randn = self._randn
        torch.normal = self._normal
        return False
