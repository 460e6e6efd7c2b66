"""Checkpoint save/resume.

Mirrors the reference's file conventions (reference:
src/trainers/lsps_trainer.py:278-332 and src/trainers/helpers.py:9-18):

* ``<prefix>_gen_%08d.npz`` / ``<prefix>_dis_%08d.npz`` per-net weights
  (``est_`` prefixed in estimate mode),
* ``<prefix>_vae_%.2f_%08d.npz`` fraction-keyed pose-VAE weights,
* ``<prefix>_optg/_optd_%08d.npz`` optimizer states,
* resume picks the lexicographically-latest matching file and parses the
  iteration count from the name.

Storage is a flat ``.npz`` of path-keyed arrays — a pytree serialization
that needs no pickling of Python objects and loads as a strict overlay
onto a template state (shapes are validated), so partial loads
(``strict=False`` semantics of the reference) are explicit.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Pytree = Any


def _flatten_with_keys(tree) -> Dict[str, np.ndarray]:
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_pytree(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **_flatten_with_keys(tree))


def load_pytree(path: str, template) -> Pytree:
    """Load arrays onto the structure of ``template``; missing keys keep
    template values (mirrors torch ``strict=False``), shape mismatches
    raise."""
    z = np.load(path)
    flat = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for pathspec, leaf in flat[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in pathspec)
        if key in z.files:
            arr = z[key]
            if np.shape(arr) != np.shape(leaf):
                raise ValueError(
                    f"shape mismatch for {key}: {arr.shape} vs "
                    f"{np.shape(leaf)}")
            leaves.append(jnp.asarray(arr, jnp.asarray(leaf).dtype))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def get_model_list(dirname: str, key: str, idx: int = -1) -> Optional[str]:
    """Latest checkpoint file containing ``key`` by lexicographic sort
    (reference helpers.py:9-18)."""
    if not os.path.exists(dirname):
        return None
    models = sorted(
        os.path.join(dirname, f) for f in os.listdir(dirname)
        if os.path.isfile(os.path.join(dirname, f)) and key in f
        and f.endswith(".npz"))
    if not models:
        return None
    return models[idx]


def _parse_iterations(filename: str) -> int:
    m = re.search(r"_(\d{8})\.npz$", filename)
    return int(m.group(1)) if m else 0


class OrbaxStateStore:
    """Async full-state checkpointing via orbax (SURVEY.md §5 plan:
    preemption-resume as a first-class citizen — the save runs in the
    background while training continues; ``wait()`` or the next save
    joins it).

    Stores the ENTIRE train state (4 param trees + 3 optimizer states +
    step) under ``<dir>/state_<step>`` — one atomic unit, unlike the
    reference's per-net pickles with optimizer saves commented out
    (lsps_trainer.py:314-319).
    """

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, state, step: int) -> None:
        # snapshot to host first: the async write must not race with
        # buffer donation by the next training step
        host_state = jax.device_get(state)
        path = os.path.join(self.directory, f"state_{step:08d}")
        self._ckptr.save(path, args=self._args_save(host_state))

    def _args_save(self, state):
        import orbax.checkpoint as ocp

        return ocp.args.StandardSave(state)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        steps = []
        for d in os.listdir(self.directory):
            m = re.match(r"state_(\d{8})$", d)
            if m and os.path.isdir(os.path.join(self.directory, d)):
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    def restore(self, template, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            return template, None
        self.wait()
        path = os.path.join(self.directory, f"state_{step:08d}")
        restored = self._ckptr.restore(
            path, args=ocp.args.StandardRestore(template))
        return restored, step


class CheckpointManager:
    """Reference-parity save/resume over npz pytree files."""

    def save(self, state, snapshot_prefix: str, iterations: int,
             save_opt: bool = True) -> None:
        """Save gen/dis (+optimizers) — lsps_trainer.py:307-319.  Unlike
        the reference (which comments the optimizer saves out), optimizer
        state is saved so preemption-resume is exact.

        Write order matters for crash safety: resume() keys off the gen
        file, so it is written LAST — a save interrupted mid-way (e.g. a
        device fetch killed by preemption) leaves no gen marker for this
        step and resume falls back to the previous complete set."""
        it = iterations + 1
        if save_opt:
            save_pytree(f"{snapshot_prefix}_optg_{it:08d}.npz",
                        state["opt"]["gen"])
            save_pytree(f"{snapshot_prefix}_optd_{it:08d}.npz",
                        state["opt"]["dis"])
        save_pytree(f"{snapshot_prefix}_map_{it:08d}.npz",
                    state["params"]["map"])
        save_pytree(f"{snapshot_prefix}_dis_{it:08d}.npz",
                    state["params"]["dis"])
        save_pytree(f"{snapshot_prefix}_gen_{it:08d}.npz",
                    state["params"]["gen"])

    def save_vae(self, vae_params, snapshot_prefix: str, iterations: int,
                 frac: float) -> None:
        """Fraction-keyed VAE snapshot (lsps_trainer.py:321-323)."""
        save_pytree(f"{snapshot_prefix}_vae_{frac:.2f}_{iterations + 1:08d}"
                    ".npz", vae_params)

    def resume(self, state, snapshot_prefix: str, idx: int = -1,
               load_opt: bool = False, est: bool = False):
        """Load latest gen/dis (+map/opt) checkpoints
        (lsps_trainer.py:278-305). Returns (state, iterations)."""
        dirname = os.path.dirname(snapshot_prefix) or "."
        gen_key = "est_gen" if est else "gen"
        last = get_model_list(dirname, gen_key, idx)
        if last is None:
            return state, 0
        state = dict(state)
        params = dict(state["params"])
        params["gen"] = load_pytree(last, params["gen"])
        iterations = _parse_iterations(last)
        dis_file = get_model_list(dirname, "est_dis" if est else "dis", idx)
        if dis_file:
            params["dis"] = load_pytree(dis_file, params["dis"])
        opt = dict(state["opt"])
        self.last_opt_loaded = False
        if load_opt:
            # Optimizer snapshots must come from the SAME save as the
            # params we just loaded — an interrupted save (params written,
            # opt fetch killed mid-flight) must not silently pair
            # params@N with opt@M<N, which corrupts the Adam moments.
            # Derive the opt paths from the gen file (same prefix family,
            # same step) instead of taking the latest by key.
            try:
                optg = last.replace(f"_{gen_key}_", "_optg_")
                optd = last.replace(f"_{gen_key}_", "_optd_")
                optg = optg if os.path.isfile(optg) else None
                optd = optd if os.path.isfile(optd) else None
                if optg:
                    opt["gen"] = load_pytree(optg, opt["gen"])
                if optd:
                    opt["dis"] = load_pytree(optd, opt["dis"])
                self.last_opt_loaded = bool(optg and optd)
                if not self.last_opt_loaded:
                    print("-----No matching-step optimizer snapshot for "
                          f"{os.path.basename(last)}; optimizer state "
                          "starts fresh")
            except Exception as e:  # tolerate missing/incompatible opt
                print(f"-----Failed to load optimizer parameters! ({e})")
        try:
            map_file = get_model_list(dirname, "map", idx)
            if map_file:
                params["map"] = load_pytree(map_file, params["map"])
        except Exception as e:
            print(f"-----Failed to load map parameters! ({e})")
        state["params"] = params
        state["opt"] = opt
        print(f"Resume from iteration {iterations}")
        return state, iterations

    def load_vae(self, state, snapshot_prefix: str, frac: float):
        """Load latest fraction-keyed VAE (lsps_trainer.py:325-332)."""
        dirname = os.path.dirname(snapshot_prefix) or "."
        last = get_model_list(dirname, f"vae_{frac:.2f}")
        if last is None:
            return state, False
        state = dict(state)
        params = dict(state["params"])
        params["vae"] = load_pytree(last, params["vae"])
        state["params"] = params
        print(f"Loading pretrained VAE parameters from {last}")
        return state, True
