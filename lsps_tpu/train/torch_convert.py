"""One-way converter: released PyTorch checkpoints -> our param pytrees.

The reference ships ``.pkl`` state_dicts (torch.save at
src/trainers/lsps_trainer.py:307-323); parity claims against released
checkpoints require loading them into the NHWC/HWIO layout used here.

Both frameworks mirror the same module structure (attribute names +
sequential indices), so every torch tensor is located by *name*: a torch
key like ``encode_A.3.model.0.weight`` normalizes to
``encode_A.3.0.weight`` (wrapper ``.model`` Sequentials are flattened in
our layer composition), which matches our leaf path
``encode_A/3/0/w``.  The per-leaf transpose is determined by our leaf
key:

* ``w`` 4D  (our HWIO conv)        <- torch OIHW:          perm (2, 3, 1, 0)
* ``wt`` 4D (our HWIO conv-T)      <- torch (I, O, kh, kw): perm (2, 3, 0, 1)
* ``w`` 2D  (our (in, out) linear) <- torch (out, in):      transpose
* ``b``                            <- as-is
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _normalize_torch_name(name: str) -> str:
    """Drop wrapper ``model`` path components: the reference wraps every
    primitive in a one-module Sequential (common_net.py)."""
    parts = [p for p in name.split(".") if p != "model"]
    return ".".join(parts)


def _our_leaf_name(pathspec) -> str:
    parts = []
    for p in pathspec:
        k = getattr(p, "key", None)
        if k is None:
            k = getattr(p, "idx", p)
        parts.append(str(k))
    # our leaf keys -> torch parameter names
    tail = {"w": "weight", "wt": "weight", "b": "bias"}.get(parts[-1],
                                                            parts[-1])
    return ".".join(parts[:-1] + [tail]), parts[-1]


def convert_state_dict(state_dict: Dict[str, Any], template) -> Any:
    """Map a torch state_dict onto ``template``'s structure by name."""
    tensors = {
        _normalize_torch_name(k): np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()}
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    missing = []
    for pathspec, leaf in flat:
        name, our_key = _our_leaf_name(pathspec)
        if name not in tensors:
            missing.append(name)
            leaves.append(leaf)
            continue
        t = tensors[name]
        tgt_shape = np.shape(leaf)
        if our_key == "w" and t.ndim == 4:
            t = t.transpose(2, 3, 1, 0)      # OIHW -> HWIO
        elif our_key == "wt" and t.ndim == 4:
            t = t.transpose(2, 3, 0, 1)      # IOHW -> HWIO
        elif our_key == "w" and t.ndim == 2:
            t = t.T                           # (out, in) -> (in, out)
        if t.shape != tgt_shape:
            raise ValueError(
                f"shape mismatch at {name}: torch {t.shape} vs template "
                f"{tgt_shape}")
        # jnp.array (copy=True): on CPU, jnp.asarray can ZERO-COPY the
        # torch tensor's numpy view, silently aliasing our params to
        # torch's storage — a later in-place torch optimizer step would
        # mutate the converted pytree (caught by the reference-oracle
        # parity tests, tests/test_reference_oracle_parity.py).
        leaves.append(jnp.array(t, jnp.asarray(leaf).dtype))
    if missing:
        print(f"torch_convert: {len(missing)} leaves kept from template "
              f"(first: {missing[:3]})")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def to_state_dict(params, like: Dict[str, Any] = None) -> Dict[str, Any]:
    """Inverse converter: our param pytree -> torch-layout state_dict.

    Lets parity be checked from torch tooling too (load our trained
    weights into the reference nets).  Without ``like``, keys use the
    normalized names (wrapper ``.model`` Sequentials flattened).  Pass
    ``like`` = a state_dict of the target torch module to emit ITS key
    spelling, so ``module.load_state_dict(to_state_dict(p, like=sd))``
    works with strict=True.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out: Dict[str, Any] = {}
    for pathspec, leaf in flat:
        name, our_key = _our_leaf_name(pathspec)
        t = np.asarray(leaf)
        if our_key == "w" and t.ndim == 4:
            t = t.transpose(3, 2, 0, 1)      # HWIO -> OIHW
        elif our_key == "wt" and t.ndim == 4:
            t = t.transpose(2, 3, 0, 1)      # (kh, kw, I, O) -> IOHW
        elif our_key == "w" and t.ndim == 2:
            t = t.T                           # (in, out) -> (out, in)
        out[name] = t
    if like is not None:
        norm_to_orig = {_normalize_torch_name(k): k for k in like}
        out = {norm_to_orig.get(k, k): v for k, v in out.items()}
    return out


def load_torch_checkpoint(path: str, template) -> Any:
    """Load a torch-saved state_dict file and convert it."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_state_dict(sd, template)
