"""AOT export of the fused serving program (``jax.export`` / StableHLO).

The reference has no deployment story: its "real-time" demo runs the
PyTorch model from a live Python process (SURVEY.md §3.4; reference
README.md:17-19).  Here the entire fused depth->pose program — on-device
CoM crop/normalize -> ``dis.regress_b`` conv trunk -> ``vae.decode`` ->
metric denormalization, with the trained weights baked in as constants —
is serialized to a portable StableHLO artifact.  Any PJRT/IFRT runtime
(a TPU serving container, the tf.saved_model bridge, a C++ loader) can
execute it without Python, model code, or a checkpoint file.

Two export shapes:

* static batch — fastest, one program per batch size;
* symbolic batch (``batch=None``) — one artifact serves every batch
  size via jax.export shape polymorphism.

The artifact records the lowering platforms; export with
``platforms=("tpu", "cpu")`` to produce a single file that loads on
both a TPU pod and a CPU fallback host.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

MAGIC = b"LSPSEXP1"  # file header: format/version tag


def export_pose_program(est, batch: Optional[int] = 1,
                        frame_shape: Tuple[int, int] = (480, 640),
                        platforms: Optional[Sequence[str]] = None):
    """Export ``est`` (a ``serve.inference.PoseEstimator``) as one AOT
    program ``(frames, coms, cubes) -> joints``.

    batch: static batch size, or None for a symbolic batch dimension.
    frame_shape: (H, W) of the raw depth frames.
    platforms: lowering targets, e.g. ("tpu",) or ("tpu", "cpu");
        default = the current default backend.
    Returns a ``jax.export.Exported``.
    """
    if getattr(est, "mesh", None) is not None:
        raise ValueError(
            "export a mesh-free PoseEstimator: a mesh-sharded estimator "
            "would bake multi-device shardings into the artifact, which "
            "then cannot load on a single-device serving host")
    params = est.params  # baked into the module as constants

    def fn(frames, coms, cubes):
        return est._frames_to_pose(params, frames, coms, cubes)

    if batch is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch)
    h, w = frame_shape
    args = (
        jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        jax.ShapeDtypeStruct((b, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, 3), jnp.float32),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax.export.export(jax.jit(fn), **kwargs)(*args)


def save_pose_program(path: str, exported) -> None:
    """Serialize an ``Exported`` to ``path`` (StableHLO + calling
    convention, self-contained)."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(data)


def load_pose_program(path: str):
    """Load a saved artifact; returns a callable
    ``(frames, coms, cubes) -> (B, J, 3) joints`` that runs the
    deserialized program (no model code or checkpoint needed)."""
    with open(path, "rb") as f:
        head = f.read(len(MAGIC))
        if head != MAGIC:
            raise ValueError(f"{path}: not an LSPS export (bad header)")
        data = f.read()
    exported = jax.export.deserialize(bytearray(data))

    def call(frames, coms, cubes):
        out = exported.call(jnp.asarray(frames, jnp.float32),
                            jnp.asarray(coms, jnp.float32),
                            jnp.asarray(cubes, jnp.float32))
        return np.asarray(out)

    call.exported = exported
    return call
