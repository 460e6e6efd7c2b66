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


class ArtifactPoseEstimator:
    """Drop-in ``predict_frames`` provider backed by a saved AOT
    artifact: no model code, no checkpoint, and — the point — no
    per-batch-size XLA recompiles in the serving daemon (an XLA compile
    is minutes on a small host, and the daemon holds its request lock
    throughout).  A symbolic-batch artifact executes any batch size
    directly; a static-batch artifact pads/chunks each request to its
    baked batch size ("pad to bucket")."""

    def __init__(self, path: str):
        self.call = load_pose_program(path)
        exported = self.call.exported
        in_aval = exported.in_avals[0]
        b = in_aval.shape[0]
        self.bucket: Optional[int] = b if isinstance(b, int) else None
        self.frame_shape = tuple(int(s) for s in in_aval.shape[1:])
        out_aval = exported.out_avals[0]
        self.n_joints = int(out_aval.shape[1])

    def predict_frames(self, frames, coms, cubes) -> np.ndarray:
        frames = np.asarray(frames, np.float32)
        coms = np.asarray(coms, np.float32)
        cubes = np.asarray(cubes, np.float32)
        if frames.shape[1:] != self.frame_shape:
            raise ValueError(
                f"frame shape {frames.shape[1:]} != artifact's baked "
                f"{self.frame_shape}")
        n = frames.shape[0]
        if n == 0:  # the bucket loop below would concatenate nothing
            return np.empty((0, self.n_joints, 3), np.float32)
        if self.bucket is None:  # symbolic batch: any size, one call
            return np.asarray(self.call(frames, coms, cubes))
        outs = []
        for i in range(0, n, self.bucket):
            f, c, q = (a[i:i + self.bucket] for a in (frames, coms, cubes))
            k = f.shape[0]
            if k < self.bucket:  # pad the tail chunk to the bucket
                pad = self.bucket - k
                f, c, q = (np.concatenate([a, np.repeat(a[-1:], pad, 0)])
                           for a in (f, c, q))
            outs.append(self.call(f, c, q)[:k])
        return np.concatenate(outs, 0)

    def predict_frame(self, frame, com, cube) -> np.ndarray:
        return self.predict_frames(np.asarray(frame)[None],
                                   np.asarray(com)[None],
                                   np.asarray(cube)[None])[0]
