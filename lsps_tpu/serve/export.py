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

And two program surfaces: the standard ``(frames, coms, cubes) ->
joints`` program, or — with ``raw=True`` — ``(frames, cubes) ->
(joints, coms)`` with the on-device CoM detection baked in as well
(the deployment site needs no detector at all).

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
                        platforms: Optional[Sequence[str]] = None,
                        raw: bool = False,
                        frame_dtype=jnp.float32):
    """Export ``est`` (a ``serve.inference.PoseEstimator``) as one AOT
    program ``(frames, coms, cubes) -> joints`` — or, with ``raw=True``,
    ``(frames, cubes) -> (joints, coms)`` with the CoM DETECTION baked
    into the program too (the full live path, no detector needed at the
    deployment site).

    batch: static batch size, or None for a symbolic batch dimension.
    frame_shape: (H, W) of the raw depth frames.
    platforms: lowering targets, e.g. ("tpu",) or ("tpu", "cpu");
        default = the current default backend.
    frame_dtype: dtype of the frames input baked into the artifact.
        ``jnp.uint16`` accepts native sensor millimetre frames and
        converts on device — half the host->device bytes of the
        dominant 480x640 frame plane (the serve program is HBM-bound,
        docs/BENCHMARKS.md); the program's math is unchanged (frames
        are whole millimetres, exactly representable either way).
    Returns a ``jax.export.Exported``.
    """
    if getattr(est, "mesh", None) is not None:
        raise ValueError(
            "export a mesh-free PoseEstimator: a mesh-sharded estimator "
            "would bake multi-device shardings into the artifact, which "
            "then cannot load on a single-device serving host")
    params = est.params  # baked into the module as constants

    if raw:
        def fn(frames, cubes):
            return est._raw_to_pose(params, frames, cubes)
    else:
        def fn(frames, coms, cubes):
            return est._frames_to_pose(params, frames, coms, cubes)

    if batch is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch)
    h, w = frame_shape
    if raw:
        args = (
            jax.ShapeDtypeStruct((b, h, w), frame_dtype),
            jax.ShapeDtypeStruct((b, 3), jnp.float32),
        )
    else:
        args = (
            jax.ShapeDtypeStruct((b, h, w), frame_dtype),
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


def _as_frame_dtype(a, dtype):
    """Cast a client operand to its baked dtype, refusing LOSSY
    float -> integer casts: a uint16-frames artifact fed f32 frames with
    fractional millimetres (or negative / out-of-range sentinels) would
    otherwise C-truncate and wrap into silently wrong depths — and wrong
    joints with a 200 response."""
    dtype = np.dtype(dtype)
    a = np.asarray(a)
    if a.dtype == dtype:
        return a
    if (np.issubdtype(dtype, np.integer)
            and not np.issubdtype(a.dtype, np.integer)):
        info = np.iinfo(dtype)
        bad = (~np.isfinite(a) | (a < info.min) | (a > info.max)
               | (a != np.trunc(a)))
        if bad.any():
            raise ValueError(
                f"this artifact bakes {dtype.name} frames (native sensor "
                f"millimetres) but the request's {a.dtype.name} values "
                f"are not losslessly representable (fractional, "
                f"non-finite, or outside [{info.min}, {info.max}]) — "
                f"send integral mm frames or use a float32 artifact")
    return a.astype(dtype)


def load_pose_program(path: str):
    """Load a saved artifact; returns a callable running the
    deserialized program (no model code or checkpoint needed) —
    ``(frames, coms, cubes) -> (B, J, 3) joints`` for a standard
    artifact, ``(frames, cubes) -> ((B, J, 3) joints, (B, 3) coms)``
    for a raw-detection one (arity is baked in the program)."""
    with open(path, "rb") as f:
        head = f.read(len(MAGIC))
        if head != MAGIC:
            raise ValueError(f"{path}: not an LSPS export (bad header)")
        data = f.read()
    exported = jax.export.deserialize(bytearray(data))

    def call(*args):
        if len(args) != len(exported.in_avals):
            raise ValueError(
                f"artifact takes {len(exported.in_avals)} arrays, "
                f"got {len(args)}")
        # cast each operand to its baked dtype (a uint16-frames
        # artifact wants native millimetre frames, not f32); lossy
        # float->int casts raise instead of silently truncating
        out = exported.call(*(jnp.asarray(_as_frame_dtype(a, av.dtype))
                              for a, av in zip(args, exported.in_avals)))
        return jax.tree_util.tree_map(np.asarray, out)

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
        self.frame_dtype = np.dtype(in_aval.dtype)  # f32 or uint16 mm
        out_aval = jax.tree_util.tree_leaves(exported.out_avals)[0]
        self.n_joints = int(out_aval.shape[1])
        # arity 2 = raw-detection program (frames, cubes) -> (joints,
        # coms); expose predict_raw only then, so capability checks via
        # getattr (e.g. the serving daemon's) stay truthful
        self.raw = len(exported.in_avals) == 2
        if self.raw:
            self.predict_raw = self._predict_raw

    def _bucketed(self, arrays, n):
        """Run ``self.call`` over bucket-padded chunks; yields
        (per-chunk outputs trimmed to real size)."""
        outs = []
        for i in range(0, n, self.bucket):
            chunk = [a[i:i + self.bucket] for a in arrays]
            k = chunk[0].shape[0]
            if k < self.bucket:  # pad the tail chunk to the bucket
                pad = self.bucket - k
                chunk = [np.concatenate([a, np.repeat(a[-1:], pad, 0)])
                         for a in chunk]
            out = self.call(*chunk)
            outs.append(jax.tree_util.tree_map(lambda o: o[:k], out))
        return outs

    def _check_frames(self, frames):
        if frames.shape[1:] != self.frame_shape:
            raise ValueError(
                f"frame shape {frames.shape[1:]} != artifact's baked "
                f"{self.frame_shape}")

    def predict_frames(self, frames, coms, cubes) -> np.ndarray:
        if self.raw:
            raise ValueError(
                "this artifact bakes the raw-detection program "
                "(frames, cubes); use predict_raw / omit 'coms'")
        frames = _as_frame_dtype(frames, self.frame_dtype)
        coms = np.asarray(coms, np.float32)
        cubes = np.asarray(cubes, np.float32)
        self._check_frames(frames)
        n = frames.shape[0]
        if n == 0:  # the bucket loop below would concatenate nothing
            return np.empty((0, self.n_joints, 3), np.float32)
        if self.bucket is None:  # symbolic batch: any size, one call
            return np.asarray(self.call(frames, coms, cubes))
        return np.concatenate(self._bucketed((frames, coms, cubes), n), 0)

    def _predict_raw(self, frames, cubes=None, return_coms: bool = False):
        frames = _as_frame_dtype(frames, self.frame_dtype)
        if cubes is None:
            cubes = np.full((frames.shape[0], 3), 300.0, np.float32)
        cubes = np.asarray(cubes, np.float32)
        self._check_frames(frames)
        n = frames.shape[0]
        if n == 0:
            joints = np.empty((0, self.n_joints, 3), np.float32)
            coms = np.empty((0, 3), np.float32)
        elif self.bucket is None:
            joints, coms = self.call(frames, cubes)
        else:
            outs = self._bucketed((frames, cubes), n)
            joints = np.concatenate([o[0] for o in outs], 0)
            coms = np.concatenate([o[1] for o in outs], 0)
        if return_coms:
            return np.asarray(joints), np.asarray(coms)
        return np.asarray(joints)

    def predict_frame(self, frame, com, cube) -> np.ndarray:
        return self.predict_frames(np.asarray(frame)[None],
                                   np.asarray(com)[None],
                                   np.asarray(cube)[None])[0]
