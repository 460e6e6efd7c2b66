"""Fused depth -> pose inference and generative sampling.

The deployed path of the reference (SURVEY.md §3.4, src/depth_train.py
:197-206): crop -> normalize -> ``dis.regress_b`` -> ``vae.decode`` ->
denormalize.  Here the whole chain is ONE jitted XLA program
(optionally including on-device preprocessing), targeting the <=1 ms /
frame north star on a single TPU chip.

Also provides the latent-walk generative sampler behind the reference's
NYU walk GIF (README.md:25-26): interpolate z codes and decode both
domains through the generator.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from lsps_tpu.data.camera import Camera
from lsps_tpu.models import build_model
from lsps_tpu.serve.preprocess_jax import crop_normalize_batch


class PoseEstimator:
    """Single-program depth->pose estimator.

    Construct from a trained state (``params`` with ``dis`` and ``vae``)
    and the experiment hyperparameters.
    """

    def __init__(self, hyp: dict, params, camera: Optional[Camera] = None,
                 domain: str = "b", dtype=jnp.float32, mesh=None,
                 warp: Optional[str] = None):
        """``dtype=jnp.bfloat16`` casts the conv-trunk weights and
        activations to bf16 ONCE at construction; the pose decode stays
        float32.  MEASURED (real chip, rounds 4-5): at batch 1 the two
        dtypes are within per-dispatch platform noise of each other
        (r4 single samples read bf16 42% slower; the r5 slope-based
        medians read it 33% faster, IQRs overlapping) — the trunk's
        small spatial dims leave the MXU under-occupied either way, so
        dtype choice does not matter at b1.  bf16 wins clearly in the
        large-batch throughput regime (halved weight/activation HBM
        traffic).  bench.py measures both with error bars and reports
        the min (docs/BENCHMARKS.md round ledger).

        ``mesh``: an optional ``jax.sharding.Mesh`` with a ``data`` axis
        for throughput serving — weights replicate, the batch shards
        over ``data``, and GSPMD splits the whole fused program (crop/
        normalize included) across chips with no host involvement.  The
        reference serves one frame from one GPU (SURVEY.md §3.4).

        ``warp``: crop warp lowering, ``"gather"``, ``"einsum"`` or
        ``"pallas"`` (see serve/preprocess_jax.py and ops/pallas/
        warp.py); default from ``LSPS_SERVE_WARP`` env, else "einsum".
        The round-3 A/B on the real chip (scripts/serve_ab.sh,
        docs/BENCHMARKS.md) showed XLA lowers the in-program
        elementwise gather to a scalar loop here exactly as it did in
        the training augment: einsum is 11x faster at batch 32 (0.68 vs
        7.3 ms device) and 34x at batch 256, with bit-identical outputs
        (tests/test_preprocess_jax.py).  "pallas" fuses the warp +
        normalize tail into one kernel per frame; the on-chip A/B vs
        einsum is scripts/serve_warp_ab.py (docs/BENCHMARKS.md "Pallas
        warp A/B")."""
        import os
        self.warp = warp or os.environ.get("LSPS_SERVE_WARP", "einsum")
        self.dis = build_model(hyp["dis"])
        self.vae = build_model(hyp["vae"])
        self.camera = camera or Camera.nyu()
        self.domain = domain
        self.dtype = dtype
        if dtype != jnp.float32:
            params = dict(params)
            params["dis"] = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, dtype), params["dis"])
        self.params = params
        regress = (self.dis.regress_b if domain == "b"
                   else self.dis.regress_a)

        def _crops_to_pose(params, crops):
            """(B, 128, 128, 1) normalized crops -> (B, reg_dim) pose."""
            crops = crops.astype(dtype)
            _, post, _ = regress(params["dis"], crops)
            return self.vae.decode(params["vae"], post.astype(jnp.float32))

        def _frames_to_pose(params, frames, coms, cubes):
            """Raw frames + CoMs -> metric 3D joints, fully on device.

            ``frames`` may be uint16 millimetre depth (native sensor
            format): the f32 conversion happens HERE, on device, so the
            host->device transfer and the program's dominant HBM read
            of the 480x640 frame plane move half the bytes (the serve
            program is HBM-bound at full batch, docs/BENCHMARKS.md)."""
            frames = frames.astype(jnp.float32)
            crops, _ = crop_normalize_batch(frames, coms, cubes,
                                            self.camera.fx, self.camera.fy,
                                            warp=self.warp)
            pose = _crops_to_pose(params, crops[..., None])
            j = pose.reshape(pose.shape[0], -1, 3)
            com3d = jax.vmap(self.camera.img_to_3d)(coms)
            return j * (cubes[:, 2:3, None] / 2.0) + com3d[:, None, :]

        def _raw_to_pose(params, frames, cubes):
            """Raw frames -> ON-DEVICE detection -> joints: the full
            live path (detect + crop + regress + decode) as one
            program, no CoM argument (reference's host-side
            handdetector.detect at SURVEY §3.4 made device-resident)."""
            from lsps_tpu.serve.detect_jax import device_detect_batch

            frames = frames.astype(jnp.float32)  # uint16 mm ok, see above
            coms = device_detect_batch(frames, cubes, self.camera.fx,
                                       self.camera.fy)
            return _frames_to_pose(params, frames, coms, cubes), coms

        if mesh is None:
            self._crops_to_pose = jax.jit(_crops_to_pose)
            self._frames_to_pose = jax.jit(_frames_to_pose)
            self._raw_to_pose = jax.jit(_raw_to_pose)
        else:
            from lsps_tpu.parallel.mesh import batch_sharding, replicated
            rep, bsh = replicated(mesh), batch_sharding(mesh)
            self.params = jax.device_put(self.params, rep)
            self._crops_to_pose = jax.jit(
                _crops_to_pose, in_shardings=(rep, bsh), out_shardings=bsh)
            self._frames_to_pose = jax.jit(
                _frames_to_pose, in_shardings=(rep, bsh, bsh, bsh),
                out_shardings=bsh)
            self._raw_to_pose = jax.jit(
                _raw_to_pose, in_shardings=(rep, bsh, bsh),
                out_shardings=(bsh, bsh))
        self.mesh = mesh

    # ------------------------------------------------------------------
    def _check_batch(self, n: int):
        """Sharded serving requires batch % data-axis == 0; fail with a
        clear message instead of GSPMD's divisibility error."""
        if self.mesh is not None:
            nd = self.mesh.shape["data"]
            if n % nd != 0:
                raise ValueError(
                    f"batch {n} not divisible by the mesh data axis "
                    f"({nd}); pad the batch or use an unsharded "
                    "PoseEstimator for small requests")

    def predict_crops(self, crops) -> np.ndarray:
        """Normalized (B, 128, 128, 1) crops -> (B, J*3) normalized pose."""
        self._check_batch(np.shape(crops)[0])
        return np.asarray(self._crops_to_pose(self.params,
                                              jnp.asarray(crops)))

    @staticmethod
    def _frames_host(frames) -> np.ndarray:
        """uint16 mm frames pass through natively (half the H2D bytes
        of the dominant frame plane; converted on device), everything
        else converts to f32 on the host as before."""
        frames = np.asarray(frames)
        if frames.dtype == np.uint16:
            return frames
        return np.asarray(frames, np.float32)

    def predict_frames(self, frames, coms, cubes) -> np.ndarray:
        """Raw (B, H, W) frames + (B, 3) CoMs + (B, 3) cubes ->
        (B, J, 3) metric joints (mm). One XLA program.  ``frames`` may
        be uint16 millimetre depth (native sensor format)."""
        self._check_batch(np.shape(frames)[0])
        return np.asarray(self._frames_to_pose(
            self.params, jnp.asarray(self._frames_host(frames)),
            jnp.asarray(coms, jnp.float32), jnp.asarray(cubes, jnp.float32)))

    def predict_frame(self, frame, com, cube) -> np.ndarray:
        return self.predict_frames(frame[None], np.asarray(com)[None],
                                   np.asarray(cube)[None])[0]

    def predict_raw(self, frames, cubes=None, return_coms: bool = False):
        """Raw (B, H, W) frames -> (B, J, 3) metric joints with the CoM
        DETECTED on device (one XLA program end-to-end; no detector
        argument).  ``cubes`` defaults to a 300 mm cube per frame.  A
        frame where detection fails (no qualifying depth slice) returns
        a zero CoM and, consequently, degenerate joints — callers can
        screen with ``return_coms=True``.  ``frames`` may be uint16
        millimetre depth (native sensor format)."""
        frames = self._frames_host(frames)
        if cubes is None:
            cubes = np.full((frames.shape[0], 3), 300.0, np.float32)
        self._check_batch(frames.shape[0])
        joints, coms = self._raw_to_pose(
            self.params, jnp.asarray(frames),
            jnp.asarray(cubes, jnp.float32))
        if return_coms:
            return np.asarray(joints), np.asarray(coms)
        return np.asarray(joints)


def latent_walk(gen, gen_params, z_start, z_end, steps: int = 16,
                rng=None):
    """Decode an interpolation path through the generator's shared latent
    (the generative result of the reference, README.md:25-26).

    z_*: (H, W, C) shared-latent feature maps (e.g. from gen.encode).
    Returns (steps, H, W, 1) arrays for both domains.
    """
    ts = jnp.linspace(0.0, 1.0, steps)[:, None, None, None]
    zs = (1 - ts) * z_start[None] + ts * z_end[None]
    out_a, out_b = jax.jit(
        lambda p, z: gen.decode(p, z))(gen_params, zs)
    return np.asarray(out_a), np.asarray(out_b)
