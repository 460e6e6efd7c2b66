"""Batched augmentation via the native fused kernel.

Semantics of :func:`lsps_tpu.data.augment.augment_crop`
(reference dataset_hand2.py:34-119), restructured for throughput: the
per-sample random draws keep the reference order, but the image work for
a whole batch is ONE call into the fused C++ kernel
(native/lsps_native.cpp): warp + nv-replace + z-clamp + premax sentinel
+ normalize in a single pass per pixel, OpenMP over samples.

Identity used: for raw crops (background 0, values z-thresholded into
[zstart, zend]), denormalize(normalize(x)) maps background to the far
plane — exactly where the premax/zero sentinel rules send it — so the
kernel can consume the raw mm crop directly.

Label math is vectorized numpy (same formulas as the per-sample path).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from lsps_tpu.data.detector import HandDetector
from lsps_tpu.data.transformations import rotate_points_2d

# sentinel constants shared by both backends (recropHand semantics,
# handdetector.py:786-807)
PAD_VALUE = 0.0
NV_VAL = 32000.0


def _rotation_dst_to_src(center, rot_deg):
    """Inverse of cv2.getRotationMatrix2D(center, -rot, 1): rotate dst
    coords by -(-rot) = +(-rot)... the forward warp rotates the image by
    ``rot``; sampling goes the other way."""
    a = np.deg2rad(-rot_deg)
    ca, sa = np.cos(a), np.sin(a)
    cx, cy = center
    # forward (src->dst) matrix of warpAffine with angle -rot:
    fwd = np.array([[ca, sa, (1 - ca) * cx - sa * cy],
                    [-sa, ca, sa * cx + (1 - ca) * cy],
                    [0, 0, 1.0]])
    return np.linalg.inv(fwd)


class FastAugmenter:
    """Batched drop-in for the augment path of a hand dataset.

    Usage::

        fa = FastAugmenter(dataset)
        imgs, labels, coms, Ms, cubes = fa.batch(indices)
    """

    def __init__(self, dataset, backend: str = "native"):
        """backend: 'native' (fused C++ host kernel) or 'jax' (fused
        device program, data/augment_jax.py)."""
        self.ds = dataset
        self.di = dataset.di
        self.hd: HandDetector = dataset.hd
        self.rng = dataset.rng
        self.aug_modes = dataset.aug_modes
        self.backend = backend

    def raw_batch(self, idxs):
        """Per-sample augmentation parameters WITHOUT the image work:
        returns ``(raw, labels, com3d, Ms, cubes)`` where ``raw`` is the
        7-tuple ``(src, minv, com_z, cube_z, premax, zstart, zend)``
        consumed by either fused kernel.  The random draws keep the
        reference order (dataset_hand2.py:70-73); the image warp can
        then run in the C++ kernel, a separate device program, or
        INSIDE the training step itself (trainer.pretrain_update_raw —
        one XLA program per step, no separate augment dispatch)."""
        ds, di, hd = self.ds, self.di, self.hd
        seq = ds.seq
        n = len(idxs)
        h, w = seq.dpt.shape[1:]
        cube0 = seq.cube

        src = np.ascontiguousarray(seq.dpt[idxs], np.float32)
        gt3d = seq.gt3Dcrop[idxs].astype(np.float32)
        com3d = seq.com[idxs].astype(np.float32)
        M0 = seq.M[idxs].astype(np.float64)

        minv = np.tile(np.eye(3)[None], (n, 1, 1))
        Ms = M0.astype(np.float32).copy()
        cubes = np.tile(np.asarray(cube0, np.float32)[None], (n, 1))
        coms2d = di.joint_3d_to_img(com3d).astype(np.float32)
        labels = np.empty_like(gt3d)
        out_com2d = coms2d.copy()

        for k in range(n):
            # reference draw order (dataset_hand2.py:70-73)
            mode = self.rng.randint(0, len(self.aug_modes))
            off = self.rng.randn(3) * 10.0
            rot = self.rng.uniform(-180.0, 180.0)
            sc = abs(1.0 + self.rng.randn() * 0.05)
            name = self.aug_modes[mode]
            com2d = coms2d[k]
            if name == "com":
                new_com = di.joint_3d_to_img(
                    di.joint_img_to_3d(com2d) + off)
                if not (np.allclose(com2d[2], 0)
                        or np.allclose(new_com[2], 0)):
                    Mnew = hd.com_to_transform(new_com, cube0, (h, w))
                    # src->dst = Mnew @ inv(M0); sample dst->src inverse
                    minv[k] = M0[k] @ np.linalg.inv(Mnew)
                    Ms[k] = Mnew
                out_com2d[k] = new_com
                labels[k] = (gt3d[k] + di.joint_img_to_3d(com2d)
                             - di.joint_img_to_3d(new_com)) / (cube0[2] / 2)
            elif name == "rot":
                rotm = np.mod(rot, 360)
                minv[k] = _rotation_dst_to_src((w // 2, h // 2), rotm)
                c3 = di.joint_img_to_3d(com2d)
                j2 = di.joint_3d_to_img(gt3d[k] + c3)
                j2r = rotate_points_2d(j2, com2d[:2], rotm)
                labels[k] = (di.joint_img_to_3d(j2r) - c3) / (cube0[2] / 2)
            elif name == "sc":
                new_cube = np.asarray(cube0, np.float32) * sc
                if not np.allclose(com2d[2], 0):
                    Mnew = hd.com_to_transform(com2d, new_cube, (h, w))
                    minv[k] = M0[k] @ np.linalg.inv(Mnew)
                    Ms[k] = Mnew
                cubes[k] = new_cube
                # normalize by the SCALED cube (dataset_hand2.py:91-93)
                labels[k] = gt3d[k] / (new_cube[2] / 2)
            else:  # none
                labels[k] = gt3d[k] / (cube0[2] / 2)

        com_z = out_com2d[:, 2].astype(np.float32)
        cube_z = cubes[:, 2].astype(np.float32)
        # premax is the pre-augmentation far plane (computed before the
        # warp from the ORIGINAL com/cube, dataset_hand2.py:68); the
        # clamp bounds use the updated com/cube (dataset_hand2.py:111-116)
        premax = (coms2d[:, 2] + np.float32(cube0[2]) / 2.0).astype(
            np.float32)
        zstart = com_z - cube_z / 2.0
        zend = com_z + cube_z / 2.0

        com3d_out = di.joint_img_to_3d(out_com2d).astype(np.float32)
        # minv stays float64: the native kernel does its coordinate math
        # in double; device consumers cast to f32 at trace time
        raw = (src, minv, com_z, cube_z, premax, zstart, zend)
        return raw, labels.reshape(n, -1), com3d_out, Ms, cubes

    def batch(self, idxs) -> Tuple[np.ndarray, ...]:
        raw, labels, com3d_out, Ms, cubes = self.raw_batch(idxs)
        n = labels.shape[0]

        if self.backend == "jax":
            from lsps_tpu.data.augment_jax import (
                device_recrop_normalize_batch)

            imgs = np.asarray(device_recrop_normalize_batch(
                *raw, pad_value=PAD_VALUE, nv_val=NV_VAL))
        else:
            from lsps_tpu import native

            imgs = native.fused_recrop_normalize_batch(
                *raw, pad_value=PAD_VALUE, nv_val=NV_VAL)

        return (imgs[:, None], labels.reshape(n, -1), com3d_out, Ms,
                cubes)


def available(backend: str = "native") -> bool:
    """Whether the given augmentation backend can run here: 'native'
    needs the C++ library (or its numpy fallback builds), 'jax' always
    works."""
    if backend == "jax":
        return True
    from lsps_tpu import native

    return native.available()
