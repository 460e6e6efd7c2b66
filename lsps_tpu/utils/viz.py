"""Visualization: skeleton overlays, image strips, videos.

Reference: ``visPair`` (src/pose_train.py:39-60, src/depth_train.py:38-60),
image-strip saving (depth_train.py:174-184), eval video
(depth_train.py:195-246).
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

from lsps_tpu.data.transformations import transform_points_2d
from lsps_tpu.utils.skeleton import FIG_COLOR


def vis_pair(camera, depth, pose=None, trans=None, com=None, cube=None,
             color_idx=None, bones=None) -> np.ndarray:
    """Render one 128x128 normalized depth crop with an optional skeleton
    overlay (reference visPair).  ``depth`` is (1, H, W) or (H, W, 1) in
    [-1, 1]; ``pose`` is a flat normalized pose."""
    img = np.asarray(depth).reshape(128, 128, 1).copy()
    img = ((img + 1) * 127.5).astype("uint8")
    img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    if pose is None:
        return img

    pose = np.asarray(pose).reshape(-1, 3)
    com = np.asarray(com).reshape(-1)[:3]
    cube = np.asarray(cube).reshape(-1)
    gtorig = camera.to_img(pose * (cube[0] / 2.0) + com)
    gtcrop = transform_points_2d(gtorig, trans)

    pts = [(int(p[0]), int(p[1])) for p in gtcrop]
    for idx, pt in enumerate(pts):
        c = FIG_COLOR[color_idx[idx]] if color_idx is not None \
            else (0, 255, 0)
        cv2.circle(img, pt, 2, c, -1)
    if bones and len(pts) > 1:
        for b in bones:
            cv2.line(img, pts[b[0]], pts[b[1]], b[2], 1)
    return img


def save_image_strip(strip, path) -> None:
    """Save an assembled NHWC strip in [-1, 1] (reference saves
    ``data / 2 + 0.5`` via torchvision, depth_train.py:176)."""
    arr = np.asarray(strip)
    if arr.ndim == 4:
        arr = arr[0]
    img = np.clip((arr / 2.0 + 0.5) * 255.0, 0, 255).astype("uint8")
    if img.shape[-1] == 1:
        img = img[..., 0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, img)


class EvalVideoWriter:
    """XVID AVI of gt-vs-pred pairs (depth_train.py:195-196,220,246)."""

    def __init__(self, path, fps=25, size=(128 * 2, 128)):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        codec = cv2.VideoWriter_fourcc(*"XVID")
        self.vid = cv2.VideoWriter(path, codec, fps, size)

    def write_pair(self, real_img, est_img) -> None:
        self.vid.write(np.hstack((real_img, est_img)).astype("uint8"))

    def release(self) -> None:
        self.vid.release()
