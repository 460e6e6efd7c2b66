"""In-memory image/label stack builders (legacy API surface).

Reference: src/data/dataset.py:60-158 — DeepPrior-era helpers that turn a
loaded sequence into contiguous (N, 1, 128, 128) image and (N, J, 3)
label stacks.  Our :class:`FrameArrays` already IS a struct-of-arrays, so
these are thin views kept for API completeness (SURVEY.md §2.4 marks
them mostly unused by the training loops).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from lsps_tpu.data.augment import normalize
from lsps_tpu.data.basetypes import FrameArrays


def img_stack_depth_only(arrays: FrameArrays) -> Tuple[np.ndarray,
                                                       np.ndarray]:
    """(N, 1, H, W) normalized depth stack + (N, J, 3) normalized labels
    (reference dataset.py:72-111 semantics: depth to [-1, 1], labels by
    half cube depth)."""
    cube = arrays.cube
    n = len(arrays)
    imgs = np.empty((n, 1) + arrays.dpt.shape[1:], np.float32)
    for i in range(n):
        imgs[i, 0] = normalize(arrays.dpt_mm(i), arrays.com[i], cube)
    labels = arrays.gt3Dcrop / (cube[2] / 2.0)
    return imgs, labels.astype(np.float32)


class SequenceDataset:
    """Minimal legacy-style dataset over one imported sequence
    (reference dataset.py:114-158 per-dataset wrappers)."""

    def __init__(self, arrays: FrameArrays):
        self.arrays = arrays

    def imgStackDepthOnly(self):
        return img_stack_depth_only(self.arrays)

    def __len__(self):
        return len(self.arrays)
