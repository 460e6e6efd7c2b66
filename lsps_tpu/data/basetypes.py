"""Core data containers.

``DepthFrame`` mirrors the reference namedtuple field-for-field
(reference: src/data/basetypes.py:34-37).  ``FrameArrays`` is the
TPU-native struct-of-arrays form: one contiguous array per field, ready
to be sliced into device batches without per-sample Python work.
"""

from __future__ import annotations

import dataclasses
from collections import namedtuple
from typing import Any, Dict, List, Optional

import numpy as np

DepthFrame = namedtuple(
    "DepthFrame",
    ["dpt", "gtorig", "gtcrop", "T", "gt3Dorig", "gt3Dcrop", "com",
     "fileName", "subSeqName", "side", "extraData"],
)

NamedImgSequence = namedtuple("NamedImgSequence", ["name", "data", "config"])


@dataclasses.dataclass
class FrameArrays:
    """Struct-of-arrays storage for a loaded sequence.

    dpt:      (N, H, W) float32 cropped depth (mm, 0 = background)
    gtorig:   (N, J, 3) joints in original image coords (u, v, d)
    gtcrop:   (N, J, 3) joints in crop coords
    M:        (N, 3, 3) crop transforms
    gt3Dorig: (N, J, 3) metric joints (mm)
    gt3Dcrop: (N, J, 3) metric joints centered at CoM
    com:      (N, 3)    CoM in metric 3D (mm)
    """

    name: str
    dpt: np.ndarray
    gtorig: np.ndarray
    gtcrop: np.ndarray
    M: np.ndarray
    gt3Dorig: np.ndarray
    gt3Dcrop: np.ndarray
    com: np.ndarray
    config: Dict[str, Any]
    file_names: Optional[List[str]] = None

    def __len__(self) -> int:
        return self.dpt.shape[0]

    @property
    def cube(self):
        return np.asarray(self.config["cube"], np.float32)

    def frame(self, i: int, side: str = "right") -> DepthFrame:
        """Materialize one frame in the reference's DepthFrame layout."""
        return DepthFrame(
            self.dpt[i], self.gtorig[i], self.gtcrop[i], self.M[i],
            self.gt3Dorig[i], self.gt3Dcrop[i], self.com[i],
            self.file_names[i] if self.file_names else "", "", side, {})

    def shuffled(self, rng: np.random.RandomState) -> "FrameArrays":
        perm = rng.permutation(len(self))
        return self.take(perm)

    def take(self, idx) -> "FrameArrays":
        return FrameArrays(
            name=self.name,
            dpt=self.dpt[idx], gtorig=self.gtorig[idx],
            gtcrop=self.gtcrop[idx], M=self.M[idx],
            gt3Dorig=self.gt3Dorig[idx], gt3Dcrop=self.gt3Dcrop[idx],
            com=self.com[idx], config=self.config,
            file_names=[self.file_names[i] for i in np.atleast_1d(idx)]
            if self.file_names else None,
        )

    @staticmethod
    def from_frames(name: str, frames: List[DepthFrame],
                    config: Dict[str, Any]) -> "FrameArrays":
        return FrameArrays(
            name=name,
            dpt=np.stack([f.dpt for f in frames]).astype(np.float32),
            gtorig=np.stack([f.gtorig for f in frames]).astype(np.float32),
            gtcrop=np.stack([f.gtcrop for f in frames]).astype(np.float32),
            M=np.stack([np.asarray(f.T) for f in frames]).astype(np.float32),
            gt3Dorig=np.stack([f.gt3Dorig for f in frames]).astype(np.float32),
            gt3Dcrop=np.stack([f.gt3Dcrop for f in frames]).astype(np.float32),
            com=np.stack([f.com for f in frames]).astype(np.float32),
            config=dict(config),
            file_names=[f.fileName for f in frames],
        )
