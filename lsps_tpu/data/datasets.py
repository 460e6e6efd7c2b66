"""Training/eval datasets over imported sequences.

Reproduces the dataset semantics of the reference
(reference: src/data/dataset_hand2.py:125-415): normalization,
augmentation, NYU joint-subset remapping with y-flip, pose-only mode,
``sample_poses`` pre-generation, ``set_nmax`` label-fraction capping, and
the exact ``__getitem__`` tuple contracts consumed by the training loops
(dataset_hand2.py:190-200, 352, 366, 406).

Torch-free: ``__getitem__`` returns numpy; batching is done by
:class:`lsps_tpu.data.loader.DataLoader`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from lsps_tpu.data.augment import AUG_MODES_DEFAULT, augment_crop, normalize
from lsps_tpu.data.detector import HandDetector
from lsps_tpu.data.importers import ICVLImporter, NYUImporter
from lsps_tpu.registry import register

# NYU -> MSRA / ICVL joint-subset index maps (dataset_hand2.py:278-287)
NYU_TO_MSRA = np.asarray([29, 23, 22, 20, 18, 17, 16, 14, 12, 11, 10,
                          8, 6, 5, 4, 2, 0, 28, 27, 25, 24], dtype=np.int32)
NYU_TO_ICVL = np.asarray([34, 28, 26, 24, 22, 20, 18, 16, 14, 12, 10,
                          8, 6, 4, 2, 0], dtype=np.int32)


class _HandDatasetBase:
    """Shared behavior: pose sampling, nmax capping, augmentation."""

    def __init__(self, specs):
        self.rng = np.random.RandomState(specs["seed"])
        self.sampled_poses = None
        self.pose_only = False
        self.nmax = np.inf
        self.augment = specs.get("augment", False)
        self.num_sample_poses = specs.get("sample_poses", 0)
        self.joint_subset = specs.get("joint_subset", None)
        self.aug_modes = list(AUG_MODES_DEFAULT)
        self.flip_y = False

    def _init_detector(self):
        """Build the augmentation HandDetector from frame 0
        (dataset_hand2.py:150-156)."""
        cube = self.seq.cube
        com = self.seq.com[0]
        img = normalize(self.seq.dpt_mm(0), com, cube)
        self.hd = HandDetector(img, abs(self.di.fx), abs(self.di.fy),
                               importer=self.di)
        self.num = len(self.seq)

    def sample_poses(self):
        """Pre-generate ``num_sample_poses`` augmented poses
        (dataset_hand2.py:159-169, 314-324) — vectorized (detector.py)."""
        cube = np.repeat(self.seq.cube[None], self.num, 0)
        self.sampled_poses = HandDetector.sample_random_poses(
            self.di, self.rng, self.seq.gt3Dcrop, self.seq.com, cube,
            self.num_sample_poses, self.nmax, self.aug_modes)
        self.num = self.sampled_poses.shape[0]
        self.nmax = self.sampled_poses.shape[0]

    def set_nmax(self, frac):
        """Cap labeled-real sample count (dataset_hand2.py:202-204)."""
        self.nmax = int(self.num * frac)

    def __len__(self):
        return int(np.minimum(self.num, self.nmax))

    # -- batched fast-augmentation path (native fused kernel) -----------
    def enable_fast_augment(self, backend: str = "native") -> bool:
        """Switch the loader to the batched augmentation path
        (lsps_tpu/data/fast_augment.py): 'native' fused C++ host kernel,
        'jax' fused device program, or 'step' (host computes only the
        per-sample warp params; the image work runs INSIDE the jitted
        training step — trainer.pretrain_update_raw). Returns False if
        unavailable or the dataset mode doesn't apply."""
        from lsps_tpu.data import fast_augment

        if not (getattr(self, "augment", False)
                and not getattr(self, "pose_only", False)):
            return False
        if backend == "native" and not fast_augment.available():
            return False
        self._fast_augmenter = fast_augment.FastAugmenter(self, backend)
        return True

    def _fix_labels(self, labels):
        n = labels.shape[0]
        lab = labels.reshape(n, -1, 3)
        if isinstance(self.joint_subset, np.ndarray):
            lab = lab[:, self.joint_subset].copy()
        if self.flip_y:
            lab[:, :, 1] *= -1
        return lab.reshape(n, -1)

    def fast_batch(self, idxs):
        """One augmented batch in this dataset's tuple contract."""
        imgs, labels, coms, Ms, cubes = self._fast_augmenter.batch(idxs)
        return self._batch_tuple(imgs, self._fix_labels(labels), coms, Ms,
                                 cubes)

    def raw_fast_batch(self, idxs):
        """One batch of augmentation PARAMS (no image work): ``(raw7,
        labels, coms, Ms, cubes)`` for the fused-in-step augment path."""
        raw, labels, coms, Ms, cubes = self._fast_augmenter.raw_batch(idxs)
        return raw, self._fix_labels(labels), coms, Ms, cubes

    def _batch_tuple(self, imgs, labels, coms, Ms, cubes):
        return imgs, labels, coms, Ms, cubes

    # subclasses define __getitem__


@register("dataset", "dataset_hand_ICVL")
class DatasetHandICVL(_HandDatasetBase):
    """ICVL training dataset (dataset_hand2.py:125-207).

    __getitem__ (image mode): (1x128x128 img, flat pose / (cube_z/2),
    com3D, M, cube).
    """

    def __init__(self, specs):
        super().__init__(specs)
        self.di = ICVLImporter(specs["root"],
                               cache_dir=specs.get("cacheDir",
                                                   specs.get("cache_dir",
                                                             "./cache/")))
        self.seq = self.di.load_sequence(specs["subset"], sub_seq=["0"],
                                         rng=self.rng, shuffle=True,
                                         docom=specs.get("docom", False))
        self._init_detector()

    def __getitem__(self, i):
        if self.pose_only and self.sampled_poses is not None:
            return self.sampled_poses[i].reshape(-1)

        cube = self.seq.cube
        com = self.seq.com[i].astype(np.float32)
        M = self.seq.M[i].astype(np.float32)
        gt3d = self.seq.gt3Dcrop[i].astype(np.float32)
        img = normalize(self.seq.dpt_mm(i), com, cube)

        if not self.augment:
            if self.pose_only:
                return gt3d.reshape(-1) / (cube[2] / 2.0)
            return (img[None], gt3d.reshape(-1) / (cube[2] / 2.0), com, M,
                    cube)

        img, _, gt3d, cube, com2d, M, _ = augment_crop(
            img, gt3d, self.di.joint_3d_to_img(com), cube, M,
            self.aug_modes, self.hd, rng=self.rng)
        if self.pose_only:
            return gt3d.reshape(-1)
        return (img[None], gt3d.reshape(-1).astype(np.float32),
                self.di.joint_img_to_3d(com2d), M, cube)


@register("dataset", "dataset_hand_ICVL_test")
class DatasetHandICVLTest(_HandDatasetBase):
    """ICVL test dataset over both test sequences
    (dataset_hand2.py:210-249)."""

    def __init__(self, specs):
        self.rng = np.random.RandomState(specs["seed"])
        self.pose_only = False
        self.augment = False  # test sets are never augmented
        self.di = ICVLImporter(specs["root"], refine_net=None,
                               cache_dir=specs.get("cacheDir", "./cache/"))
        subset = specs["subset"]
        self.seq1 = self.di.load_sequence(subset,
                                          docom=specs.get("docom", False))
        self.seq2 = self.di.load_sequence(subset.replace("1", "2"),
                                          docom=specs.get("docom", False))
        self.num = len(self.seq1) + len(self.seq2)
        self.len_seq1 = len(self.seq1)

    def __getitem__(self, i):
        seq, j = ((self.seq1, i) if i < self.len_seq1
                  else (self.seq2, i - self.len_seq1))
        cube = seq.cube
        com = seq.com[j].astype(np.float32)
        M = seq.M[j].astype(np.float32)
        gt3d = seq.gt3Dcrop[j].astype(np.float32)
        img = normalize(seq.dpt_mm(j), com, cube)
        return (img[None], gt3d.reshape(-1) / (cube[2] / 2.0), com, M, cube)

    def __len__(self):
        return self.num


@register("dataset", "dataset_hand_NYU")
class DatasetHandNYU(_HandDatasetBase):
    """NYU training dataset (dataset_hand2.py:256-373).

    __getitem__ (image mode) returns a 6-tuple with cube twice
    (dataset_hand2.py:352, 366) so loops can unpack a trailing ``_``.
    Supports MSRA/ICVL joint-subset remapping with y-flip.
    """

    def __init__(self, specs):
        super().__init__(specs)
        js = specs.get("joint_subset", "NYU") or "NYU"
        com_idx, cube_size = 32, 300
        if "MSRA" in js:
            self.joint_subset = NYU_TO_MSRA
            com_idx = 17
        elif "ICVL" in js:
            self.joint_subset = NYU_TO_ICVL
            self.flip_y = True
            com_idx = 34
            cube_size = 350
        else:
            self.joint_subset = np.arange(36)

        self.di = NYUImporter(specs["root"], refine_net=None,
                              all_joints=True, com_idx=com_idx,
                              cache_dir=specs.get("cacheDir", "./cache/"))
        subset = specs["subset"]
        if "synth" in subset:
            self.di.default_cubes[subset] = (cube_size,) * 3
        self.seq = self.di.load_sequence(subset, rng=self.rng, shuffle=True,
                                         docom=specs.get("docom", False))
        self._init_detector()

    def _batch_tuple(self, imgs, labels, coms, Ms, cubes):
        # NYU 6-tuple contract (dataset_hand2.py:352, 366)
        return imgs, labels, coms, Ms, cubes, cubes

    def __getitem__(self, i):
        if self.pose_only and self.sampled_poses is not None:
            pos = self.sampled_poses[i][self.joint_subset].copy()
            if self.flip_y:
                pos[:, 1] *= -1
            return pos.reshape(-1)

        cube = self.seq.cube
        com = self.seq.com[i].astype(np.float32)
        M = self.seq.M[i].astype(np.float32)
        gt3d = self.seq.gt3Dcrop[i].astype(np.float32)
        img = normalize(self.seq.dpt_mm(i), com, cube)

        if not self.augment:
            gt3d = gt3d[self.joint_subset]
            if self.flip_y:
                gt3d[:, 1] *= -1
            if self.pose_only:
                return gt3d.reshape(-1) / (cube[2] / 2.0)
            return (img[None], gt3d.reshape(-1) / (cube[2] / 2.0), com, M,
                    cube, cube)

        img, _, gt3d, cube, com2d, M, _ = augment_crop(
            img, gt3d, self.di.joint_3d_to_img(com), cube, M,
            self.aug_modes, self.hd, rng=self.rng)
        gt3d = gt3d[self.joint_subset]
        if self.flip_y:
            gt3d[:, 1] *= -1
        if self.pose_only:
            return gt3d.reshape(-1)
        return (img[None], gt3d.reshape(-1).astype(np.float32),
                self.di.joint_img_to_3d(com2d), M, cube, cube)


@register("dataset", "dataset_hand_NYU_test")
class DatasetHandNYUTest(_HandDatasetBase):
    """NYU test dataset (dataset_hand2.py:377-412); no shuffle, no
    augmentation; 6-tuple contract."""

    def __init__(self, specs):
        self.rng = np.random.RandomState(specs["seed"])
        self.pose_only = False
        self.augment = False  # test sets are never augmented
        self.di = NYUImporter(specs["root"], refine_net=None,
                              all_joints=True,
                              cache_dir=specs.get("cacheDir", "./cache/"))
        self.seq = self.di.load_sequence(specs["subset"], shuffle=False,
                                         rng=self.rng,
                                         docom=specs.get("docom", False))
        self.num = len(self.seq)

    def __getitem__(self, i):
        cube = self.seq.cube
        com = self.seq.com[i].astype(np.float32)
        M = self.seq.M[i].astype(np.float32)
        gt3d = self.seq.gt3Dcrop[i].astype(np.float32)
        img = normalize(self.seq.dpt_mm(i), com, cube)
        return (img[None], gt3d.reshape(-1) / (cube[2] / 2.0), com, M, cube,
                cube)

    def __len__(self):
        return self.num
