"""CoM-based 3D hand detection and cropping.

Re-implements the semantics of the reference ``HandDetector``
(reference: src/utils/handdetector.py) with two deliberate changes:

* ``sample_random_poses`` is fully vectorized — the reference runs a
  250k-iteration Python loop (handdetector.py:857-914); here one batch of
  numpy ops produces bit-identical output for the same RandomState,
  because the random draws happen up-front in the same order
  (handdetector.py:845-849).
* python-2 integer division in the resize size math
  (handdetector.py:366-368, 449-454) is reproduced explicitly with ``//``.

cv2 (same backend the reference used) provides INTER_NEAREST resize and
the perspective warps, so crops are bit-comparable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np

from lsps_tpu.data.transformations import rotate_points_2d, rotate_points_3d


class HandDetector:
    """Detect and crop a hand around its center of mass."""

    RESIZE_BILINEAR = 0
    RESIZE_CV2_NN = 1
    RESIZE_CV2_LINEAR = 2

    def __init__(self, dpt, fx, fy, importer=None, refine_net=None):
        dpt = np.asarray(dpt)
        # clamp usable depth range (handdetector.py:59-63)
        self.max_depth = min(6500, dpt.max())
        self.min_depth = max(10, dpt.min())
        self.dpt = dpt.copy()
        self.dpt[self.dpt > self.max_depth] = 0.0
        self.dpt[self.dpt < self.min_depth] = 0.0
        self.fx = fx
        self.fy = fy
        self.importer = importer      # provides joint projection
        self.refine_net = refine_net  # optional CoM refinement hook
        self.resize_method = self.RESIZE_CV2_NN

    # ------------------------------------------------------------------
    @staticmethod
    def detection_mode_to_string(com, refine_net) -> str:
        """Cache-key string for the detection mode
        (handdetector.py:73-91)."""
        if com is False and refine_net is False:
            return "gt"
        if com is True and refine_net is False:
            return "com"
        if com is True and refine_net is True:
            return "comref"
        raise NotImplementedError(f"com {com}, refineNet {refine_net}")

    def calculate_com(self, dpt) -> np.ndarray:
        """Depth-weighted center of mass in (u, v, z[mm])
        (handdetector.py:93-110)."""
        # Keep the frame's dtype: the reference sums the clamped frame
        # as-is (float32 in practice), so the z term accumulates in f32
        # before the f64 divide (handdetector.py:99-110).  Summing in
        # f64 drifts z by ~1e-5 mm vs the reference bit stream.
        dc = np.asarray(dpt).copy()
        dc[dc < self.min_depth] = 0
        dc[dc > self.max_depth] = 0
        num = np.count_nonzero(dc)
        if num == 0:
            return np.zeros(3)
        ys, xs = np.nonzero(dc > 0)
        # xs.mean()/ys.mean() equal ndimage.center_of_mass(dc > 0)
        # exactly (integer index sums are exact in f64); mirror the
        # reference's cc*num → com/num round trip so the last-ulp
        # rounding path matches too (handdetector.py:103-110).
        com = np.array([xs.mean() * num, ys.mean() * num,
                        float(dc.sum())])
        return com / num

    def check_image(self, tol) -> bool:
        """Image has content iff std > tol (handdetector.py:112-122)."""
        return float(np.std(self.dpt)) >= tol

    def get_nd_value(self) -> float:
        """Mode of the out-of-range depth values — used as background fill
        (handdetector.py:124-132)."""
        below = self.dpt[self.dpt < self.min_depth]
        above = self.dpt[self.dpt > self.max_depth]
        vals = below if below.shape[0] > above.shape[0] else above
        if vals.size == 0:
            return 0.0
        uniq, counts = np.unique(vals, return_counts=True)
        return float(uniq[np.argmax(counts)])

    # ------------------------------------------------------------------
    def com_to_bounds(self, com, size) -> Tuple[int, int, int, int, float,
                                                float]:
        """3D cube around CoM -> 2D bbox + z range (handdetector.py:206-228).
        The exact floor(+0.5) rounding is metric-critical."""
        if np.isclose(com[2], 0.0):
            xstart = self.dpt.shape[0] // 4
            xend = xstart + self.dpt.shape[0] // 2
            ystart = self.dpt.shape[1] // 4
            yend = ystart + self.dpt.shape[1] // 2
            return xstart, xend, ystart, yend, self.min_depth, self.max_depth
        zstart = com[2] - size[2] / 2.0
        zend = com[2] + size[2] / 2.0
        xstart = int(np.floor((com[0] * com[2] / self.fx - size[0] / 2.0)
                              / com[2] * self.fx + 0.5))
        xend = int(np.floor((com[0] * com[2] / self.fx + size[0] / 2.0)
                            / com[2] * self.fx + 0.5))
        ystart = int(np.floor((com[1] * com[2] / self.fy - size[1] / 2.0)
                              / com[2] * self.fy + 0.5))
        yend = int(np.floor((com[1] * com[2] / self.fy + size[1] / 2.0)
                            / com[2] * self.fy + 0.5))
        return xstart, xend, ystart, yend, zstart, zend

    def com_to_transform(self, com, size, dsize=(128, 128)) -> np.ndarray:
        """Affine crop transform from CoM (handdetector.py:230-260)."""
        xstart, xend, ystart, yend, _, _ = self.com_to_bounds(com, size)
        trans = np.eye(3)
        trans[0, 2] = -xstart
        trans[1, 2] = -ystart
        wb, hb = xend - xstart, yend - ystart
        if wb > hb:
            scale = np.eye(3) * dsize[0] / float(wb)
            sz = (dsize[0], hb * dsize[0] // wb)
        else:
            scale = np.eye(3) * dsize[1] / float(hb)
            sz = (wb * dsize[1] // hb, dsize[1])
        scale[2, 2] = 1
        # NOTE: the reference centers with sz components swapped
        # (handdetector.py:254-255); reproduced as-is.
        xstart = int(np.floor(dsize[0] / 2.0 - sz[1] / 2.0))
        ystart = int(np.floor(dsize[1] / 2.0 - sz[0] / 2.0))
        off = np.eye(3)
        off[0, 2] = xstart
        off[1, 2] = ystart
        return off @ scale @ trans

    def get_crop(self, dpt, xstart, xend, ystart, yend, zstart, zend,
                 thresh_z=True, background=0) -> np.ndarray:
        """Crop bbox with out-of-image padding and z thresholding
        (handdetector.py:262-298): nearer-than-cube pixels clamp to zstart,
        farther-than-cube pixels go to 0 (the backface marker)."""
        cropped = dpt[max(ystart, 0):min(yend, dpt.shape[0]),
                      max(xstart, 0):min(xend, dpt.shape[1])].copy()
        pad_y = (abs(ystart) - max(ystart, 0),
                 abs(yend) - min(yend, dpt.shape[0]))
        pad_x = (abs(xstart) - max(xstart, 0),
                 abs(xend) - min(xend, dpt.shape[1]))
        pads = ((pad_y, pad_x) if cropped.ndim == 2
                else (pad_y, pad_x, (0, 0)))
        cropped = np.pad(cropped, pads, mode="constant",
                         constant_values=background)
        if thresh_z:
            msk1 = np.logical_and(cropped < zstart, cropped != 0)
            msk2 = np.logical_and(cropped > zend, cropped != 0)
            cropped[msk1] = zstart
            cropped[msk2] = 0.0
        return cropped

    def resize_crop(self, crop, sz) -> np.ndarray:
        """Resize with the configured method (handdetector.py:338-353)."""
        if self.resize_method == self.RESIZE_CV2_NN:
            return cv2.resize(crop, sz, interpolation=cv2.INTER_NEAREST)
        if self.resize_method == self.RESIZE_CV2_LINEAR:
            return cv2.resize(crop, sz, interpolation=cv2.INTER_LINEAR)
        if self.resize_method == self.RESIZE_BILINEAR:
            return self.bilinear_resize(crop, sz, self.get_nd_value())
        raise NotImplementedError("Unknown resize method")

    @staticmethod
    def bilinear_resize(src, dsize, nd_value) -> np.ndarray:
        """Bilinear resize that treats ``nd_value`` pixels as missing
        (handdetector.py:134-204).  The reference loops pixel-by-pixel in
        Python; this is the vectorized equivalent: per-corner weights are
        zeroed for ND corners, renormalized, and >2 ND corners -> ND."""
        src = np.asarray(src, np.float32)
        out_h, out_w = dsize[1], dsize[0]
        x_ratio = float(src.shape[1] - 1) / out_w
        y_ratio = float(src.shape[0] - 1) / out_h
        # f64 grid: the reference computes offsets/weights in python
        # floats (f64) and only the final products round to f32
        rows = np.arange(out_h, dtype=np.float64)[:, None]
        cols = np.arange(out_w, dtype=np.float64)[None, :]
        y = (rows * y_ratio).astype(np.int64)
        x = (cols * x_ratio).astype(np.int64)
        y_diff = rows * y_ratio - y
        x_diff = cols * x_ratio - x
        c00 = src[y, x]
        c01 = src[y, x + 1]
        c10 = src[y + 1, x]
        c11 = src[y + 1, x + 1]
        w00 = (1 - y_diff) * (1 - x_diff)
        w01 = (1 - y_diff) * x_diff
        w10 = y_diff * (1 - x_diff)
        w11 = y_diff * x_diff
        nd00, nd01 = c00 == nd_value, c01 == nd_value
        nd10, nd11 = c10 == nd_value, c11 == nd_value
        n_nd = (nd00.astype(int) + nd01.astype(int) + nd10.astype(int)
                + nd11.astype(int))
        # reference's cascading weight redistribution (handdetector.py:173-186)
        w00_, w01_, w10_, w11_ = (w.astype(np.float64).copy()
                                  for w in (w00 + np.zeros_like(c00),
                                            w01 + np.zeros_like(c00),
                                            w10 + np.zeros_like(c00),
                                            w11 + np.zeros_like(c00)))
        w00_ = np.where(nd00, 0.0, w00_)
        w01_ = np.where(nd00, 1.0 - w11_ - w10_, w01_)
        w01_ = np.where(nd01, 0.0, w01_)
        w00_ = np.where(nd01 & (w00_ != 0.0), 1.0 - w11_ - w10_, w00_)
        w10_ = np.where(nd10, 0.0, w10_)
        w11_ = np.where(nd10, 1.0 - w01_ - w00_, w11_)
        w11_ = np.where(nd11, 0.0, w11_)
        w10_ = np.where(nd11 & (w10_ != 0.0), 1.0 - w01_ - w00_, w10_)
        # reference sums the normalizer as yx + yx2 + y2x + y2x2 and
        # scales each WEIGHT before the dot product
        # (handdetector.py:190-203); both orderings matter for bit
        # parity at f32 rounding ties.
        total = w11_ + w10_ + w01_ + w00_
        all_zero = total == 0.0
        scale = np.where(all_zero, 1.0, 1.0 / np.where(all_zero, 1.0, total))
        w00_ *= scale
        w01_ *= scale
        w10_ *= scale
        w11_ *= scale
        # The reference's scalar `weight * src[y, x]` products and their
        # left-to-right sum each round to float32 (numpy scalar
        # promotion keeps the f32 kind, handdetector.py:200-203);
        # accumulate the dot in f32 the same way for bit parity.
        # NB: "keeps the f32 kind" holds under NEP 50 (numpy >= 2,
        # asserted in tests/conftest.py); numpy 1.x would promote the
        # reference's own products to f64 — see docs/PARITY.md #10.
        val = w00_.astype(np.float32) * c00
        val = val + w01_.astype(np.float32) * c01
        val = val + w10_.astype(np.float32) * c10
        val = val + w11_.astype(np.float32) * c11
        out = np.where(all_zero | (n_nd > 2), nd_value, val)
        return out.astype(np.float32)

    # ------------------------------------------------------------------
    def crop_area_3d(self, com=None, size=(250, 250, 250), dsize=(128, 128),
                     docom=False):
        """Crop the hand in a metric 3D cube, scale-normalized to distance
        (handdetector.py:384-492).

        Returns (128x128 float32 crop, 3x3 transform M, com (u,v,z)).
        """
        if len(size) != 3 or len(dsize) != 2:
            raise ValueError("size must be 3D and dsize 2D")
        if com is None:
            com = self.calculate_com(self.dpt)
        com = np.asarray(com, np.float64).copy()

        xstart, xend, ystart, yend, zstart, zend = self.com_to_bounds(com,
                                                                      size)
        cropped = self.get_crop(self.dpt, xstart, xend, ystart, yend, zstart,
                                zend)

        if docom:  # re-center on the crop's own CoM (handdetector.py:415-428)
            com = self.calculate_com(cropped)
            if np.allclose(com, 0.0):
                com[2] = cropped[cropped.shape[0] // 2,
                                 cropped.shape[1] // 2]
                if np.isclose(com[2], 0):
                    com[2] = 300.0
            com[0] += xstart
            com[1] += ystart
            xstart, xend, ystart, yend, zstart, zend = self.com_to_bounds(
                com, size)
            cropped = self.get_crop(self.dpt, xstart, xend, ystart, yend,
                                    zstart, zend)

        if docom and self.refine_net is not None and self.importer is not None:
            rz = self.resize_crop(cropped, dsize)
            new_com3d = (self.refine_com(rz, size, com)
                         + self.importer.joint_img_to_3d(com))
            com = self.importer.joint_3d_to_img(new_com3d)
            if np.allclose(com, 0.0):
                com[2] = cropped[cropped.shape[0] // 2,
                                 cropped.shape[1] // 2]
            xstart, xend, ystart, yend, zstart, zend = self.com_to_bounds(
                com, size)
            cropped = self.get_crop(self.dpt, xstart, xend, ystart, yend,
                                    zstart, zend)

        wb, hb = xend - xstart, yend - ystart
        # aspect-preserving destination size; py2 floor division
        # (handdetector.py:449-454)
        if wb > hb:
            sz = (dsize[0], hb * dsize[0] // wb)
        else:
            sz = (wb * dsize[1] // hb, dsize[1])

        trans = np.eye(3)
        trans[0, 2] = -xstart
        trans[1, 2] = -ystart
        if cropped.shape[0] > cropped.shape[1]:
            scale = np.eye(3) * sz[1] / float(cropped.shape[0])
        else:
            scale = np.eye(3) * sz[0] / float(cropped.shape[1])
        scale[2, 2] = 1

        rz = self.resize_crop(cropped, sz)

        ret = np.ones(dsize, np.float32) * self.get_nd_value()
        xs = int(np.floor(dsize[0] / 2.0 - rz.shape[1] / 2.0))
        ys = int(np.floor(dsize[1] / 2.0 - rz.shape[0] / 2.0))
        ret[ys:ys + rz.shape[0], xs:xs + rz.shape[1]] = rz
        off = np.eye(3)
        off[0, 2] = xs
        off[1, 2] = ys
        return ret, off @ scale @ trans, com

    def apply_crop_3d(self, dpt, com, size, dsize, thresh_z=True,
                      background=None):
        """Crop an arbitrary image with the CoM cube (handdetector.py:355-382)."""
        xstart, xend, ystart, yend, zstart, zend = self.com_to_bounds(com,
                                                                      size)
        cropped = self.get_crop(dpt, xstart, xend, ystart, yend, zstart,
                                zend, thresh_z, background or 0)
        wb, hb = xend - xstart, yend - ystart
        if wb > hb:
            sz = (dsize[0], hb * dsize[0] // wb)
        else:
            sz = (wb * dsize[1] // hb, dsize[1])
        rz = self.resize_crop(cropped, sz)
        if background is None:
            background = self.get_nd_value()
        ret = np.ones(dsize, np.float32) * background
        xs = int(np.floor(dsize[0] / 2.0 - rz.shape[1] / 2.0))
        ys = int(np.floor(dsize[1] / 2.0 - rz.shape[0] / 2.0))
        ret[ys:ys + rz.shape[0], xs:xs + rz.shape[1]] = rz
        return ret

    # ------------------------------------------------------------------
    # augmentation warps (handdetector.py:682-807)
    # ------------------------------------------------------------------
    def recrop_hand(self, crop, M, Mnew, target_size, background_value=0.0,
                    nv_val=0.0, thresh_z=True, com=None,
                    size=(250, 250, 250)) -> np.ndarray:
        """Re-crop by warping through M @ Mnew (handdetector.py:786-807)."""
        flags = (cv2.INTER_NEAREST if self.resize_method == self.RESIZE_CV2_NN
                 else cv2.INTER_LINEAR)
        warped = cv2.warpPerspective(crop, np.dot(M, Mnew), target_size,
                                     flags=flags,
                                     borderMode=cv2.BORDER_CONSTANT,
                                     borderValue=float(background_value))
        warped[np.isclose(warped, nv_val)] = background_value
        if thresh_z:
            assert com is not None
            _, _, _, _, zstart, zend = self.com_to_bounds(com, size)
            msk1 = np.logical_and(warped < zstart, warped != 0)
            msk2 = np.logical_and(warped > zend, warped != 0)
            warped[msk1] = zstart
            warped[msk2] = 0.0
        return warped

    def move_com(self, dpt, cube, com, off, joints_3d, M, pad_value=0):
        """Simulate a CoM shift on an already-cropped image
        (handdetector.py:682-714)."""
        if np.allclose(off, 0.0):
            return dpt, joints_3d, com, M
        new_com = self.importer.joint_3d_to_img(
            self.importer.joint_img_to_3d(np.asarray(com)) + off)
        if not (np.allclose(com[2], 0.0) or np.allclose(new_com[2], 0.0)):
            Mnew = self.com_to_transform(new_com, cube, dpt.shape)
            new_dpt = self.recrop_hand(dpt, Mnew, np.linalg.inv(M),
                                       dpt.shape, background_value=pad_value,
                                       nv_val=32000.0, thresh_z=True,
                                       com=new_com, size=cube)
        else:
            Mnew, new_dpt = M, dpt
        new_joints = (joints_3d + self.importer.joint_img_to_3d(np.asarray(com))
                      - self.importer.joint_img_to_3d(new_com))
        return new_dpt, new_joints, new_com, Mnew

    def rotate_hand(self, dpt, cube, com, rot, joints_3d, pad_value=0):
        """In-plane rotation of crop + joints (handdetector.py:716-751)."""
        if np.allclose(rot, 0.0):
            return dpt, joints_3d, rot
        rot = np.mod(rot, 360)
        M = cv2.getRotationMatrix2D(
            (dpt.shape[1] // 2, dpt.shape[0] // 2), -rot, 1)
        flags = (cv2.INTER_NEAREST if self.resize_method == self.RESIZE_CV2_NN
                 else cv2.INTER_LINEAR)
        new_dpt = cv2.warpAffine(dpt, M, (dpt.shape[1], dpt.shape[0]),
                                 flags=flags,
                                 borderMode=cv2.BORDER_CONSTANT,
                                 borderValue=pad_value)
        com3d = self.importer.joint_img_to_3d(np.asarray(com))
        joint_2d = self.importer.joint_3d_to_img(joints_3d + com3d)
        data_2d = rotate_points_2d(joint_2d, np.asarray(com[:2], np.float32),
                                   rot)
        new_joints = self.importer.joint_img_to_3d(data_2d) - com3d
        return new_dpt, new_joints, rot

    def scale_hand(self, dpt, cube, com, sc, joints_3d, M, pad_value=0):
        """Virtual scale change via a different cube
        (handdetector.py:754-784)."""
        if np.allclose(sc, 1.0):
            return dpt, joints_3d, cube, M
        new_cube = [s * sc for s in cube]
        if not np.allclose(com[2], 0.0):
            Mnew = self.com_to_transform(com, new_cube, dpt.shape)
            new_dpt = self.recrop_hand(dpt, Mnew, np.linalg.inv(M),
                                       dpt.shape, background_value=pad_value,
                                       nv_val=32000.0, thresh_z=True,
                                       com=com, size=cube)
        else:
            Mnew, new_dpt = M, dpt
        return new_dpt, joints_3d, new_cube, Mnew

    # ------------------------------------------------------------------
    # detection / tracking (handdetector.py:506-636)
    # ------------------------------------------------------------------
    def refine_com_iterative(self, com, num_iter, size=(250, 250, 250)):
        """Iterative CoM refinement (handdetector.py:548-569)."""
        com = np.asarray(com, np.float64).copy()
        for _ in range(num_iter):
            xstart, xend, ystart, yend, zstart, zend = self.com_to_bounds(
                com, size)
            cropped = self.get_crop(self.dpt, xstart, xend, ystart, yend,
                                    zstart, zend)
            com = self.calculate_com(cropped)
            if np.allclose(com, 0.0):
                com[2] = cropped[cropped.shape[0] // 2,
                                 cropped.shape[1] // 2]
            com[0] += max(xstart, 0)
            com[1] += max(ystart, 0)
        return com

    def detect(self, size=(250, 250, 250), do_hand_size=True):
        """Closest-object depth-sweep detector (handdetector.py:571-636)."""
        steps = 65
        dz = (self.max_depth - self.min_depth) / float(steps)
        for i in range(5, steps):
            lo = i * dz + self.min_depth
            hi = (i + 1) * dz + self.min_depth
            part = np.logical_and(self.dpt >= lo, self.dpt <= hi)
            binary = (part * 255).astype(np.uint8)
            contours, _ = cv2.findContours(binary, cv2.RETR_TREE,
                                           cv2.CHAIN_APPROX_SIMPLE)
            for c in contours:
                if cv2.contourArea(c) <= 200:
                    continue
                m = cv2.moments(c)
                cx = int(np.rint(m["m10"] / m["m00"]))
                cy = int(np.rint(m["m01"] / m["m00"]))
                xstart = int(max(cx - 100, 0))
                xend = int(min(cx + 100, self.dpt.shape[1] - 1))
                ystart = int(max(cy - 100, 0))
                yend = int(min(cy + 100, self.dpt.shape[0] - 1))
                cropped = self.dpt[ystart:yend, xstart:xend].copy()
                cropped[cropped < lo] = 0.0
                cropped[cropped > hi] = 0.0
                com = self.calculate_com(cropped)
                if np.allclose(com, 0.0):
                    com[2] = cropped[cropped.shape[0] // 2,
                                     cropped.shape[1] // 2]
                com[0] += xstart
                com[1] += ystart
                com = self.refine_com_iterative(com, 5, size)
                if do_hand_size:
                    return com, self._hand_size_from_depth(com, size)
                return com, size
        return np.zeros(3), size

    def track(self, com, size=(250, 250, 250), dsize=(128, 128),
              do_hand_size=True):
        """Track CoM using the refinement net (handdetector.py:506-546)."""
        xstart, xend, ystart, yend, zstart, zend = self.com_to_bounds(com,
                                                                      size)
        cropped = self.get_crop(self.dpt, xstart, xend, ystart, yend, zstart,
                                zend)
        if self.refine_net is None or self.importer is None:
            raise RuntimeError("Need refine_net for tracking")
        rz = self.resize_crop(cropped, dsize)
        new_com3d = (self.refine_com(rz, size, com)
                     + self.importer.joint_img_to_3d(np.asarray(com)))
        com = self.importer.joint_3d_to_img(new_com3d)
        if np.allclose(com, 0.0):
            com[2] = cropped[cropped.shape[0] // 2, cropped.shape[1] // 2]
        if do_hand_size:
            return com, self._hand_size_from_depth(com, size)
        return com, size

    def refine_com(self, cropped, size, com):
        """Run the CoM refinement net on a normalized crop
        (handdetector.py:638-680).  The net itself is a pluggable hook —
        the reference's ScaleNet module is absent from its repo
        (SURVEY.md §2.9), so any callable (crop -> (3,) offset in
        normalized units) works."""
        img = np.asarray(cropped, np.float32).copy()
        img[img == 0] = com[2] + size[2] / 2.0
        img[img >= com[2] + size[2] / 2.0] = com[2] + size[2] / 2.0
        img[img <= com[2] - size[2] / 2.0] = com[2] - size[2] / 2.0
        img -= com[2]
        img /= size[2] / 2.0
        return np.asarray(self.refine_net(img)) * (size[2] / 2.0)

    def _hand_size_from_depth(self, com, size):
        zstart = com[2] - size[2] / 2.0
        zend = com[2] + size[2] / 2.0
        part = np.logical_and(self.dpt >= zstart, self.dpt <= zend)
        binary = (part * 255).astype(np.uint8)
        contours, _ = cv2.findContours(binary, cv2.RETR_TREE,
                                       cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            return size
        areas = [cv2.contourArea(cc) for cc in contours]
        return self.estimate_hand_size(contours[int(np.argmax(areas))], com,
                                       size)

    def estimate_hand_size(self, contour, com, cube=(250, 250, 250),
                           tol=0.0):
        """Metric cube estimate from the hand contour bbox
        (handdetector.py:920-946)."""
        x, y, w, h = cv2.boundingRect(contour)
        xstart = (com[0] - w / 2.0) * com[2] / self.fx
        xend = (com[0] + w / 2.0) * com[2] / self.fx
        ystart = (com[1] - h / 2.0) * com[2] / self.fy
        yend = (com[1] + h / 2.0) * com[2] / self.fy
        sz = ((xend - xstart) + (yend - ystart)) / 2.0
        return (sz + tol, sz + tol, sz + tol)

    # ------------------------------------------------------------------
    @staticmethod
    def sample_random_poses(importer, rng, base_poses, base_com, base_cube,
                            num_poses, nmax, aug_modes, retall=False,
                            rot3d=False, sigma_com=None, sigma_sc=None,
                            rot_range=None):
        """Vectorized random pose-space augmentation.

        Bit-compatible with the reference loop (handdetector.py:809-918):
        the five random draws happen in the same order on the same
        RandomState, then each mode's arithmetic is applied to its index
        subset as one batched numpy expression instead of a 250k-iteration
        Python loop.
        """
        sigma_com = 10.0 if sigma_com is None else sigma_com
        sigma_sc = 0.05 if sigma_sc is None else sigma_sc
        rot_range = 180.0 if rot_range is None else rot_range

        all_modes = ["none", "rot", "sc", "com", "rot+com", "com+rot",
                     "rot+com+sc", "rot+sc+com", "sc+rot+com", "sc+com+rot",
                     "com+sc+rot", "com+rot+sc"]
        assert all(m in all_modes for m in aug_modes)

        base_poses = np.asarray(base_poses, np.float32)
        base_com = np.asarray(base_com, np.float32)
        base_cube = np.asarray(base_cube, np.float32)
        num_poses = int(num_poses)
        p2use = int(min(base_poses.shape[0], nmax))

        # identical draw order to the reference (handdetector.py:845-849)
        modes = rng.randint(0, len(aug_modes), num_poses)
        ridxs = rng.randint(0, p2use, num_poses)
        off = rng.randn(num_poses, 3) * sigma_com
        sc = np.fabs(rng.randn(num_poses) * sigma_sc + 1.0)
        rot = rng.uniform(-rot_range, rot_range, size=(num_poses, 3))

        if aug_modes == ["none"]:
            norm = base_poses / (base_cube[:, 2] / 2.0)[:, None, None]
            if retall:
                return norm, base_com, base_cube
            return norm

        cube = base_cube[ridxs]                       # (N, 3)
        com3d = base_com[ridxs]                       # (N, 3)
        pose = base_poses[ridxs].astype(np.float32)   # (N, J, 3)
        new_com = com3d.copy()
        new_cube = cube.copy()
        new_poses = np.zeros_like(pose)
        mode_names = np.asarray(aug_modes)[modes]

        def _rot2d_batch(poses_c, centers, angles):
            """Rotate each pose's 2D projection around its center."""
            j2 = importer.joint_3d_to_img(poses_c)      # (N, J, 3)
            a = np.deg2rad(angles)[:, None]
            ca, sa = np.cos(a), np.sin(a)
            du = j2[..., 0] - centers[:, None, 0]
            dv = j2[..., 1] - centers[:, None, 1]
            ru = du * ca - dv * sa + centers[:, None, 0]
            rv = du * sa + dv * ca + centers[:, None, 1]
            out = np.stack([ru, rv, j2[..., 2]], axis=-1)
            return importer.joint_img_to_3d(out)

        m = mode_names == "com"
        if m.any():  # handdetector.py:865-869
            new_com[m] = com3d[m] + off[m]
            new_poses[m] = ((pose[m] + com3d[m, None] - new_com[m, None])
                            / (new_cube[m, 2] / 2.0)[:, None, None])

        m = mode_names == "rot"
        if m.any():  # handdetector.py:870-879
            if not rot3d:
                centers = importer.joint_3d_to_img(com3d[m])[:, :2]
                r3 = _rot2d_batch(pose[m] + new_com[m, None], centers,
                                  rot[m, 0])
                new_poses[m] = ((r3 - new_com[m, None])
                                / (new_cube[m, 2] / 2.0)[:, None, None])
            else:
                for i in np.nonzero(m)[0]:
                    new_poses[i] = (rotate_points_3d(
                        pose[i] + new_com[i], new_com[i], rot[i, 0],
                        rot[i, 1], rot[i, 2]) - new_com[i]) / (
                            new_cube[i, 2] / 2.0)

        m = mode_names == "sc"
        if m.any():  # handdetector.py:880-884
            new_cube[m] = cube[m] * sc[m, None]
            new_poses[m] = pose[m] / (new_cube[m, 2] / 2.0)[:, None, None]

        m = mode_names == "none"
        if m.any():  # handdetector.py:885-889
            new_poses[m] = pose[m] / (new_cube[m, 2] / 2.0)[:, None, None]

        m = np.isin(mode_names, ["rot+com", "com+rot"])
        if m.any():  # handdetector.py:890-900
            new_com[m] = com3d[m] + off[m]
            pshift = pose[m] + com3d[m, None] - new_com[m, None]
            if not rot3d:
                centers = importer.joint_3d_to_img(new_com[m])[:, :2]
                r3 = _rot2d_batch(pshift + com3d[m, None], centers, rot[m, 0])
                new_poses[m] = ((r3 - com3d[m, None])
                                / (new_cube[m, 2] / 2.0)[:, None, None])
            else:
                idx = np.nonzero(m)[0]
                for k, i in enumerate(idx):
                    new_poses[i] = (rotate_points_3d(
                        pshift[k] + new_com[i], new_com[i], rot[i, 0],
                        rot[i, 1], rot[i, 2]) - new_com[i]) / (
                            new_cube[i, 2] / 2.0)

        m = np.isin(mode_names, ["rot+com+sc", "rot+sc+com", "sc+rot+com",
                                 "sc+com+rot", "com+sc+rot", "com+rot+sc"])
        if m.any():  # handdetector.py:901-912
            new_com[m] = com3d[m] + off[m]
            pshift = (pose[m] + com3d[m, None] - new_com[m, None]) \
                * sc[m, None, None]
            if not rot3d:
                centers = importer.joint_3d_to_img(new_com[m])[:, :2]
                r3 = _rot2d_batch(pshift + com3d[m, None], centers, rot[m, 0])
                new_poses[m] = ((r3 - com3d[m, None])
                                / (new_cube[m, 2] / 2.0)[:, None, None])

        if retall:
            return new_poses, new_com, new_cube, rot
        return new_poses
