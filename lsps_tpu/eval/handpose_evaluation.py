"""Hand-pose accuracy metrics and plots.

Reference: src/utils/handpose_evaluation.py:41-346 (metric formulas) and
the per-dataset joint-name/connection subclasses (:684-913).  All metrics
are vectorized over (N, J, 3) arrays; NaN-tolerant like the reference
(nanmean/nanmax).  ``legacy.Evaluation`` covers src/utils/evaluation.py
(mm errors on x50-denormalized poses restricted to the NYU 14-joint
protocol).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

# NYU 14-joint evaluation protocol (reference importers.py:984,
# depth_train.py:231-234)
NYU_RESTRICTED_EVAL = np.asarray([0, 3, 6, 9, 12, 15, 18, 21, 24, 25, 27,
                                  30, 31, 32])


class HandposeEvaluation:
    """mm-space joint error metrics over (gt, pred) arrays of (N, J, 3)."""

    def __init__(self, gtjoints, joints, dolegend=True, linewidth=1):
        gtjoints = np.asarray(gtjoints, np.float64)
        joints = np.asarray(joints, np.float64)
        if gtjoints.shape != joints.shape or gtjoints.size == 0:
            raise ValueError(
                f"shape mismatch or empty: {gtjoints.shape} vs "
                f"{joints.shape}")
        self.gtjoints = gtjoints
        self.joints = joints
        self.dolegend = dolegend
        self.linewidth = linewidth
        self.subfolder = "./eval/"
        self.jointNames: Optional[Sequence[str]] = None
        self.jointConnections: List = []
        self.jointConnectionColors: List = []
        self.jointColors: List = []
        # (elev, azim, roll) for plotResult3D — stands in for the
        # reference's per-dataset VTKviewport angles
        self.viewport3D = (-75.0, -90.0, 0.0)
        self.plotMaxJointDist = 80
        self.plotMeanJointDist = 80

    # -- core distances ----------------------------------------------------
    def _dists(self) -> np.ndarray:
        """(N, J) Euclidean joint errors (computed once; inputs are
        immutable after __init__ — the plots query this 80+ times)."""
        if not hasattr(self, "_dists_cache"):
            self._dists_cache = np.sqrt(
                np.square(self.gtjoints - self.joints).sum(axis=2))
        return self._dists_cache

    # -- scalar metrics (handpose_evaluation.py:92-228) ---------------------
    def getMeanError(self) -> float:
        return float(np.nanmean(np.nanmean(self._dists(), axis=1)))

    def getStdError(self) -> float:
        return float(np.nanmean(np.nanstd(self._dists(), axis=1)))

    def getMeanErrorOverSeq(self) -> np.ndarray:
        return np.nanmean(self._dists(), axis=1)

    def getMedianError(self) -> float:
        return float(np.nanmedian(self._dists()))

    def getMaxError(self) -> float:
        return float(np.nanmax(self._dists()))

    def getMaxErrorOverSeq(self) -> np.ndarray:
        return np.nanmax(self._dists(), axis=1)

    def getJointMeanError(self, joint_id) -> float:
        return float(np.nanmean(self._dists()[:, joint_id]))

    def getJointStdError(self, joint_id) -> float:
        return float(np.nanstd(self._dists()[:, joint_id]))

    def getJointErrorOverSeq(self, joint_id) -> np.ndarray:
        return self._dists()[:, joint_id]

    def getJointDiffOverSeq(self, joint_id) -> np.ndarray:
        return self.gtjoints[:, joint_id, :] - self.joints[:, joint_id, :]

    def getJointMaxError(self, joint_id) -> float:
        return float(np.nanmax(self._dists()[:, joint_id]))

    def getNumFramesWithinMaxDist(self, dist) -> int:
        return int((np.nanmax(self._dists(), axis=1) <= dist).sum())

    def getNumFramesWithinMeanDist(self, dist) -> int:
        return int((np.nanmean(self._dists(), axis=1) <= dist).sum())

    def getNumFramesWithinMedianDist(self, dist) -> int:
        return int((np.median(self._dists(), axis=1) <= dist).sum())

    def getJointNumFramesWithinMaxDist(self, dist, joint_id) -> int:
        return int((self._dists()[:, joint_id] <= dist).sum())

    # -- plots (handpose_evaluation.py:230-346) -----------------------------
    def plotEvaluation(self, basename, method_name="Our method",
                       baseline=None) -> None:
        """Save frames-within-distance curve + per-joint mean/max bars as
        PDFs into ``self.subfolder``."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os

        os.makedirs(self.subfolder, exist_ok=True)
        n = float(self.joints.shape[0])
        series = [(method_name, self)] + list(baseline or [])

        fig, ax = plt.subplots()
        for name, ev in series:
            ax.plot([ev.getNumFramesWithinMaxDist(j) / n * 100.0
                     for j in range(self.plotMaxJointDist)], label=name)
        ax.set_xlabel("Distance threshold / mm")
        ax.set_ylabel("Fraction of frames within distance / %")
        ax.set_ylim(0, 100)
        ax.grid(True)
        if self.dolegend:
            ax.legend(loc="lower right")
        fig.savefig(f"{self.subfolder}/{basename}_frameswithin.pdf",
                    bbox_inches="tight")
        plt.close(fig)

        nj = self.joints.shape[1]
        width = (1 - 0.33) / len(series)
        ind = np.arange(nj + 1)
        fig, ax = plt.subplots()
        for i, (name, ev) in enumerate(series):
            mean = [ev.getJointMeanError(j) for j in range(nj)]
            mean.append(ev.getMeanError())
            ax.bar(ind + width * i, mean, width, label=name)
        ax.set_xticks(ind + width)
        # the reference's NYU 'all' table names only the 32 tracked of
        # 36 joints (handpose_evaluation.py:755-758); pad so the bar
        # plot stays usable at any joint count
        labels = list(self.jointNames or [])[:nj]
        labels += [str(j) for j in range(len(labels), nj)]
        ax.set_xticklabels(labels + ["Avg"], rotation=90)
        ax.set_ylabel("Mean error of joint / mm")
        if self.dolegend:
            ax.legend()
        fig.savefig(f"{self.subfolder}/{basename}_joint_mean.pdf",
                    bbox_inches="tight")
        plt.close(fig)

        fig, ax = plt.subplots()
        for i, (name, ev) in enumerate(series):
            ax.bar(np.arange(nj) + width * i,
                   [ev.getJointMaxError(j) for j in range(nj)], width,
                   label=name)
        ax.set_xticks(np.arange(nj) + width)
        ax.set_xticklabels(labels, rotation=90)
        ax.set_ylabel("Maximum error of joint / mm")
        ax.set_ylim(0, 200)
        if self.dolegend:
            ax.legend()
        fig.savefig(f"{self.subfolder}/{basename}_joint_max.pdf",
                    bbox_inches="tight")
        plt.close(fig)


    # -- 3D point-cloud + stick-figure rendering ----------------------------
    # TPU-era replacement for the reference's VTK module
    # (handpose_evaluation.py:488-681 plotResult3D/vtkPlotHand): same
    # artifact — hand point cloud with prediction (red) and optional
    # ground-truth (blue) ball-and-stick skeletons in metric mm space —
    # rendered with matplotlib 3D (headless-safe) instead of a VTK
    # interactor window.
    def plotHand3D(self, ax, joint3D, colors=(1, 0, 0)):
        """Draw one skeleton onto a 3D axes (vtkPlotHand parity:
        5 mm joint markers + linewidth-3 bone segments; ``colors`` is an
        RGB tuple or 'nice' for the per-joint/per-bone tables)."""
        joint3D = np.asarray(joint3D, np.float64).reshape(-1, 3)
        nice = colors == "nice"
        if nice and not getattr(self, "jointColors", None):
            colors, nice = (1, 0, 0), False  # no tables: plain red
        jc = (list(self.jointColors) if nice
              else [colors] * joint3D.shape[0])
        ax.scatter(joint3D[:, 0], joint3D[:, 1], joint3D[:, 2],
                   c=jc[:joint3D.shape[0]], marker="s", s=25,
                   depthshade=False)
        conns = self.jointConnections or []
        if conns and joint3D.shape[0] > np.max(np.abs(
                np.asarray([c[:2] for c in conns]))):
            ccol = (self.jointConnectionColors
                    if nice and self.jointConnectionColors
                    else [colors] * len(conns))
            for c, col in zip(conns, ccol):
                seg = joint3D[list(c[:2])]
                ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color=col,
                        linewidth=3)

    def plotResult3D(self, dpt, T, gt3Dorig, joint3D, filename=None,
                     showGT=True, showPC=True, niceColors=False,
                     camera=None, background_val=0.0, max_points=4000):
        """3D point cloud + skeleton figure (plotResult3D parity,
        handpose_evaluation.py:488-620).

        ``dpt`` is a metric-mm depth crop, ``T`` its 3x3 crop transform;
        the cloud is back-projected with ``camera.depth_to_pcl``.  Saves
        ``<subfolder>/<filename>.png`` when ``filename`` is given, else
        returns the rendered RGB image array.
        """
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")
        ax.set_facecolor("white")

        if showPC and camera is not None and dpt is not None:
            pcl = camera.depth_to_pcl(dpt, T, background_val=background_val)
            if pcl.shape[0] > max_points:
                pcl = pcl[:: pcl.shape[0] // max_points + 1]
            if pcl.shape[0]:
                ax.scatter(pcl[:, 0], pcl[:, 1], pcl[:, 2], c="0.6", s=1,
                           alpha=0.5, depthshade=False)

        self.plotHand3D(ax, joint3D,
                        "nice" if niceColors else (1, 0, 0))
        if showGT and gt3Dorig is not None:
            self.plotHand3D(ax, gt3Dorig,
                            "nice" if niceColors else (0, 0, 1))

        elev, azim, roll = self.viewport3D
        ax.view_init(elev=elev, azim=azim)
        ax.set_xlabel("x / mm")
        ax.set_ylabel("y / mm")
        ax.set_zlabel("z / mm")
        try:
            ax.set_box_aspect((1, 1, 1))
        except Exception:
            pass

        if filename is not None:
            import os

            os.makedirs(self.subfolder, exist_ok=True)
            fig.savefig(f"{self.subfolder}/{filename}.png",
                        bbox_inches="tight", dpi=100)
            plt.close(fig)
            return None
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return buf

    def plotJoints(self, img, joint, color="nice", jcolor=None,
                   annoscale=1):
        """Draw one skeleton onto a BGR image (plotJoints parity,
        handpose_evaluation.py:437-485): per-connection then per-joint
        colors from the dataset tables when ``'nice'``, their luma
        grayscale when ``'gray'`` (rgb_to_gray, helpers.py:136-143),
        or a fixed BGR tuple."""
        import cv2

        joint = np.asarray(joint)
        conns = self.jointConnections or []

        def _conn_color(i):
            if color == "nice" and self.jointConnectionColors:
                return _to_bgr255(self.jointConnectionColors[i])
            if color == "gray" and self.jointConnectionColors:
                return _to_bgr255(_rgb_to_gray(
                    self.jointConnectionColors[i]))
            if color in ("nice", "gray"):
                return (0, 0, 255)
            return color

        def _joint_color(i):
            jc = color if jcolor is None else jcolor
            if jc == "nice" and self.jointColors:
                return _to_bgr255(self.jointColors[i])
            if jc == "gray" and self.jointColors:
                return _to_bgr255(_rgb_to_gray(self.jointColors[i]))
            if jc in ("nice", "gray"):
                return (0, 0, 255)
            return jc

        if conns and joint.shape[0] > np.max(np.asarray(
                [c[:2] for c in conns])):
            for i, c in enumerate(conns):
                p0 = (int(np.rint(joint[c[0], 0])),
                      int(np.rint(joint[c[0], 1])))
                p1 = (int(np.rint(joint[c[1], 0])),
                      int(np.rint(joint[c[1], 1])))
                cv2.line(img, p0, p1, _conn_color(i),
                         thickness=3 * annoscale, lineType=cv2.LINE_AA)
        for i in range(joint.shape[0]):
            p = (int(np.rint(joint[i, 0])), int(np.rint(joint[i, 1])))
            cv2.circle(img, p, 6 * annoscale, _joint_color(i),
                       thickness=-1, lineType=cv2.LINE_AA)

    def plotResult(self, dpt, gtcrop, joint, name=None, show_gt=True,
                   upsample=4.0, annoscale=1, niceColors=False,
                   showJoints=True, showDepth=True):
        """Annotated depth image (handpose_evaluation.py:348-434):
        prediction + gt skeletons over the normalized depth crop.
        With ``niceColors`` the prediction uses the per-joint /
        per-connection color tables and the gt their grayscale; without,
        prediction blue (0,0,255 BGR) and gt red (255,0,0) as in the
        reference.  Returns the image when ``name`` is None, else saves
        it."""
        import cv2

        if showDepth:
            img = np.asarray(dpt, np.float32).copy()
            msk, msk2 = img > 0, img == 0
            if msk.any():
                lo, hi = img[msk].min(), img[msk].max()
                img = (img - lo) / max(hi - lo, 1e-6) * 255.0
            img[msk2] = 255.0  # display hack to hide ND depth
        else:
            img = np.ones_like(np.asarray(dpt, np.float32)) * 255.0
        img = np.clip(img, 0.0, 255.0)
        img = cv2.cvtColor(img.astype("uint8"), cv2.COLOR_GRAY2BGR)
        if upsample != 1.0:
            img = cv2.resize(img, None, fx=upsample, fy=upsample,
                             interpolation=cv2.INTER_NEAREST)

        def _scale(pts):
            return np.asarray(pts, np.float64)[:, :2] * upsample

        # reference draw order + colors (handpose_evaluation.py:403-419):
        # prediction first (BGR (0,0,255) / 'nice'), then ground truth
        # ((255,0,0) / luma-gray when both shown with niceColors)
        if showJoints and joint is not None:
            self.plotJoints(img, _scale(joint), annoscale=annoscale,
                            color="nice" if niceColors else (0, 0, 255))
        if show_gt and gtcrop is not None:
            gt_color = ("gray" if (showJoints and niceColors)
                        else ("nice" if niceColors else (255, 0, 0)))
            self.plotJoints(img, _scale(gtcrop), annoscale=annoscale,
                            color=gt_color)
        if name is None:
            return img
        cv2.imwrite(name, img)
        return None


def _rgb_to_gray(rgb):
    """Luma grayscale of an RGB [0,1] triple (reference rgb_to_gray,
    src/utils/helpers.py:136-143)."""
    g = 0.21 * rgb[0] + 0.72 * rgb[1] + 0.07 * rgb[2]
    return (g, g, g)


def _to_bgr255(rgb):
    """RGB [0,1] triple -> cv2 BGR int tuple.  (The reference passes
    RGB*255 straight into cv2 and so swaps channels in saved PNGs; we
    draw the intended colors — cosmetic deviation, docs/PARITY.md.)"""
    r, g, b = (int(float(c) * 255.0) for c in rgb[:3])
    return (b, g, r)


def _hsv(h, s, v):
    """HSV triple -> RGB [0,1] ndarray exactly as the reference builds
    its tables (matplotlib.colors.hsv_to_rgb on a [[[h,s,v]]] image,
    reference handpose_evaluation.py:701-736 et al.) so the oracle
    comparison is bitwise."""
    import matplotlib.colors

    return matplotlib.colors.hsv_to_rgb(np.asarray([[[h, s, v]]]))[0, 0]


# one hue per finger: thumb/red, index/green, middle/cyan, ring/blue,
# pinky/magenta — shared by all three datasets' eval tables
_FINGER_HUES = (0.00, 0.33, 0.50, 0.66, 0.83)


class NYUHandposeEvaluation(HandposeEvaluation):
    """NYU joint names/skeleton — the eval classes' OWN tables
    (reference handpose_evaluation.py:740-850), which differ from the
    util.py visPair bone tables (utils/skeleton.py): the eval-14
    skeleton is a tree rooted at the palm C joint, not a chain."""

    def __init__(self, gtjoints, joints, joint_subset=None, **kw):
        super().__init__(gtjoints, joints, **kw)
        nj = np.asarray(gtjoints).shape[1]
        if joint_subset is None:
            joint_subset = "eval" if nj == 14 else "all"
        if joint_subset == "eval":
            # handpose_evaluation.py:823-850 (14-joint eval protocol)
            self.jointNames = ["P1", "P2", "R1", "R2", "M1", "M2", "I1",
                               "I2", "T1", "T2", "T3", "W1", "W2", "C"]
            self.jointColors = (
                [_hsv(h, 1, v) for h in _FINGER_HUES[:4]
                 for v in (0.7, 1.0)]
                + [_hsv(0.83, 1, v) for v in (0.6, 0.8, 1.0)]
                + [_hsv(0.16, 1, 0.7), _hsv(0.16, 1, 1.0),
                   _hsv(0.00, 0, 0.0)])
            self.jointConnections = [[13, 1], [1, 0], [13, 3], [3, 2],
                                     [13, 5], [5, 4], [13, 7], [7, 6],
                                     [13, 10], [10, 9], [9, 8], [13, 11],
                                     [13, 12]]
            self.jointConnectionColors = (
                [_hsv(h, 1, v) for h in _FINGER_HUES[:4]
                 for v in (0.7, 1)]
                + [_hsv(0.83, 1, v) for v in (0.6, 0.8, 1)]
                + [_hsv(0.16, 1, 0.7), _hsv(0.16, 1, 1)])
        elif joint_subset == "all":
            # handpose_evaluation.py:755-822 (full 36-joint layout; the
            # reference names only the 32 tracked joints)
            self.jointNames = (
                [f"{f}{i}" for f in "PRMIT" for i in range(1, 6)]
                + ["C1", "C2", "C3", "W1", "W2", "W3", "W4"])
            self.jointColors = (
                [_hsv(h, 1, v) for h in _FINGER_HUES
                 for v in (0.2, 0.3, 0.4, 0.6, 0.8, 1.0)]
                + [_hsv(0.00, 1, 0.0)] * 3
                + [_hsv(0.16, 1, 0.7)] * 2 + [_hsv(0.16, 1, 1.0)] * 2)
            self.jointConnections = [
                [33, 5], [5, 4], [4, 3], [3, 2], [2, 1], [1, 0],
                [32, 11], [11, 10], [10, 9], [9, 8], [8, 7], [7, 6],
                [32, 17], [17, 16], [16, 15], [15, 14], [14, 13], [13, 12],
                [32, 23], [23, 22], [22, 21], [21, 20], [20, 19], [19, 18],
                [34, 29], [29, 28], [28, 27], [27, 26], [26, 25], [25, 24],
                [34, 32], [34, 33], [33, 32],
                [34, 30], [34, 31], [35, 30], [35, 31]]
            self.jointConnectionColors = (
                [_hsv(h, 1, v) for h in _FINGER_HUES
                 for v in (0.2, 0.3, 0.4, 0.6, 0.8, 1)]
                + [_hsv(0.00, 1, 0.0)] * 3
                + [_hsv(0.16, 1, 0.7)] * 2 + [_hsv(0.16, 1, 1.0)] * 2)
        else:
            raise ValueError("Unknown joint parameter")
        self.plotMaxJointDist = 80


class ICVLHandposeEvaluation(HandposeEvaluation):
    """ICVL joint names/skeleton (handpose_evaluation.py:684-737):
    five 3-segment finger chains rooted at the palm joint 0."""

    def __init__(self, gtjoints, joints, **kw):
        super().__init__(gtjoints, joints, **kw)
        self.jointNames = ["C", "T1", "T2", "T3", "I1", "I2", "I3",
                           "M1", "M2", "M3", "R1", "R2", "R3",
                           "P1", "P2", "P3"]
        self.jointColors = (
            [_hsv(0.00, 0, 0.0)]
            + [_hsv(h, 1, v) for h in _FINGER_HUES
               for v in (0.6, 0.8, 1.0)])
        self.jointConnections = [
            [0, 3 * f + 1] if s == 0 else [3 * f + s, 3 * f + s + 1]
            for f in range(5) for s in range(3)]
        self.jointConnectionColors = [_hsv(h, 1, v) for h in _FINGER_HUES
                                      for v in (0.6, 0.8, 1)]
        self.plotMaxJointDist = 80


class MSRAHandposeEvaluation(HandposeEvaluation):
    """MSRA joint names/skeleton (handpose_evaluation.py:853-913):
    five 4-segment finger chains rooted at the palm joint 0."""

    def __init__(self, gtjoints, joints, **kw):
        super().__init__(gtjoints, joints, **kw)
        self.jointNames = ["C"] + [f"{f}{i}" for f in "TIMRP"
                                   for i in range(1, 5)]
        self.jointColors = (
            [_hsv(0.00, 0, 0.0)]
            + [_hsv(h, 1, v) for h in _FINGER_HUES
               for v in (0.4, 0.6, 0.8, 1.0)])
        self.jointConnections = [
            [0, 4 * f + 1] if s == 0 else [4 * f + s, 4 * f + s + 1]
            for f in range(5) for s in range(4)]
        self.jointConnectionColors = [_hsv(h, 1, v) for h in _FINGER_HUES
                                      for v in (0.4, 0.6, 0.8, 1)]
        self.plotMaxJointDist = 80


class Evaluation:
    """Legacy mm-error helpers on x50-denormalized poses restricted to the
    NYU 14-joint protocol (reference src/utils/evaluation.py:5-77)."""

    SCALE = 50.0

    @classmethod
    def maxJntError(cls, skel1, skel2) -> float:
        diff = np.linalg.norm(
            (np.asarray(skel1).reshape(-1, 3)
             - np.asarray(skel2).reshape(-1, 3)) * cls.SCALE, axis=1)
        return float(diff[NYU_RESTRICTED_EVAL].max())

    @classmethod
    def meanJntError(cls, skel1, skel2) -> float:
        diff = np.linalg.norm(
            (np.asarray(skel1).reshape(-1, 3)
             - np.asarray(skel2).reshape(-1, 3)) * cls.SCALE, axis=1)
        return float(diff[NYU_RESTRICTED_EVAL].mean())

    @classmethod
    def plotError(cls, score_list, fig_path) -> float:
        """Write the threshold curve as text; return %<=40.5mm
        (evaluation.py:29-77)."""
        scores = np.sort(np.asarray(score_list, np.float64))
        err40 = float((scores <= 40.5).mean()) if scores.size else 0.0
        thresholds = [t * 5.0 + 0.5 for t in range(17)]
        with open(fig_path, "w") as f:
            for th in thresholds:
                pct = float((scores < th).mean()) * 100.0 if scores.size \
                    else 0.0
                f.write(f"{th:f} {pct:f}\n")
        return err40
