"""Metric tests on hand-constructed arrays (SURVEY.md §4 plan)."""

import numpy as np
import pytest

from lsps_tpu.eval import HandposeEvaluation, NYUHandposeEvaluation
from lsps_tpu.eval.handpose_evaluation import Evaluation, NYU_RESTRICTED_EVAL


def test_mean_and_max_error():
    gt = np.zeros((2, 3, 3))
    pred = np.zeros((2, 3, 3))
    pred[0, 0, 0] = 3.0   # 3mm error on one joint
    pred[1, :, 1] = 4.0   # 4mm error on all joints of frame 1
    hpe = HandposeEvaluation(gt, pred)
    assert hpe.getMeanError() == pytest.approx((3.0 / 3 + 4.0) / 2)
    assert hpe.getMaxError() == pytest.approx(4.0)
    assert hpe.getJointMeanError(0) == pytest.approx((3.0 + 4.0) / 2)
    assert hpe.getJointMaxError(2) == pytest.approx(4.0)


def test_frames_within_dist():
    gt = np.zeros((4, 2, 3))
    pred = np.zeros((4, 2, 3))
    pred[0, 0, 0] = 10.0
    pred[1, 0, 0] = 30.0
    pred[2, 0, 0] = 50.0
    # frame 3 perfect
    hpe = HandposeEvaluation(gt, pred)
    assert hpe.getNumFramesWithinMaxDist(40) == 3
    assert hpe.getNumFramesWithinMaxDist(20) == 2
    assert hpe.getNumFramesWithinMaxDist(5) == 1


def test_nan_tolerance():
    gt = np.zeros((2, 2, 3))
    pred = np.zeros((2, 2, 3))
    pred[0, 0] = np.nan
    pred[1, 0, 0] = 6.0
    hpe = HandposeEvaluation(gt, pred)
    assert np.isfinite(hpe.getMeanError())
    assert hpe.getMaxError() == pytest.approx(6.0)


def test_shape_validation():
    with pytest.raises(ValueError):
        HandposeEvaluation(np.zeros((2, 3, 3)), np.zeros((3, 3, 3)))


def test_legacy_evaluation_nyu_protocol(tmp_path):
    skel1 = np.zeros((36, 3))
    skel2 = np.zeros((36, 3))
    skel2[0, 0] = 0.1  # joint 0 in the restricted set: 0.1*50 = 5mm
    skel2[1, 0] = 9.9  # joint 1 NOT in the restricted set: ignored
    assert Evaluation.maxJntError(skel1, skel2) == pytest.approx(5.0)
    assert Evaluation.meanJntError(skel1, skel2) == pytest.approx(
        5.0 / len(NYU_RESTRICTED_EVAL))
    err40 = Evaluation.plotError([10.0, 30.0, 50.0], str(tmp_path / "e.txt"))
    assert err40 == pytest.approx(2 / 3)
    lines = open(tmp_path / "e.txt").read().strip().splitlines()
    assert len(lines) == 17


def test_plot_evaluation_writes_pdfs(tmp_path):
    gt = np.random.RandomState(0).randn(5, 14, 3) * 10
    pred = gt + np.random.RandomState(1).randn(5, 14, 3)
    hpe = NYUHandposeEvaluation(gt, pred)
    hpe.subfolder = str(tmp_path)
    hpe.plotEvaluation("test")
    import os

    assert os.path.isfile(tmp_path / "test_frameswithin.pdf")
    assert os.path.isfile(tmp_path / "test_joint_mean.pdf")
    assert os.path.isfile(tmp_path / "test_joint_max.pdf")


def test_plot_result_3d_saves_and_returns(tmp_path):
    """plotResult3D parity artifact (reference handpose_evaluation.py:
    488-681): point cloud + pred/gt skeletons, saved PNG and returned
    image array."""
    from lsps_tpu.data.camera import Camera

    cam = Camera.nyu()
    rng = np.random.RandomState(3)
    com = np.array([0.0, 0.0, 800.0])
    gt = com + rng.randn(14, 3) * 30
    pred = gt + rng.randn(14, 3) * 3
    hpe = NYUHandposeEvaluation(gt[None], pred[None])
    assert len(hpe.jointConnections) > 0
    assert len(hpe.jointColors) == 14

    # synthetic metric-mm depth crop + its crop transform
    dpt = np.zeros((128, 128), np.float32)
    dpt[40:90, 40:90] = 800.0 + rng.rand(50, 50) * 60
    T = np.array([[1.0, 0.0, 256.0], [0.0, 1.0, 176.0], [0.0, 0.0, 1.0]])

    hpe.subfolder = str(tmp_path)
    hpe.plotResult3D(dpt, T, gt, pred, filename="pc3d", camera=cam,
                     niceColors=True)
    import os

    assert os.path.isfile(tmp_path / "pc3d.png")
    assert os.path.getsize(tmp_path / "pc3d.png") > 1000

    img = hpe.plotResult3D(dpt, T, gt, pred, filename=None, camera=cam)
    assert img.ndim == 3 and img.shape[2] == 3 and img.size > 0


def test_plot_result_3d_nice_colors_without_tables(tmp_path):
    """niceColors=True on a base evaluation (no per-dataset color
    tables) must fall back to plain colors, not crash — regression for
    the synth-config CLI path."""
    gt = np.random.RandomState(0).randn(2, 36, 3) * 20 + [0, 0, 800]
    hpe = HandposeEvaluation(gt, gt + 1.0)
    hpe.subfolder = str(tmp_path)
    hpe.plotResult3D(None, None, gt[0], gt[0] + 1.0, filename="nofix",
                     showPC=False, niceColors=True)
    import os

    assert os.path.isfile(tmp_path / "nofix.png")


def test_plot_result_2d_nice_and_gray(tmp_path):
    """2D annotated render (reference handpose_evaluation.py:348-486):
    niceColors draws per-joint/per-connection table colors for the
    prediction and luma-grayscale for the gt; default mode draws
    prediction (0,0,255) and gt (255,0,0) BGR."""
    rng = np.random.RandomState(5)
    gt = rng.rand(14, 3) * 100 + 10
    pred = gt + rng.randn(14, 3) * 3
    hpe = NYUHandposeEvaluation(gt[None], pred[None])
    dpt = np.zeros((128, 128), np.float32)
    dpt[30:100, 30:100] = 700.0 + rng.rand(70, 70) * 100

    img = hpe.plotResult(dpt, gt, pred, niceColors=False)
    assert img.shape == (512, 512, 3)
    # default mode: pure red and pure blue strokes present (BGR image)
    assert (np.all(img == (0, 0, 255), axis=-1)).any()    # prediction
    assert (np.all(img == (255, 0, 0), axis=-1)).any()    # ground truth

    img2 = hpe.plotResult(dpt, gt, pred, niceColors=True)
    # per-joint colors: strokes beyond red/blue/grayscale appear
    colored = img2[(img2[..., 0] != img2[..., 1])
                   | (img2[..., 1] != img2[..., 2])]
    assert len(np.unique(colored.reshape(-1, 3), axis=0)) > 4
    # saved variant
    hpe.plotResult(dpt, gt, pred, name=str(tmp_path / "anno.png"),
                   niceColors=True)
    import os

    assert os.path.getsize(tmp_path / "anno.png") > 1000


def test_plot_result_2d_no_tables_fallback():
    """plotResult with niceColors on a base evaluation (no color
    tables) must fall back, not crash."""
    gt = np.random.RandomState(0).rand(2, 36, 3) * 100
    hpe = HandposeEvaluation(gt, gt + 1.0)
    dpt = np.ones((128, 128), np.float32) * 700
    img = hpe.plotResult(dpt, gt[0], gt[0] + 1.0, niceColors=True)
    assert img.shape == (512, 512, 3)
