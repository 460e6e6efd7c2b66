"""Parity vs the reference's OWN evaluation code (§2.6 oracle).

Drives the genuine ``utils/handpose_evaluation.py`` and legacy
``utils/evaluation.py`` from ``/root/reference`` (loaded by
``tests/ref_preproc_oracle.py`` with the py2-era shims) against our
``lsps_tpu.eval.handpose_evaluation`` on identical inputs — these are
the functions that produce every headline number (mean/max mm error,
"Max over 40mm", frames-within-X curves), so the metric layer itself
is now checked against the artifact, not a re-derivation.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from ref_preproc_oracle import load_ref_preproc, reference_available  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")


@pytest.fixture(scope="module")
def ref():
    return load_ref_preproc()


@pytest.fixture(scope="module")
def joint_data():
    rs = np.random.RandomState(42)
    gt = rs.uniform(-100, 100, (50, 14, 3))
    pred = gt + rs.normal(0, 15, gt.shape)
    # a few NaN joints exercise the reference's nanmean paths
    pred[3, 5] = np.nan
    pred[17, 0] = np.nan
    return gt, pred


@pytest.fixture(scope="module")
def pair(ref, joint_data):
    from lsps_tpu.eval.handpose_evaluation import HandposeEvaluation

    gt, pred = joint_data
    return (ref["handpose_evaluation"].HandposeEvaluation(gt, pred),
            HandposeEvaluation(gt, pred))


SCALARS = ["getMeanError", "getStdError", "getMedianError", "getMaxError"]
SEQS = ["getMeanErrorOverSeq", "getMaxErrorOverSeq"]
PER_JOINT = ["getJointMeanError", "getJointStdError", "getJointMaxError"]


@pytest.mark.parametrize("name", SCALARS)
def test_scalar_metric_matches_reference(pair, name):
    ref_ev, our_ev = pair
    np.testing.assert_allclose(getattr(our_ev, name)(),
                               getattr(ref_ev, name)(), rtol=0, atol=1e-12)


@pytest.mark.parametrize("name", SEQS)
def test_sequence_metric_matches_reference(pair, name):
    ref_ev, our_ev = pair
    np.testing.assert_allclose(getattr(our_ev, name)(),
                               getattr(ref_ev, name)(), rtol=0, atol=1e-12)


@pytest.mark.parametrize("name", PER_JOINT)
def test_per_joint_metric_matches_reference(pair, name):
    ref_ev, our_ev = pair
    for j in range(14):
        np.testing.assert_allclose(getattr(our_ev, name)(j),
                                   getattr(ref_ev, name)(j),
                                   rtol=0, atol=1e-12)


def test_frames_within_dist_matches_reference(pair):
    ref_ev, our_ev = pair
    for dist in (5, 10, 20, 40, 80):
        assert (our_ev.getNumFramesWithinMaxDist(dist)
                == ref_ev.getNumFramesWithinMaxDist(dist))
        assert (our_ev.getNumFramesWithinMeanDist(dist)
                == ref_ev.getNumFramesWithinMeanDist(dist))
        for j in (0, 7, 13):
            assert (our_ev.getJointNumFramesWithinMaxDist(dist, j)
                    == ref_ev.getJointNumFramesWithinMaxDist(dist, j))


# ---------------------------------------------------------------------------
# per-dataset render/skeleton config
# ---------------------------------------------------------------------------

def _tables(ev):
    return (np.asarray(ev.jointConnections, dtype=np.int64),
            np.asarray([np.asarray(c, np.float64).reshape(-1)
                        for c in ev.jointConnectionColors]))


def test_nyu_eval_tables_match_reference(ref, joint_data):
    from lsps_tpu.eval.handpose_evaluation import NYUHandposeEvaluation

    gt, pred = joint_data
    ref_ev = ref["handpose_evaluation"].NYUHandposeEvaluation(
        gt, pred, joints="eval")
    our_ev = NYUHandposeEvaluation(gt, pred, joint_subset="eval")
    assert list(our_ev.jointNames) == list(ref_ev.jointNames)
    rc, rcol = _tables(ref_ev)
    oc, ocol = _tables(our_ev)
    np.testing.assert_array_equal(oc, rc)
    np.testing.assert_allclose(ocol, rcol, rtol=0, atol=1e-12)


def test_icvl_tables_match_reference(ref):
    from lsps_tpu.eval.handpose_evaluation import ICVLHandposeEvaluation

    rs = np.random.RandomState(1)
    gt = rs.uniform(-80, 80, (10, 16, 3))
    pred = gt + rs.normal(0, 10, gt.shape)
    ref_ev = ref["handpose_evaluation"].ICVLHandposeEvaluation(gt, pred)
    our_ev = ICVLHandposeEvaluation(gt, pred)
    assert list(our_ev.jointNames) == list(ref_ev.jointNames)
    rc, rcol = _tables(ref_ev)
    oc, ocol = _tables(our_ev)
    np.testing.assert_array_equal(oc, rc)
    np.testing.assert_allclose(ocol, rcol, rtol=0, atol=1e-12)


def test_msra_tables_match_reference(ref):
    from lsps_tpu.eval.handpose_evaluation import MSRAHandposeEvaluation

    rs = np.random.RandomState(2)
    gt = rs.uniform(-80, 80, (10, 21, 3))
    pred = gt + rs.normal(0, 10, gt.shape)
    ref_ev = ref["handpose_evaluation"].MSRAHandposeEvaluation(gt, pred)
    our_ev = MSRAHandposeEvaluation(gt, pred)
    assert list(our_ev.jointNames) == list(ref_ev.jointNames)
    rc, rcol = _tables(ref_ev)
    oc, ocol = _tables(our_ev)
    np.testing.assert_array_equal(oc, rc)
    np.testing.assert_allclose(ocol, rcol, rtol=0, atol=1e-12)


# ---------------------------------------------------------------------------
# legacy Evaluation (the "Mean err / Max over 40mm" printer's math)
# ---------------------------------------------------------------------------

def test_legacy_evaluation_matches_reference(ref, tmp_path):
    from lsps_tpu.eval.handpose_evaluation import Evaluation

    RefEval = ref["evaluation"].Evaluation
    rs = np.random.RandomState(9)
    skel_gt = rs.randn(36 * 3) * 0.8
    skel_pred = skel_gt + rs.randn(36 * 3) * 0.2
    assert Evaluation.maxJntError(skel_gt, skel_pred) == pytest.approx(
        RefEval.maxJntError(skel_gt, skel_pred), abs=1e-12)
    assert Evaluation.meanJntError(skel_gt, skel_pred) == pytest.approx(
        RefEval.meanJntError(skel_gt, skel_pred), abs=1e-12)

    scores = list(rs.uniform(0, 85, 200))
    ref_txt = tmp_path / "ref.txt"
    our_txt = tmp_path / "ours.txt"
    ref_err40 = RefEval.plotError(list(scores), str(ref_txt))
    our_err40 = Evaluation.plotError(list(scores), str(our_txt))
    assert our_err40 == pytest.approx(ref_err40, abs=1e-12)
    assert our_txt.read_text() == ref_txt.read_text()
