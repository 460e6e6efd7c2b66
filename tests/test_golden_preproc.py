"""Golden-fixture tests for the mm-critical preprocessing path.

``tests/golden/preproc_golden.npz`` freezes seeded outputs of
crop_area_3d (reference handdetector.py:384-492), normalize +
augment_crop in all four modes (dataset_hand2.py:34-119), docom
refinement, and the ND-aware bilinear resize (handdetector.py:134-204).
The host path must reproduce them BIT-EXACTLY; the fused native/jax
batch backends must stay within NN-rounding-tie tolerance of the same
frozen stream.  Any drift — refactor, backend change, numeric shortcut —
fails here before it can corrupt the ±0.5 mm parity gate.

Regenerate deliberately with ``python tests/golden/gen_golden_preproc.py``.
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN = os.path.join(GOLDEN_DIR, "preproc_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


@pytest.fixture(scope="module")
def rebuilt():
    sys.path.insert(0, GOLDEN_DIR)
    try:
        import gen_golden_preproc as gen
    finally:
        sys.path.pop(0)
    return gen.build()


def test_golden_inputs_are_stable(golden, rebuilt):
    """The generator's synthetic inputs must themselves be frozen —
    otherwise output comparisons are vacuous."""
    np.testing.assert_array_equal(rebuilt["dpt"], golden["dpt"])
    np.testing.assert_array_equal(rebuilt["gt3d"], golden["gt3d"])


@pytest.mark.parametrize("tag", ["a", "b", "c", "docom"])
def test_crop_area_3d_bit_exact(golden, rebuilt, tag):
    np.testing.assert_array_equal(rebuilt[f"crop_{tag}"],
                                  golden[f"crop_{tag}"])
    np.testing.assert_array_equal(rebuilt[f"M_{tag}"], golden[f"M_{tag}"])
    np.testing.assert_array_equal(rebuilt[f"com_{tag}"],
                                  golden[f"com_{tag}"])


def test_normalize_bit_exact(golden, rebuilt):
    np.testing.assert_array_equal(rebuilt["norm"], golden["norm"])


@pytest.mark.parametrize("mode", ["none", "com", "rot", "sc"])
def test_augment_crop_bit_exact(golden, rebuilt, mode):
    for field in ("img", "label", "cube", "com", "M", "rot"):
        np.testing.assert_array_equal(
            rebuilt[f"aug_{mode}_{field}"], golden[f"aug_{mode}_{field}"],
            err_msg=f"aug {mode} {field}")


def test_bilinear_resize_bit_exact(golden, rebuilt):
    np.testing.assert_array_equal(rebuilt["bilin_out"],
                                  golden["bilin_out"])


# ---------------------------------------------------------------------------
# batch backends vs the frozen per-sample stream: the synthetic dataset
# drives crop+augment through FastAugmenter with both backends and pins
# the outputs against a frozen digest of the host per-sample path.
# ---------------------------------------------------------------------------

SPEC = {"seed": 23455, "root": "", "subset": "train", "docom": False,
        "augment": True, "sample_poses": 0, "joint_subset": "NYU",
        "n_frames": 4, "n_joints": 36, "class_name": "dataset_hand_synth"}


@pytest.fixture(scope="module")
def host_batch():
    import lsps_tpu.data.synthetic  # noqa: F401
    from lsps_tpu.data.loader import get_dataset

    ds = get_dataset(SPEC)
    outs = [ds[i] for i in range(len(ds))]
    return tuple(np.stack([o[j] for o in outs]) for j in range(5))


@pytest.mark.parametrize("backend", ["native", "jax"])
def test_batch_backend_matches_host_stream(host_batch, backend):
    import lsps_tpu.data.synthetic  # noqa: F401
    from lsps_tpu.data.fast_augment import FastAugmenter, available
    from lsps_tpu.data.loader import get_dataset

    if not available(backend):
        pytest.skip(f"{backend} backend unavailable here")
    fa = FastAugmenter(get_dataset(SPEC), backend=backend)
    imgs, lbl, com, m, cube = fa.batch(list(range(len(host_batch[0]))))
    np.testing.assert_allclose(lbl, host_batch[1], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(com, host_batch[2], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(m, host_batch[3], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(cube, host_batch[4], rtol=1e-5)
    agree = np.mean(np.abs(imgs - host_batch[0]) < 1e-3)
    assert agree > 0.97, f"{backend}: only {agree:.2%} pixels agree"
