"""The serving crop's two warp lowerings must agree bit-exactly.

``warp="einsum"`` replaces the elementwise ``dpt[iy, ix]`` gather with
separable one-hot contractions (the crop affine is axis-aligned); at
``Precision.HIGHEST`` each output pixel is 1.0 * value + zeros, so the
two lowerings must be IDENTICAL — including out-of-bounds rows/columns
(all-zero one-hot vs clipped-gather-then-mask) and the z-threshold /
sentinel chain downstream.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lsps_tpu.data.camera import Camera
from lsps_tpu.serve.preprocess_jax import crop_normalize


CAM = Camera.nyu()


def _frames(n=6, h=480, w=640, seed=3):
    rng = np.random.RandomState(seed)
    dpt = rng.uniform(500.0, 1200.0, (h, w)).astype(np.float32)
    dpt[rng.rand(h, w) < 0.1] = 0.0  # invalid pixels
    cases = []
    for i in range(n):
        # spread CoMs from frame center to beyond the border so the
        # crop window crosses / leaves the source frame
        u = 40.0 + i * 130.0
        v = 30.0 + i * 95.0
        z = 600.0 + 90.0 * i
        cube = 250.0 + 25.0 * i
        cases.append((np.array([u, v, z], np.float32),
                      np.array([cube] * 3, np.float32)))
    return dpt, cases


@pytest.mark.parametrize("dsize", [(128, 128), (96, 64)])
def test_einsum_warp_bit_identical_to_gather(dsize):
    dpt, cases = _frames()
    for com, cube in cases:
        g, Mg = crop_normalize(jnp.asarray(dpt), jnp.asarray(com),
                               jnp.asarray(cube), CAM.fx, CAM.fy,
                               dsize=dsize, warp="gather")
        e, Me = crop_normalize(jnp.asarray(dpt), jnp.asarray(com),
                               jnp.asarray(cube), CAM.fx, CAM.fy,
                               dsize=dsize, warp="einsum")
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e),
                                      err_msg=f"com={com} cube={cube}")
        np.testing.assert_array_equal(np.asarray(Mg), np.asarray(Me))


def test_non_finite_pixels_sanitized_both_warps():
    """A NaN/inf pixel ANYWHERE in the frame must not poison the crop.

    The einsum lowering contracts over every frame pixel with 0/1
    weights (0 * inf = NaN), so without up-front sanitization a single
    bad pixel — even far outside the crop window — would NaN the whole
    output while the gather path stayed clean (round-3 review finding).
    Both lowerings must treat non-finite as the invalid-depth sentinel
    and stay bit-identical."""
    dpt, cases = _frames()
    dpt[5, 5] = np.nan        # far corner, outside every crop window
    dpt[470, 630] = np.inf
    com, cube = cases[2]
    outs = {}
    for warp in ("gather", "einsum"):
        v, _ = crop_normalize(jnp.asarray(dpt), jnp.asarray(com),
                              jnp.asarray(cube), CAM.fx, CAM.fy,
                              warp=warp)
        outs[warp] = np.asarray(v)
        assert np.isfinite(outs[warp]).all(), warp
    np.testing.assert_array_equal(outs["gather"], outs["einsum"])

    # a non-finite pixel INSIDE the window behaves as invalid depth (0)
    clean = np.nan_to_num(dpt, nan=0.0, posinf=0.0, neginf=0.0)
    v, _ = crop_normalize(jnp.asarray(dpt), jnp.asarray(com),
                          jnp.asarray(cube), CAM.fx, CAM.fy)
    w, _ = crop_normalize(jnp.asarray(clean), jnp.asarray(com),
                          jnp.asarray(cube), CAM.fx, CAM.fy)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(w))


def test_estimator_warp_selection_matches():
    """PoseEstimator(warp=...) threads through to identical joints."""
    import jax
    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.models import build_model
    from lsps_tpu.serve.inference import PoseEstimator

    hyp = default_hyperparameters(reg_dim=108, small=True)
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    kd, kv = jax.random.split(jax.random.PRNGKey(0))
    params = {"dis": build_model(hyp["dis"]).init(kd),
              "vae": build_model(hyp["vae"]).init(kv)}
    dpt, cases = _frames(n=1)
    com, cube = cases[0]
    outs = []
    for warp in ("gather", "einsum"):
        est = PoseEstimator(hyp, params, camera=CAM, warp=warp)
        assert est.warp == warp
        outs.append(est.predict_frame(dpt, com, cube))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_unknown_warp_rejected():
    dpt, cases = _frames(n=1)
    com, cube = cases[0]
    with pytest.raises(ValueError, match="unknown warp"):
        crop_normalize(jnp.asarray(dpt), jnp.asarray(com),
                       jnp.asarray(cube), CAM.fx, CAM.fy, warp="bogus")
