"""Serve-path tests: on-device preprocessing vs the host detector, the
fused estimator program, and the latent walk."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.data.augment import normalize
from lsps_tpu.data.camera import Camera
from lsps_tpu.data.detector import HandDetector
from lsps_tpu.data.importers import DepthImporter
from lsps_tpu.data.synthetic import render_hand_depth
from lsps_tpu.models import build_model
from lsps_tpu.serve.preprocess_jax import crop_normalize
from lsps_tpu.serve.inference import PoseEstimator, latent_walk

HYP = default_hyperparameters(reg_dim=108, small=True)
HYP["dis"]["ch"] = 4
HYP["gen"]["ch"] = 4


def _frame():
    cam = Camera.nyu()
    gen = np.random.RandomState(7)
    com3d = np.array([0.0, 0.0, 750.0], np.float32)
    dpt, joints = render_hand_depth(cam, com3d, 36, gen)
    return cam, dpt, com3d


def test_device_preprocess_close_to_host():
    cam, dpt, com3d = _frame()
    cube = np.array([300.0, 300.0, 300.0], np.float32)
    com_img = cam.to_img(com3d)

    # host (bit-parity) path
    imp = DepthImporter(cam)
    hd = HandDetector(dpt.copy(), cam.fx, cam.fy, importer=imp)
    crop, M_host, _ = hd.crop_area_3d(com=com_img, size=tuple(cube))
    host = normalize(crop.copy(), com_img, cube)

    # device path
    dev, M_dev = crop_normalize(jnp.asarray(dpt), jnp.asarray(com_img),
                                jnp.asarray(cube), cam.fx, cam.fy)
    dev = np.asarray(dev)

    assert dev.shape == (128, 128)
    assert dev.min() >= -1.0 - 1e-5 and dev.max() <= 1.0 + 1e-5
    np.testing.assert_allclose(np.asarray(M_dev), M_host, rtol=1e-3,
                               atol=0.51)
    # NN sampling differences live at object borders; the bulk must agree
    frac_equal = np.mean(np.abs(dev - host) < 1e-3)
    assert frac_equal > 0.95, f"only {frac_equal:.2%} pixels match"


def test_pose_estimator_end_to_end():
    cam, dpt, com3d = _frame()
    cube = np.array([300.0, 300.0, 300.0], np.float32)
    key = jax.random.PRNGKey(0)
    kd, kv = jax.random.split(key)
    params = {"dis": build_model(HYP["dis"]).init(kd),
              "vae": build_model(HYP["vae"]).init(kv)}
    est = PoseEstimator(HYP, params, camera=cam)

    joints = est.predict_frame(dpt, cam.to_img(com3d), cube)
    assert joints.shape == (36, 3)
    assert np.isfinite(joints).all()
    # untrained net outputs near-zero normalized pose -> joints near com
    assert np.abs(joints - com3d).max() < 300.0

    # crops API
    crops = np.zeros((2, 128, 128, 1), np.float32)
    pose = est.predict_crops(crops)
    assert pose.shape == (2, 108)


def test_pose_estimator_sharded_matches_single_device():
    """Throughput serving: batch sharded over an 8-device data mesh must
    reproduce the single-device outputs (weights replicated, GSPMD
    splits the fused program)."""
    from lsps_tpu.parallel.mesh import make_mesh

    cam, dpt, com3d = _frame()
    key = jax.random.PRNGKey(0)
    kd, kv = jax.random.split(key)
    params = {"dis": build_model(HYP["dis"]).init(kd),
              "vae": build_model(HYP["vae"]).init(kv)}

    frames = np.stack([dpt + i for i in range(8)]).astype(np.float32)
    coms = np.tile(cam.to_img(com3d), (8, 1)).astype(np.float32)
    cubes = np.full((8, 3), 300.0, np.float32)

    single = PoseEstimator(HYP, params, camera=cam)
    want = single.predict_frames(frames, coms, cubes)

    mesh = make_mesh(n_data=8)
    sharded = PoseEstimator(HYP, params, camera=cam, mesh=mesh)
    out_dev = sharded._frames_to_pose(sharded.params,
                                      jnp.asarray(frames),
                                      jnp.asarray(coms),
                                      jnp.asarray(cubes))
    # the output really is laid out across all 8 devices
    assert len(out_dev.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out_dev), want, rtol=1e-5,
                               atol=1e-4)


def test_predict_raw_sharded_matches_single_device():
    """The FULL raw path — on-device detection included — under the
    8-device data mesh: GSPMD must split detect+crop+regress+decode
    per-frame and reproduce the single-device joints AND CoMs.  One
    frame is undetectable (all invalid depth) so the zero-CoM failure
    path is exercised under sharding too."""
    from lsps_tpu.parallel.mesh import make_mesh

    cam, dpt, _ = _frame()
    frames = np.stack([dpt + 2.0 * i for i in range(8)]).astype(np.float32)
    frames[5] = 0.0  # no qualifying slice -> zero CoM on that shard
    cubes = np.full((8, 3), 300.0, np.float32)

    key = jax.random.PRNGKey(0)
    kd, kv = jax.random.split(key)
    params = {"dis": build_model(HYP["dis"]).init(kd),
              "vae": build_model(HYP["vae"]).init(kv)}

    single = PoseEstimator(HYP, params, camera=cam)
    want_j, want_c = single.predict_raw(frames, cubes, return_coms=True)
    assert want_c[5, 2] == 0.0 and np.any(want_c[0] != 0.0)

    sharded = PoseEstimator(HYP, params, camera=cam,
                            mesh=make_mesh(n_data=8))
    got_j, got_c = sharded.predict_raw(frames, cubes, return_coms=True)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got_j, want_j, rtol=1e-5, atol=1e-3)


def test_latent_walk_shapes():
    gen = build_model(HYP["gen"])
    params = gen.init(jax.random.PRNGKey(1))
    z0 = jnp.zeros((32, 32, HYP["gen"]["ch"] * 4))
    z1 = jnp.ones((32, 32, HYP["gen"]["ch"] * 4))
    out_a, out_b = latent_walk(gen, params, z0, z1, steps=4)
    assert out_a.shape == (4, 128, 128, 1)
    assert out_b.shape == (4, 128, 128, 1)
    assert np.isfinite(out_a).all()


def test_sharded_estimator_rejects_indivisible_batch():
    from lsps_tpu.parallel.mesh import make_mesh

    cam, dpt, com3d = _frame()
    key = jax.random.PRNGKey(0)
    kd, kv = jax.random.split(key)
    params = {"dis": build_model(HYP["dis"]).init(kd),
              "vae": build_model(HYP["vae"]).init(kv)}
    est = PoseEstimator(HYP, params, camera=cam, mesh=make_mesh(n_data=8))
    with pytest.raises(ValueError, match="not divisible"):
        est.predict_frame(dpt, cam.to_img(com3d),
                          np.array([300.0, 300.0, 300.0], np.float32))

    # and a sharded estimator cannot be exported
    from lsps_tpu.serve import export_pose_program
    with pytest.raises(ValueError, match="mesh-free"):
        export_pose_program(est, batch=8)
