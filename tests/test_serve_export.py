"""AOT serving export: serialize the fused depth->pose program with
jax.export and run it back from the artifact alone.

The reference deploys by running torch from a live Python process
(SURVEY.md §3.4); the export path is the TPU-native replacement —
a self-contained StableHLO program with weights baked in.
"""

import numpy as np
import pytest

import jax

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.data.camera import Camera
from lsps_tpu.data.synthetic import render_hand_depth
from lsps_tpu.models import build_model
from lsps_tpu.serve import (PoseEstimator, export_pose_program,
                            load_pose_program, save_pose_program)

HYP = default_hyperparameters(reg_dim=108, small=True)
HYP["dis"]["ch"] = 4
HYP["gen"]["ch"] = 4


def _estimator_and_batch(batch=2):
    cam = Camera.nyu()
    key = jax.random.PRNGKey(0)
    kd, kv = jax.random.split(key)
    params = {"dis": build_model(HYP["dis"]).init(kd),
              "vae": build_model(HYP["vae"]).init(kv)}
    est = PoseEstimator(HYP, params, camera=cam)

    gen = np.random.RandomState(7)
    frames, coms, cubes = [], [], []
    for i in range(batch):
        com3d = np.array([20.0 * i, -10.0 * i, 750.0 + 30 * i], np.float32)
        dpt, _ = render_hand_depth(cam, com3d, 36, gen)
        frames.append(dpt)
        coms.append(cam.to_img(com3d))
        cubes.append([300.0, 300.0, 300.0])
    return est, (np.stack(frames).astype(np.float32),
                 np.stack(coms).astype(np.float32),
                 np.asarray(cubes, np.float32))


def test_export_roundtrip_static_batch(tmp_path):
    est, (frames, coms, cubes) = _estimator_and_batch(batch=2)
    want = est.predict_frames(frames, coms, cubes)

    exported = export_pose_program(est, batch=2,
                                   frame_shape=frames.shape[1:])
    path = str(tmp_path / "pose_b2.lsps")
    save_pose_program(path, exported)

    run = load_pose_program(path)
    got = run(frames, coms, cubes)
    assert got.shape == want.shape == (2, 36, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_export_symbolic_batch(tmp_path):
    est, (frames, coms, cubes) = _estimator_and_batch(batch=3)
    exported = export_pose_program(est, batch=None,
                                   frame_shape=frames.shape[1:])
    path = str(tmp_path / "pose_bN.lsps")
    save_pose_program(path, exported)
    run = load_pose_program(path)

    # one artifact, two different batch sizes
    got3 = run(frames, coms, cubes)
    got1 = run(frames[:1], coms[:1], cubes[:1])
    want3 = est.predict_frames(frames, coms, cubes)
    assert got3.shape == (3, 36, 3) and got1.shape == (1, 36, 3)
    np.testing.assert_allclose(got3, want3, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got1, want3[:1], rtol=1e-5, atol=1e-4)


def test_load_rejects_foreign_file(tmp_path):
    p = tmp_path / "junk.lsps"
    p.write_bytes(b"not an export")
    with pytest.raises(ValueError, match="bad header"):
        load_pose_program(str(p))


def test_export_model_cli_from_snapshots(tmp_path):
    """The export CLI: snapshots -> deployable artifact -> joints, all
    from the config file alone."""
    import yaml

    from lsps_tpu.cli.export_model import main as export_main
    from lsps_tpu.train.trainer import LSPSTrainer

    hyp = dict(HYP)
    prefix = str(tmp_path / "out" / "pre")
    trainer = LSPSTrainer(hyp)
    state = trainer.init_state(jax.random.PRNGKey(2))
    trainer.save(state, prefix, 99)
    trainer.save_vae(state, prefix, 99, 2.0)

    cfg_path = str(tmp_path / "exp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"train": {
            "snapshot_prefix": prefix, "snapshot_save_iterations": 100,
            "image_save_iterations": 100, "image_display_iterations": 100,
            "display": 10, "hyperparameters": hyp, "datasets": {}}}, f)

    est, (frames, coms, cubes) = _estimator_and_batch(batch=1)
    art = str(tmp_path / "pose.lsps")
    export_main(["--config", cfg_path, "--out", art, "--batch", "1",
                 "--frame-shape",
                 f"{frames.shape[1]},{frames.shape[2]}"])
    run = load_pose_program(art)
    joints = run(frames, coms, cubes)
    assert joints.shape == (1, 36, 3)
    # matches a live estimator built from the same saved params
    want = PoseEstimator(hyp, state["params"],
                         camera=est.camera).predict_frames(
        frames, coms, cubes)
    np.testing.assert_allclose(joints, want, rtol=1e-5, atol=1e-4)


def test_artifact_estimator_pad_to_bucket(tmp_path):
    """ArtifactPoseEstimator on a STATIC-batch artifact: requests of any
    size are chunked/padded to the baked bucket — no XLA compile ever
    happens at serve time (round-2 verdict weak #6)."""
    from lsps_tpu.serve.export import ArtifactPoseEstimator

    est, (frames, coms, cubes) = _estimator_and_batch(batch=5)
    exported = export_pose_program(est, batch=2,
                                   frame_shape=frames.shape[1:])
    path = str(tmp_path / "pose_b2.lsps")
    save_pose_program(path, exported)

    art = ArtifactPoseEstimator(path)
    assert art.bucket == 2 and art.n_joints == 36
    want = est.predict_frames(frames, coms, cubes)
    # 5 = 2 + 2 + 1(padded) chunks
    got = art.predict_frames(frames, coms, cubes)
    assert got.shape == (5, 36, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # a second, different batch size also answers (3 = 2 + 1 padded)
    got3 = art.predict_frames(frames[:3], coms[:3], cubes[:3])
    np.testing.assert_allclose(got3, want[:3], rtol=1e-5, atol=1e-4)
    # wrong frame geometry is a clear error, not a baked-shape crash
    with pytest.raises(ValueError, match="frame shape"):
        art.predict_frames(frames[:, :64, :64], coms, cubes)
    # a zero-row batch answers empty instead of crashing the chunk loop
    empty = art.predict_frames(frames[:0], coms[:0], cubes[:0])
    assert isinstance(empty, np.ndarray)
    assert empty.shape == (0, 36, 3)


def test_artifact_estimator_symbolic(tmp_path):
    from lsps_tpu.serve.export import ArtifactPoseEstimator

    est, (frames, coms, cubes) = _estimator_and_batch(batch=3)
    exported = export_pose_program(est, batch=None,
                                   frame_shape=frames.shape[1:])
    path = str(tmp_path / "pose_bN.lsps")
    save_pose_program(path, exported)
    art = ArtifactPoseEstimator(path)
    assert art.bucket is None
    want = est.predict_frames(frames, coms, cubes)
    got = art.predict_frames(frames, coms, cubes)
    assert isinstance(got, np.ndarray)  # same return type as bucket path
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_raw_artifact_roundtrip_and_bucketing(tmp_path):
    """raw=True bakes detection into the artifact: (frames, cubes) ->
    (joints, coms), matching the live predict_raw; pad-to-bucket works;
    capability flags are truthful (predict_raw only on raw artifacts,
    predict_frames refuses with a clear message)."""
    from lsps_tpu.serve.export import ArtifactPoseEstimator

    est, (frames, coms, cubes) = _estimator_and_batch(batch=3)
    want_j, want_c = est.predict_raw(frames, cubes, return_coms=True)

    exported = export_pose_program(est, batch=2,
                                   frame_shape=frames.shape[1:], raw=True)
    path = str(tmp_path / "pose_raw_b2.lsps")
    save_pose_program(path, exported)
    art = ArtifactPoseEstimator(path)
    assert art.raw and art.bucket == 2 and art.n_joints == 36
    got_j, got_c = art.predict_raw(frames, cubes, return_coms=True)
    np.testing.assert_allclose(got_j, want_j, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-5, atol=1e-4)
    # cubes default to 300mm, same as the live path
    np.testing.assert_allclose(art.predict_raw(frames), want_j,
                               rtol=1e-5, atol=1e-4)
    with pytest.raises(ValueError, match="raw-detection"):
        art.predict_frames(frames, coms, cubes)
    empty = art.predict_raw(frames[:0], cubes[:0])
    assert empty.shape == (0, 36, 3)

    # a standard artifact must NOT grow a predict_raw capability
    std = export_pose_program(est, batch=2, frame_shape=frames.shape[1:])
    std_path = str(tmp_path / "pose_std.lsps")
    save_pose_program(std_path, std)
    assert getattr(ArtifactPoseEstimator(std_path), "predict_raw",
                   None) is None


def test_daemon_serves_raw_artifact(tmp_path):
    """The daemon + a raw artifact: /predict without 'coms' answers via
    the baked detection program; with 'coms' it answers 400."""
    import json
    import threading
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    from lsps_tpu.serve.export import ArtifactPoseEstimator
    from lsps_tpu.serve.server import PoseServer

    est, (frames, coms, cubes) = _estimator_and_batch(batch=2)
    exported = export_pose_program(est, batch=2,
                                   frame_shape=frames.shape[1:], raw=True)
    path = str(tmp_path / "pose_raw.lsps")
    save_pose_program(path, exported)

    ps = PoseServer(ArtifactPoseEstimator(path))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), ps.handler())
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            url + "/predict",
            data=json.dumps({"frames": frames.tolist()}).encode(),
            method="POST")
        with urllib.request.urlopen(req) as r:
            joints = np.asarray(json.load(r)["joints"])
        assert joints.shape == (2, 36, 3)
        np.testing.assert_allclose(joints, est.predict_raw(frames),
                                   rtol=1e-5, atol=1e-4)

        bad = urllib.request.Request(
            url + "/predict",
            data=json.dumps({"frames": frames.tolist(),
                             "coms": coms.tolist(),
                             "cubes": cubes.tolist()}).encode(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad)
        assert e.value.code == 400
    finally:
        httpd.shutdown()


def test_daemon_serves_artifact(tmp_path):
    """The serving daemon driven by an AOT artifact alone (no config,
    no checkpoints): /healthz reports the artifact's joint count and
    /predict answers two different batch sizes."""
    import io
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from lsps_tpu.serve.export import ArtifactPoseEstimator
    from lsps_tpu.serve.server import PoseServer

    est, (frames, coms, cubes) = _estimator_and_batch(batch=3)
    exported = export_pose_program(est, batch=2,
                                   frame_shape=frames.shape[1:])
    path = str(tmp_path / "pose.lsps")
    save_pose_program(path, exported)

    ps = PoseServer(ArtifactPoseEstimator(path))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), ps.handler())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        with urllib.request.urlopen(url + "/healthz") as r:
            body = json.load(r)
        assert body["ok"] is True and body["joints"] == 36

        for n in (3, 1):  # two batch sizes, no recompiles possible
            buf = io.BytesIO()
            np.savez(buf, frames=frames[:n], coms=coms[:n],
                     cubes=cubes[:n])
            req = urllib.request.Request(url + "/predict_npz",
                                         data=buf.getvalue(),
                                         method="POST")
            with urllib.request.urlopen(req) as r:
                joints = np.load(io.BytesIO(r.read()))["joints"]
            assert joints.shape == (n, 36, 3)
            assert np.isfinite(joints).all()
    finally:
        httpd.shutdown()
