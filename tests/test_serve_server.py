"""Serving daemon: health, JSON and npz predict endpoints, input
validation — against a live ThreadingHTTPServer on an ephemeral port."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.data.camera import Camera
from lsps_tpu.data.synthetic import render_hand_depth
from lsps_tpu.models import build_model
from lsps_tpu.serve.inference import PoseEstimator
from lsps_tpu.serve.server import PoseServer

HYP = default_hyperparameters(reg_dim=108, small=True)
HYP["dis"]["ch"] = 4
HYP["gen"]["ch"] = 4


@pytest.fixture(scope="module")
def server_url():
    from http.server import ThreadingHTTPServer

    cam = Camera.nyu()
    kd, kv = jax.random.split(jax.random.PRNGKey(0))
    params = {"dis": build_model(HYP["dis"]).init(kd),
              "vae": build_model(HYP["vae"]).init(kv)}
    ps = PoseServer(PoseEstimator(HYP, params, camera=cam))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), ps.handler())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _batch(n=2):
    cam = Camera.nyu()
    gen = np.random.RandomState(7)
    frames, coms = [], []
    for i in range(n):
        com3d = np.array([10.0 * i, 0.0, 750.0], np.float32)
        dpt, _ = render_hand_depth(cam, com3d, 36, gen)
        frames.append(dpt)
        coms.append(cam.to_img(com3d))
    return (np.stack(frames).astype(np.float32),
            np.stack(coms).astype(np.float32),
            np.full((n, 3), 300.0, np.float32))


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz") as r:
        body = json.load(r)
    assert body["ok"] is True and body["joints"] == 36


def test_predict_json(server_url):
    frames, coms, cubes = _batch(2)
    req = urllib.request.Request(
        server_url + "/predict",
        data=json.dumps({"frames": frames.tolist(), "coms": coms.tolist(),
                         "cubes": cubes.tolist()}).encode(),
        method="POST")
    with urllib.request.urlopen(req) as r:
        joints = np.asarray(json.load(r)["joints"])
    assert joints.shape == (2, 36, 3)
    assert np.isfinite(joints).all()


def test_predict_npz_matches_json(server_url):
    frames, coms, cubes = _batch(1)
    buf = io.BytesIO()
    np.savez(buf, frames=frames, coms=coms, cubes=cubes)
    req = urllib.request.Request(server_url + "/predict_npz",
                                 data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req) as r:
        joints = np.load(io.BytesIO(r.read()))["joints"]
    assert joints.shape == (1, 36, 3)

    req2 = urllib.request.Request(
        server_url + "/predict",
        data=json.dumps({"frames": frames.tolist(), "coms": coms.tolist(),
                         "cubes": cubes.tolist()}).encode(),
        method="POST")
    with urllib.request.urlopen(req2) as r:
        joints2 = np.asarray(json.load(r)["joints"])
    np.testing.assert_allclose(joints, joints2, rtol=1e-5, atol=1e-4)


def test_predict_raw_json_no_coms(server_url):
    """Omitting 'coms' selects the raw path: on-device detection
    (predict_raw), cubes defaulting to 300 mm."""
    frames, _, cubes = _batch(2)
    for body in ({"frames": frames.tolist(), "cubes": cubes.tolist()},
                 {"frames": frames.tolist()}):
        req = urllib.request.Request(server_url + "/predict",
                                     data=json.dumps(body).encode(),
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            resp = json.load(r)
        joints = np.asarray(resp["joints"])
        assert joints.shape == (2, 36, 3)
        assert np.isfinite(joints).all()
        assert resp["detected"] == [True, True]


def test_predict_raw_detection_failure_flagged(server_url):
    """A frame with no detectable hand (all far plane) must answer 200
    with detected=false and FINITE (zeroed) joints — never literal NaN,
    which is invalid strict JSON (round-3 review finding)."""
    frames, _, _ = _batch(2)
    frames[1] = 0.0  # invalid-depth everywhere -> no qualifying slice
    req = urllib.request.Request(
        server_url + "/predict",
        data=json.dumps({"frames": frames.tolist()}).encode(),
        method="POST")
    with urllib.request.urlopen(req) as r:
        resp = json.loads(r.read().decode())  # strict JSON parse
    joints = np.asarray(resp["joints"])
    assert resp["detected"] == [True, False]
    assert np.isfinite(joints).all()
    assert np.all(joints[1] == 0.0) and np.any(joints[0] != 0.0)


def test_predict_coms_without_cubes_defaults_300(server_url):
    """Docstring promises cubes is optional on BOTH paths: supplying
    coms without cubes must default to 300 mm, not 400 (round-3 review
    finding)."""
    frames, coms, cubes = _batch(1)
    req = urllib.request.Request(
        server_url + "/predict",
        data=json.dumps({"frames": frames.tolist(),
                         "coms": coms.tolist()}).encode(),
        method="POST")
    with urllib.request.urlopen(req) as r:
        joints = np.asarray(json.load(r)["joints"])
    req2 = urllib.request.Request(
        server_url + "/predict",
        data=json.dumps({"frames": frames.tolist(), "coms": coms.tolist(),
                         "cubes": cubes.tolist()}).encode(),
        method="POST")
    with urllib.request.urlopen(req2) as r:
        want = np.asarray(json.load(r)["joints"])
    np.testing.assert_allclose(joints, want, rtol=1e-5, atol=1e-4)


def test_predict_raw_npz_no_coms(server_url):
    frames, _, cubes = _batch(1)
    buf = io.BytesIO()
    np.savez(buf, frames=frames, cubes=cubes)
    req = urllib.request.Request(server_url + "/predict_npz",
                                 data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req) as r:
        data = np.load(io.BytesIO(r.read()))
    joints = data["joints"]
    assert joints.shape == (1, 36, 3) and np.isfinite(joints).all()
    assert data["detected"].tolist() == [True]


def test_predict_raw_artifact_estimator_400():
    """An estimator without predict_raw (the AOT artifact bakes the
    with-CoM program) must answer 400 with a clear message, not 500."""
    from lsps_tpu.serve.server import PoseServer

    class NoRaw:
        n_joints = 36

        def predict_frames(self, frames, coms, cubes):  # pragma: no cover
            raise AssertionError("should not be called")

    ps = PoseServer(NoRaw())
    frames, _, _ = _batch(1)
    with pytest.raises(ValueError, match="no on-device detection"):
        ps.predict(frames, None, None)


def test_bad_shapes_400(server_url):
    req = urllib.request.Request(
        server_url + "/predict",
        data=json.dumps({"frames": [[1.0, 2.0]], "coms": [[0, 0, 1]],
                         "cubes": [[300, 300, 300]]}).encode(),
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_malformed_content_length_400(server_url):
    """A garbage Content-Length header must answer 400, not drop the
    connection with an unhandled ValueError (round-2 review finding)."""
    import http.client

    host, port = server_url.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=10)
    conn.putrequest("POST", "/predict", skip_accept_encoding=True)
    conn.putheader("Content-Length", "not-a-number")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_build_estimator_missing_vae_refuses(tmp_path):
    """No matching VAE checkpoint -> RuntimeError (vae.decode is the
    final stage of every prediction; random-init weights would serve
    garbage silently).  --allow-missing-vae is the escape hatch."""
    import yaml

    from lsps_tpu.serve.server import build_estimator
    from lsps_tpu.train.trainer import LSPSTrainer

    hyp = dict(HYP)
    prefix = str(tmp_path / "outputs" / "pre")
    trainer = LSPSTrainer(hyp)
    state = trainer.init_state(jax.random.PRNGKey(1))
    trainer.save(state, prefix, 99)  # gen/dis present, NO vae file

    cfg = {"train": {"snapshot_prefix": prefix,
                     "snapshot_save_iterations": 100,
                     "image_save_iterations": 100,
                     "image_display_iterations": 100,
                     "display": 10,
                     "hyperparameters": hyp,
                     "datasets": {}}}
    cfg_path = str(tmp_path / "exp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    with pytest.raises(RuntimeError, match="VAE checkpoint"):
        build_estimator(cfg_path, frac=0.5)
    est = build_estimator(cfg_path, frac=0.5, allow_missing_vae=True)
    assert est is not None


def test_build_estimator_from_snapshots(tmp_path):
    """The daemon's checkpoint-loading path: write a tiny experiment's
    snapshots (trainer.save + save_vae) and rebuild a working estimator
    from the config alone."""
    import yaml

    from lsps_tpu.serve.server import build_estimator
    from lsps_tpu.train.trainer import LSPSTrainer

    hyp = dict(HYP)
    prefix = str(tmp_path / "outputs" / "pre")
    trainer = LSPSTrainer(hyp)
    state = trainer.init_state(jax.random.PRNGKey(1))
    trainer.save(state, prefix, 99)          # pre_gen/pre_dis/... @100
    trainer.save_vae(state, prefix, 99, 2 + 0.5)

    cfg = {"train": {"snapshot_prefix": prefix,
                     "snapshot_save_iterations": 100,
                     "image_save_iterations": 100,
                     "image_display_iterations": 100,
                     "display": 10,
                     "hyperparameters": hyp,
                     "datasets": {}}}
    cfg_path = str(tmp_path / "exp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    est = build_estimator(cfg_path, frac=0.5)
    frames, coms, cubes = _batch(1)
    joints = est.predict_frames(frames, coms, cubes)
    assert joints.shape == (1, 36, 3) and np.isfinite(joints).all()
    # weights really came from the checkpoint, not a fresh init
    want = PoseEstimator(hyp, state["params"],
                         camera=Camera.nyu()).predict_frames(
        frames, coms, cubes)
    np.testing.assert_allclose(joints, want, rtol=1e-5, atol=1e-4)
