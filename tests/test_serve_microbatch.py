"""Dynamic micro-batching in the serving daemon (serve/server.py
``MicroBatcher``): concurrent requests must coalesce into ONE
padded-to-bucket estimator call with per-request slices scattered back
bit-correctly.  Rationale: the measured serving-throughput curve is
steeply batch-favored (docs/BENCHMARKS.md — ~1.1k img/s at batch 1 vs
~55k at batch 256 with the einsum warp), so coalescing is the
TPU-native answer to concurrent load.  The reference has no serving
story (SURVEY.md §3.4)."""

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
from lsps_tpu.serve.server import MicroBatcher, PoseServer, _bucket

HYP = default_hyperparameters(reg_dim=108, small=True)
HYP["dis"]["ch"] = 4
HYP["gen"]["ch"] = 4


def test_bucket_powers_of_two():
    assert [_bucket(n) for n in (1, 2, 3, 4, 5, 7, 8, 9, 64, 65)] == \
        [1, 2, 4, 4, 8, 8, 8, 16, 64, 128]


class _StubEstimator:
    """Records every call's batch size; per-frame deterministic output
    (joint 0 x = frame mean) so slice scattering is checkable.  A gate
    event lets a test hold the FIRST dispatch open while more requests
    queue, making coalescing deterministic on a 1-core host."""

    n_joints = 4

    def __init__(self, gate=None):
        self.calls = []
        self.gate = gate
        self.fail = False

    def predict_frames(self, frames, coms, cubes):
        if self.gate is not None and not self.calls:
            self.calls.append(frames.shape[0])
            self.gate.wait(10.0)
        else:
            self.calls.append(frames.shape[0])
        if self.fail:
            raise RuntimeError("injected estimator failure")
        out = np.zeros((frames.shape[0], 4, 3), np.float32)
        out[:, 0, 0] = frames.reshape(frames.shape[0], -1).mean(axis=1)
        out[:, 0, 1] = coms[:, 0]
        return out


def _serve_threads(server, requests):
    """Run server.predict concurrently; returns results in order."""
    results = [None] * len(requests)
    errors = [None] * len(requests)

    def run(i, req):
        try:
            results[i] = server.predict(*req)
        except Exception as e:  # noqa: BLE001 — asserted by callers
            errors[i] = e

    ts = [threading.Thread(target=run, args=(i, r))
          for i, r in enumerate(requests)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    return results, errors


def test_coalesce_pad_and_scatter():
    """5 concurrent 1-frame requests -> first dispatches alone (batch
    1), the rest coalesce while it runs into ONE padded call (4 -> 4),
    and every request gets exactly its own frame's answer."""
    gate = threading.Event()
    est = _StubEstimator(gate=gate)
    server = PoseServer(est, batch_window_ms=0.0, max_batch=64)
    try:
        frames = [np.full((1, 8, 8), float(i), np.float32)
                  for i in range(5)]
        coms = [np.array([[10.0 * i, 0, 700]], np.float32)
                for i in range(5)]
        cubes = [np.full((1, 3), 300.0, np.float32)] * 5

        reqs = list(zip(frames, coms, cubes))
        results = [None]

        def rest():
            results[0] = _serve_threads(server, reqs[1:])

        holder_res = [None]

        def first():
            holder_res[0] = _serve_threads(server, reqs[:1])

        t1 = threading.Thread(target=first)
        t1.start()
        # wait until the first dispatch is inside the estimator
        for _ in range(200):
            if est.calls:
                break
            threading.Event().wait(0.01)
        assert est.calls == [1]
        t2 = threading.Thread(target=rest)
        t2.start()
        # let the 4 remaining requests enqueue, then release the gate
        for _ in range(200):
            if server.batcher._q.qsize() >= 4:
                break
            threading.Event().wait(0.01)
        gate.set()
        t1.join(timeout=30)
        t2.join(timeout=30)

        (r_first, e_first) = holder_res[0]
        (r_rest, e_rest) = results[0]
        assert all(e is None for e in e_first + e_rest)
        # one call for the first request, ONE coalesced call for the
        # other four (4 frames -> bucket 4, no pad)
        assert est.calls == [1, 4]
        for i, (joints, detected) in enumerate(r_first + r_rest):
            assert detected is None
            assert joints.shape == (1, 4, 3)
            np.testing.assert_allclose(joints[0, 0, 0], float(i), rtol=1e-6)
            np.testing.assert_allclose(joints[0, 0, 1], 10.0 * i, rtol=1e-6)
    finally:
        server.batcher.close()


def test_pad_to_bucket():
    """A coalesced group of 3 frames must dispatch as a padded bucket
    of 4 with the pad trimmed from results."""
    est = _StubEstimator()
    batcher = MicroBatcher(
        lambda f, c, k: (est.predict_frames(f, c, k), None),
        window_ms=200.0, max_batch=64)
    try:
        frames = np.stack([np.full((8, 8), float(i), np.float32)
                           for i in range(3)])
        coms = np.array([[1.0, 0, 700], [2.0, 0, 700], [3.0, 0, 700]],
                        np.float32)
        cubes = np.full((3, 3), 300.0, np.float32)
        joints, detected = batcher.submit(frames, coms, cubes)
        assert est.calls == [4]  # 3 -> bucket 4
        assert joints.shape == (3, 4, 3)
        np.testing.assert_allclose(joints[:, 0, 0], [0.0, 1.0, 2.0])
    finally:
        batcher.close()


def test_mixed_shapes_split_groups():
    """Different (H, W) requests in one window must split into separate
    calls — frames cannot concatenate across shapes."""
    gate = threading.Event()
    est = _StubEstimator(gate=gate)
    server = PoseServer(est, batch_window_ms=50.0, max_batch=64)
    try:
        reqs = [
            (np.full((1, 8, 8), 5.0, np.float32),
             np.array([[1.0, 0, 700]], np.float32),
             np.full((1, 3), 300.0, np.float32)),
            (np.full((1, 6, 6), 7.0, np.float32),
             np.array([[2.0, 0, 700]], np.float32),
             np.full((1, 3), 300.0, np.float32)),
            (np.full((1, 8, 8), 9.0, np.float32),
             np.array([[3.0, 0, 700]], np.float32),
             np.full((1, 3), 300.0, np.float32)),
        ]
        # hold the first dispatch so all three queue, then release
        res_holder = [None]

        def run_all():
            res_holder[0] = _serve_threads(server, reqs)

        t = threading.Thread(target=run_all)
        t.start()
        for _ in range(200):
            if est.calls and server.batcher._q.qsize() >= 2:
                break
            threading.Event().wait(0.01)
        gate.set()
        t.join(timeout=30)
        results, errors = res_holder[0]
        assert all(e is None for e in errors)
        for (joints, _), want in zip(results, (5.0, 7.0, 9.0)):
            np.testing.assert_allclose(joints[0, 0, 0], want, rtol=1e-6)
        # no padding possible (groups of 1 or 2 are exact buckets) and
        # at least two calls — the 8x8 and 6x6 frames can never share
        # one (a cross-shape concat would have raised above)
        assert sum(est.calls) == 3 and len(est.calls) >= 2
    finally:
        server.batcher.close()


def test_error_propagates_to_every_waiter():
    est = _StubEstimator()
    est.fail = True
    server = PoseServer(est, batch_window_ms=20.0, max_batch=64)
    try:
        reqs = [(np.full((1, 8, 8), float(i), np.float32),
                 np.array([[0.0, 0, 700]], np.float32),
                 np.full((1, 3), 300.0, np.float32)) for i in range(3)]
        results, errors = _serve_threads(server, reqs)
        assert all(r is None for r in results)
        assert all(isinstance(e, RuntimeError) for e in errors)
    finally:
        server.batcher.close()


def test_accept_backlog_absorbs_a_burst():
    """PoseHTTPServer must queue a 64-connection burst instead of
    letting the kernel refuse it (socketserver's default backlog is 5;
    the round-4 latency-tail bench dropped 4-19% of requests at 64
    clients before the fix)."""
    import socket

    from lsps_tpu.serve.server import PoseHTTPServer

    assert PoseHTTPServer.request_queue_size >= 128

    class _Nop:
        def do_POST(self):  # pragma: no cover - never accepted
            pass

    # Bind + listen but never accept: every connect beyond the listen
    # backlog has its SYN dropped and times out.
    httpd = PoseHTTPServer(("127.0.0.1", 0), _Nop, bind_and_activate=True)
    port = httpd.server_address[1]
    socks, ok = [], 0
    try:
        for _ in range(64):
            s = socket.socket()
            s.settimeout(2.0)
            try:
                s.connect(("127.0.0.1", port))
                ok += 1
            except OSError:
                pass
            socks.append(s)
        assert ok == 64, f"only {ok}/64 connections accepted by backlog"
    finally:
        for s in socks:
            s.close()
        httpd.server_close()


@pytest.fixture(scope="module")
def real_servers():
    """The same tiny real estimator behind a micro-batched server and a
    plain one, for end-to-end equivalence over HTTP."""
    from lsps_tpu.serve.inference import PoseEstimator
    from lsps_tpu.serve.server import PoseHTTPServer

    cam = Camera.nyu()
    kd, kv = jax.random.split(jax.random.PRNGKey(0))
    params = {"dis": build_model(HYP["dis"]).init(kd),
              "vae": build_model(HYP["vae"]).init(kv)}
    est = PoseEstimator(HYP, params, camera=cam)

    servers, urls = [], []
    for window in (None, 25.0):
        ps = PoseServer(est, batch_window_ms=window)
        httpd = PoseHTTPServer(("127.0.0.1", 0), ps.handler())
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        servers.append((ps, httpd))
        urls.append(f"http://127.0.0.1:{httpd.server_address[1]}")
    yield urls
    for ps, httpd in servers:
        httpd.shutdown()
        if ps.batcher is not None:
            ps.batcher.close()


def _post(url, body):
    req = urllib.request.Request(url + "/predict",
                                 data=json.dumps(body).encode(),
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        return json.load(r)


def test_http_equivalence_com_and_raw(real_servers):
    """Concurrent micro-batched answers (both paths, incl. a detection
    failure) must match the plain server's answers to tolerance — the
    padded-bucket program computes the same per-frame function."""
    plain, batched = real_servers
    cam = Camera.nyu()
    gen = np.random.RandomState(7)
    frames, coms = [], []
    for i in range(3):
        com3d = np.array([10.0 * i, 0.0, 750.0], np.float32)
        dpt, _ = render_hand_depth(cam, com3d, 36, gen)
        frames.append(dpt.astype(np.float32))
        coms.append(cam.to_img(com3d).astype(np.float32))
    undetectable = np.zeros_like(frames[0])

    bodies = [
        {"frames": [frames[0].tolist()], "coms": [coms[0].tolist()]},
        {"frames": [frames[1].tolist()], "coms": [coms[1].tolist()]},
        {"frames": [frames[2].tolist()]},              # raw path
        {"frames": [undetectable.tolist()]},           # raw, no hand
    ]
    want = [_post(plain, b) for b in bodies]

    got = [None] * len(bodies)

    def run(i):
        got[i] = _post(batched, bodies[i])

    ts = [threading.Thread(target=run, args=(i,))
          for i in range(len(bodies))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)

    for g, w in zip(got, want):
        assert g is not None
        np.testing.assert_allclose(np.asarray(g["joints"]),
                                   np.asarray(w["joints"]),
                                   rtol=1e-4, atol=1e-3)
        assert g.get("detected") == w.get("detected")

    with urllib.request.urlopen(batched + "/healthz") as r:
        h = json.load(r)
    assert h["microbatch"] is True and h["ok"] is True


# ---------------------------------------------------------------------------
# round-4 hardening: hard max_batch cap, oversize chunking, abandoned
# requests, and per-item retry after a group failure (ADVICE round 3)
# ---------------------------------------------------------------------------

def _stopped_batcher(run_group, max_batch):
    """A MicroBatcher whose dispatcher thread is parked, so tests drive
    _collect/_round deterministically."""
    b = MicroBatcher(run_group, window_ms=0.0, max_batch=max_batch)
    b._stop = True
    b._thread.join(timeout=5.0)
    b._stop = False  # _round() runs manually; thread stays dead
    return b


def _pending(n, fill=0.0, coms=True):
    from lsps_tpu.serve.server import _Pending

    return _Pending(np.full((n, 8, 8), fill, np.float32),
                    np.tile(np.array([[fill, 0, 700]], np.float32),
                            (n, 1)) if coms else None,
                    np.full((n, 3), 300.0, np.float32))


def test_collect_hard_cap_carries_overflow():
    """An item that would push the coalesced count past max_batch must
    NOT join the batch — it leads the next round instead (ADVICE:
    overshoot padded two 40-frame requests to a 128 batch)."""
    est = _StubEstimator()
    b = _stopped_batcher(
        lambda f, c, k: (est.predict_frames(f, c, k), None), max_batch=4)
    i3, i2 = _pending(3, 1.0), _pending(2, 2.0)
    b._q.put(i3)
    b._q.put(i2)
    got = b._collect()
    assert got == [i3] and b._carry is i2
    got2 = b._collect()
    assert got2 == [i2] and b._carry is None


def test_oversize_request_chunks_to_cap():
    """A single request larger than max_batch dispatches as
    bucket(max_batch)-sized programs, never one giant padded batch."""
    est = _StubEstimator()
    b = _stopped_batcher(
        lambda f, c, k: (est.predict_frames(f, c, k), None), max_batch=4)
    item = _pending(10)
    item.frames[:, 0, 0] = np.arange(10)  # make slices identifiable
    b._dispatch([item])
    assert est.calls == [4, 4, 2]  # 10 -> 4+4+2 (last pads to bucket 2)
    assert item.joints.shape == (10, 4, 3)
    np.testing.assert_allclose(item.joints[:, 0, 0],
                               item.frames.reshape(10, -1).mean(axis=1),
                               rtol=1e-6)


def test_non_pow2_max_batch_never_pads_above_the_bound():
    """max_batch=48-style bounds: the pad bucket must stay <= max_batch
    (the earlier chunking used bucket(max_batch)=64 and padded a
    48-frame chunk ABOVE the operator-set limit — an unplanned live-jit
    shape)."""
    est = _StubEstimator()
    b = _stopped_batcher(
        lambda f, c, k: (est.predict_frames(f, c, k), None), max_batch=6)
    item = _pending(6)
    item.frames[:, 0, 0] = np.arange(6)
    b._dispatch([item])
    # chunk cap is 4 (largest pow2 <= 6): 6 -> 4 + 2, never a padded 8
    assert est.calls == [4, 2]
    assert max(est.calls) <= 6
    assert item.joints.shape == (6, 4, 3)
    np.testing.assert_allclose(item.joints[:, 0, 0],
                               item.frames.reshape(6, -1).mean(axis=1),
                               rtol=1e-6)


def test_lone_failing_request_is_not_retried():
    """A group of ONE failing request must surface its error without an
    identical (guaranteed-to-fail) re-dispatch doubling device work."""
    calls = []

    def run_group(frames, coms, cubes):
        calls.append(frames.shape[0])
        raise RuntimeError("poison frame")

    b = _stopped_batcher(run_group, max_batch=8)
    bad = _pending(1, 666.0)
    b._q.put(bad)
    b._round()
    assert calls == [1]  # exactly one dispatch, no retry
    assert isinstance(bad.error, RuntimeError)
    assert bad.event.is_set()


def test_abandoned_items_are_dropped():
    """A submit() that timed out must not consume estimator work."""
    est = _StubEstimator()
    b = _stopped_batcher(
        lambda f, c, k: (est.predict_frames(f, c, k), None), max_batch=8)
    dead, live = _pending(1, 1.0), _pending(1, 2.0)
    dead.abandoned = True
    b._q.put(dead)
    b._q.put(live)
    b._round()
    assert est.calls == [1]           # only the live item ran
    assert live.event.is_set() and live.joints is not None
    assert dead.joints is None


def test_group_failure_retries_items_individually():
    """One poison request must not fail innocent coalesced neighbors:
    after the group call raises, items retry alone and only the poison
    one errors — with a distinct exception instance per waiter."""
    calls = []

    def run_group(frames, coms, cubes):
        calls.append(frames.shape[0])
        if (frames == 666.0).any():
            raise RuntimeError("poison frame")
        out = np.zeros((frames.shape[0], 4, 3), np.float32)
        out[:, 0, 0] = frames.reshape(frames.shape[0], -1).mean(axis=1)
        return out, None

    b = _stopped_batcher(run_group, max_batch=8)
    good1, bad, good2 = _pending(1, 1.0), _pending(1, 666.0), _pending(1, 2.0)
    for it in (good1, bad, good2):
        b._q.put(it)
    b._round()
    # group of 3 (padded to 4) failed, then three individual retries
    assert calls == [4, 1, 1, 1]
    assert good1.error is None and good2.error is None
    np.testing.assert_allclose(good1.joints[0, 0, 0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(good2.joints[0, 0, 0], 2.0, rtol=1e-6)
    assert isinstance(bad.error, RuntimeError)
    for it in (good1, bad, good2):
        assert it.event.is_set()
