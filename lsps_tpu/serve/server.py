"""Minimal production serving daemon for the fused depth->pose program.

The reference has no serving story at all (SURVEY.md §3.4 — its
"real-time" demo runs a live Python+torch process).  This module wraps
``serve.inference.PoseEstimator`` in a dependency-free HTTP server
(stdlib only) so a trained checkpoint serves joints over the network:

    python -m lsps_tpu.serve.server --config exps/nnyu.yaml \
        [--frac 0.9] [--est] [--port 8642] [--bf16]

Endpoints:

* ``GET  /healthz``  -> ``{"ok": true, "joints": J, "batches": N}``
* ``POST /predict``  -> body JSON ``{"frames": [[...]], "coms": [[u,v,z]],
  "cubes": [[x,y,z]]}`` (lists, one entry per frame); response
  ``{"joints": [[[x,y,z], ...], ...]}`` in metric mm.  Omit ``coms``
  (and optionally ``cubes``, default 300 mm) to serve RAW frames: the
  CoM is detected on device and the whole detect -> crop -> regress ->
  decode chain runs as one XLA program; the response then also carries
  ``"detected": [bool, ...]`` — frames where no depth slice qualified
  have zeroed joints and ``false`` there.
* ``POST /predict_npz`` -> body = an ``.npz`` stream with arrays
  ``frames``, ``coms``, ``cubes`` (binary path for real frame rates;
  ``coms``/``cubes`` optional as above); response is an ``.npz`` stream
  with array ``joints``.

Threading: BaseHTTPRequestHandler in ThreadingHTTPServer; the estimator
call itself is serialized with a lock (one XLA program in flight — the
TPU is already pipelined internally).

``--batch-window-ms W`` enables **dynamic micro-batching**: concurrent
requests coalesce (same frame shape, same path) into ONE estimator call
padded to a power-of-two bucket, then the result slices scatter back —
see ``MicroBatcher``.  The measured throughput curve is steeply
batch-favored (~1.1k img/s at batch 1 vs ~55k at batch 256,
docs/BENCHMARKS.md), so under concurrent load this multiplies served
throughput by an order of magnitude at W of a few ms.
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class PoseHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a burst-worthy accept backlog.

    socketserver's default ``request_queue_size`` is 5: a burst of
    concurrent clients overflows the listen backlog and the kernel
    refuses/resets connections before the handler ever runs (measured:
    the round-4 latency-tail bench dropped 4-19% of requests at 64
    concurrent clients on the default).  128 absorbs any burst the
    micro-batcher can usefully coalesce."""

    request_queue_size = 128


def build_estimator(config_path: str, frac: float = 0.0, est: bool = False,
                    idx: int = -1, bf16: bool = False, camera=None,
                    allow_missing_vae: bool = False):
    """Construct a PoseEstimator from an experiment config + its
    snapshot checkpoints (latest ``pre_*`` or, with ``est``, the
    ``pre_est_*`` regression checkpoints; VAE keyed by 2+frac as saved
    by pose_train)."""
    import jax
    import jax.numpy as jnp

    from lsps_tpu.cli import common as C
    from lsps_tpu.config import NetConfig
    from lsps_tpu.data.camera import Camera
    from lsps_tpu.serve.inference import PoseEstimator

    config = NetConfig(config_path)
    trainer = C.make_trainer(config, sch_interval=1000)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, ok = trainer.load_vae(state, config.snapshot_prefix, 2 + frac)
    if not ok:
        # vae.decode is the final stage of every /predict (and of any
        # exported artifact): serving with a random-init VAE silently
        # produces garbage joints while /healthz reports ok.  Refuse,
        # like the it==0 guard below, unless explicitly overridden.
        msg = (f"no VAE checkpoint matched "
               f"{config.snapshot_prefix}_vae_{2 + frac:.2f}_*")
        if not allow_missing_vae:
            raise RuntimeError(
                msg + " (pass --allow-missing-vae to serve anyway)")
        print(f"warning: {msg}; serving with random-init VAE",
              file=sys.stderr)
    state, it = trainer.resume(state, config.snapshot_prefix, idx=idx,
                               est=est)
    if it == 0:
        # resume() silently keeps the template when nothing matches —
        # a serving daemon must never answer with random-init weights
        raise RuntimeError(
            f"no {'est ' if est else ''}checkpoint found under "
            f"{config.snapshot_prefix!r}")
    print(f"serving checkpoint at iteration {it}", file=sys.stderr)
    if camera is None:
        # derive intrinsics from the DATASET the checkpoints were
        # trained on, not the config filename: the ICVL/MSRA dataset
        # classes use the Intel camera, everything else (NYU, the
        # synthetic generator, data/synthetic.py:98) the Kinect one
        classes = " ".join(str(d.get("class_name", ""))
                           for d in config.datasets.values())
        camera = (Camera.icvl() if ("ICVL" in classes or "MSRA" in classes)
                  else Camera.nyu())
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    return PoseEstimator(config.hyperparameters, state["params"],
                         camera=camera, dtype=dtype)


class _Pending:
    """One in-flight request inside the micro-batcher."""

    __slots__ = ("frames", "coms", "cubes", "event", "joints", "detected",
                 "error", "abandoned")

    def __init__(self, frames, coms, cubes):
        self.frames, self.coms, self.cubes = frames, coms, cubes
        self.event = threading.Event()
        self.joints = self.detected = self.error = None
        self.abandoned = False  # submit() timed out; drop, don't compute


def _bucket(n: int) -> int:
    """Next power-of-two >= n: bounds live-jit recompiles to log2
    distinct batch shapes under arbitrary coalesced batch sizes."""
    b = 1
    while b < n:
        b <<= 1
    return b


class MicroBatcher:
    """Dynamic request coalescing for the serving daemon.

    The measured serving-throughput curve is steeply batch-favored
    (docs/BENCHMARKS.md: ~1.1k img/s at batch 1 vs ~55k img/s at batch
    256 with the einsum crop warp), so under concurrent load the
    winning dispatch is ONE program over many requests' frames, not one
    program per request.  The reference has no serving story at all
    (SURVEY.md §3.4); this is the TPU-native deployment counterpart.

    A dispatcher thread takes the first pending request, keeps
    collecting for up to ``window_ms`` (or until ``max_batch`` frames),
    groups compatible requests — same (H, W) and same path (with-CoM vs
    raw detection) — concatenates each group along batch, pads to the
    next power-of-two bucket (so a live-jit estimator compiles at most
    log2 shapes; AOT symbolic-batch artifacts don't need it but are
    unharmed), runs it as one estimator call, and scatters the per-item
    slices back to the waiting handler threads.

    ``window_ms=0`` still coalesces whatever is already queued while
    the previous program runs (zero added latency); any positive window
    trades that much latency for larger batches.

    ``max_batch`` is a HARD cap on the dispatched batch: _collect stops
    before an item that would push past it (the item leads the next
    round), and an oversize single request is chunked to programs of the
    largest power of two <= ``max_batch`` — so the estimator never sees
    a batch (or pad bucket) above the operator-set bound, and a live-jit
    estimator never compiles an unplanned shape above it.

    Shared fate: all requests coalesced into one group share its
    estimator call, so one fault would fail innocent neighbors — after
    a group failure each item is retried individually once, and only
    per-item failures surface to their own callers."""

    def __init__(self, run_group, window_ms: float = 2.0,
                 max_batch: int = 64):
        self._run_group = run_group   # (frames, coms|None, cubes) -> ...
        self.window = window_ms / 1e3
        self.max_batch = int(max_batch)
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._carry: "_Pending | None" = None  # overflow from _collect
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="lsps-microbatch")
        self._thread.start()

    def submit(self, frames, coms, cubes, timeout: float = 300.0):
        """Enqueue one (validated) request and wait for its slice of
        the coalesced result.  Returns ``(joints, detected|None)``."""
        item = _Pending(frames, coms, cubes)
        self._q.put(item)
        if not item.event.wait(timeout):
            # flag it so the dispatcher drops instead of computing a
            # result nobody is waiting for
            item.abandoned = True
            raise RuntimeError("micro-batch dispatch timed out")
        if item.error is not None:
            raise item.error
        return item.joints, item.detected

    def close(self):
        self._stop = True
        self._thread.join(timeout=5.0)

    # dispatcher internals ------------------------------------------------
    def _collect(self):
        if self._carry is not None:
            first, self._carry = self._carry, None
        else:
            try:
                first = self._q.get(timeout=0.2)
            except queue.Empty:
                return []
        batch, n = [first], first.frames.shape[0]
        deadline = time.monotonic() + self.window
        while n < self.max_batch:
            remaining = deadline - time.monotonic()
            try:
                # remaining <= 0 still drains anything already queued
                item = (self._q.get_nowait() if remaining <= 0
                        else self._q.get(timeout=remaining))
            except queue.Empty:
                break
            if n + item.frames.shape[0] > self.max_batch:
                # hard cap: this item leads the NEXT dispatch round
                # instead of overshooting the operator-set bound
                self._carry = item
                break
            batch.append(item)
            n += item.frames.shape[0]
        return batch

    def _loop(self):
        while not self._stop:
            self._round()

    def _round(self):
        """One collect->group->dispatch cycle (the _loop body; separate
        so tests can drive it deterministically)."""
        batch = self._collect()
        # timed-out submitters are gone; don't compute for them
        batch = [it for it in batch if not it.abandoned]
        if batch:
            groups = {}
            for item in batch:
                # dtype is part of the key: uint16 and f32 frames are
                # different programs and cannot concatenate
                key = (item.frames.shape[1:], item.frames.dtype.str,
                       item.coms is None)
                groups.setdefault(key, []).append(item)
            for items in groups.values():
                try:
                    self._dispatch(items)
                except Exception as e:
                    if len(items) == 1:
                        # a lone request re-dispatched identically is
                        # guaranteed to fail again — don't double the
                        # device work / time-to-error
                        items[0].error = e
                    else:
                        # shared fate would fail innocent neighbors for
                        # one bad batch — retry each item individually
                        # once, so only genuinely-failing requests see
                        # an error
                        for it in items:
                            try:
                                self._dispatch([it])
                            except Exception as e2:
                                # fresh instance per waiter: concurrent
                                # re-raises from handler threads would
                                # garble a shared __traceback__
                                it.error = e2
                finally:
                    for it in items:
                        it.event.set()

    def _dispatch(self, items):
        frames = np.concatenate([it.frames for it in items])
        cubes = np.concatenate([it.cubes for it in items])
        coms = (None if items[0].coms is None
                else np.concatenate([it.coms for it in items]))
        n = frames.shape[0]
        # a single oversize request can exceed max_batch: run it as
        # cap-sized chunks.  cap is the largest power of two <= max_batch
        # so the PAD BUCKET also respects the bound (a non-pow2
        # max_batch like 48 must not pad a 48-frame chunk up to 64 — an
        # unplanned live-jit shape above the operator-set limit).
        cap = _bucket(self.max_batch)
        if cap > self.max_batch:
            cap >>= 1
        js, ds = [], []
        for s in range(0, n, cap):
            f = frames[s:s + cap]
            c = cubes[s:s + cap]
            m = None if coms is None else coms[s:s + cap]
            pad = _bucket(f.shape[0]) - f.shape[0]
            if pad:  # repeat the last frame; results are trimmed below
                f = np.concatenate([f, np.repeat(f[-1:], pad, 0)])
                c = np.concatenate([c, np.repeat(c[-1:], pad, 0)])
                if m is not None:
                    m = np.concatenate([m, np.repeat(m[-1:], pad, 0)])
            j, d = self._run_group(f, m, c)
            js.append(j[:min(cap, n - s)])
            if d is not None:
                ds.append(d[:min(cap, n - s)])
        joints = js[0] if len(js) == 1 else np.concatenate(js)
        detected = (None if not ds
                    else (ds[0] if len(ds) == 1 else np.concatenate(ds)))
        off = 0
        for it in items:
            k = it.frames.shape[0]
            it.joints = joints[off:off + k]
            if detected is not None:
                it.detected = detected[off:off + k]
            off += k


class PoseServer:
    """Holds the estimator + request counters; builds the handler.

    ``estimator`` is anything with ``predict_frames`` — a live
    ``PoseEstimator`` (jit) or an ``ArtifactPoseEstimator`` (AOT
    StableHLO artifact: novel batch sizes never trigger an XLA compile
    under the request lock).

    ``batch_window_ms`` (not None) enables dynamic micro-batching:
    concurrent requests coalesce into one padded-to-bucket estimator
    call (see ``MicroBatcher``; 0 = coalesce only what is already
    queued); ``max_batch`` caps the coalesced frame count."""

    def __init__(self, estimator, batch_window_ms: float = None,
                 max_batch: int = 64):
        self.est = estimator
        self.lock = threading.Lock()
        self.batches = 0
        nj = getattr(estimator, "n_joints", None)
        self.n_joints = (int(nj) if nj is not None
                         else estimator.vae.input_dim // 3)
        self.batcher = (MicroBatcher(self._run_group, batch_window_ms,
                                     max_batch)
                        if batch_window_ms is not None else None)

    def _run_group(self, frames, coms, cubes):
        """One locked estimator call (either path) + raw-path
        post-processing.  The single entry point for both the direct
        path and the micro-batcher."""
        if coms is None:
            with self.lock:
                joints, det_coms = self.est.predict_raw(frames, cubes,
                                                        return_coms=True)
                self.batches += 1
            # detect_jax returns a zero CoM when no depth slice
            # qualifies; the downstream crop divides by com_z, so those
            # joints are NaN/degenerate.  Flag them and zero the joints
            # (json.dumps would otherwise emit literal NaN — invalid
            # strict JSON).
            detected = np.asarray(det_coms)[:, 2] > 0
            joints = np.where(detected[:, None, None], joints, 0.0)
            return joints, detected
        with self.lock:
            joints = self.est.predict_frames(frames, coms, cubes)
            self.batches += 1
        return np.asarray(joints), None

    def predict(self, frames, coms, cubes):
        """``coms=None`` selects the raw path: the CoM is DETECTED on
        device (``predict_raw``, one XLA program end-to-end) — the
        reference's live-demo flow (SURVEY.md §3.4) over HTTP.

        Returns ``(joints, detected)``: ``detected`` is a per-frame bool
        array on the raw path (False = no qualifying depth slice; those
        frames' joints are zeroed so responses stay finite/valid JSON)
        and ``None`` on the with-CoM path.  ``cubes`` defaults to 300 mm
        on both paths.  uint16 frames (native sensor millimetres) pass
        through to the estimator natively — half the ingest bytes."""
        frames = np.asarray(frames)
        if frames.dtype != np.uint16:
            frames = np.asarray(frames, np.float32)
        if frames.ndim != 3:
            raise ValueError(f"frames {frames.shape}: want (B, H, W)")
        if cubes is None:
            cubes = np.full((frames.shape[0], 3), 300.0, np.float32)
        cubes = np.asarray(cubes, np.float32)
        if cubes.shape != (frames.shape[0], 3):
            raise ValueError(f"cubes {cubes.shape}: want "
                             f"({frames.shape[0]}, 3)")
        if coms is None:
            if getattr(self.est, "predict_raw", None) is None:
                raise ValueError(
                    "this estimator has no on-device detection "
                    "(AOT artifacts bake the with-CoM program); "
                    "supply 'coms'")
        else:
            coms = np.asarray(coms, np.float32)
            if coms.shape != (frames.shape[0], 3):
                raise ValueError(
                    f"shapes: frames {frames.shape} (want B,H,W), coms "
                    f"{coms.shape} (want B,3)")
        if self.batcher is not None:
            return self.batcher.submit(frames, coms, cubes)
        return self._run_group(frames, coms, cubes)

    def handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            timeout = 60           # slow/stalled clients release threads
            MAX_BODY = 256 << 20   # refuse absurd request bodies

            def log_message(self, fmt, *args):  # quiet
                pass

            def _send(self, code, body: bytes, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path != "/healthz":
                    return self._send(404, b'{"error": "not found"}')
                self._send(200, json.dumps(
                    {"ok": True, "joints": server.n_joints,
                     "batches": server.batches,
                     "microbatch": server.batcher is not None}).encode())

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    return self._send(400, json.dumps(
                        {"error": "malformed Content-Length"}).encode())
                if n > self.MAX_BODY:
                    return self._send(413, json.dumps(
                        {"error": f"body {n} bytes > {self.MAX_BODY}"}
                    ).encode())
                body = self.rfile.read(n)
                try:
                    if self.path == "/predict":
                        req = json.loads(body)
                        joints, detected = server.predict(req["frames"],
                                                          req.get("coms"),
                                                          req.get("cubes"))
                        resp = {"joints": joints.tolist()}
                        if detected is not None:
                            resp["detected"] = detected.tolist()
                        self._send(200, json.dumps(resp).encode())
                    elif self.path == "/predict_npz":
                        data = np.load(io.BytesIO(body))
                        joints, detected = server.predict(
                            data["frames"],
                            data["coms"] if "coms" in data.files else None,
                            data["cubes"] if "cubes" in data.files else None)
                        buf = io.BytesIO()
                        if detected is not None:
                            np.savez(buf, joints=joints, detected=detected)
                        else:
                            np.savez(buf, joints=joints)
                        self._send(200, buf.getvalue(),
                                   ctype="application/octet-stream")
                    else:
                        self._send(404, b'{"error": "not found"}')
                except (ValueError, KeyError, TypeError,
                        json.JSONDecodeError) as e:
                    # malformed request -> client error
                    self._send(400, json.dumps(
                        {"error": f"{type(e).__name__}: {e}"}).encode())
                except Exception as e:  # server fault -> 500, stay up
                    self._send(500, json.dumps(
                        {"error": f"{type(e).__name__}: {e}"}).encode())

        return Handler


def serve_forever(estimator, port: int = 8642, host: str = "127.0.0.1",
                  batch_window_ms: float = None, max_batch: int = 64):
    ps = PoseServer(estimator, batch_window_ms=batch_window_ms,
                    max_batch=max_batch)
    httpd = PoseHTTPServer((host, port), ps.handler())
    ps.httpd = httpd
    extra = (f" (micro-batching: window {batch_window_ms} ms, "
             f"max {max_batch} frames)" if batch_window_ms is not None
             else "")
    print(f"serving on http://{host}:{port}{extra}", file=sys.stderr)
    httpd.serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser(description="LSPS-TPU pose serving daemon")
    p.add_argument("--config", default=None,
                   help="experiment config (live-jit serving from "
                        "snapshots); not needed with --artifact")
    p.add_argument("--artifact", default=None,
                   help="serve a saved AOT artifact (cli.export_model "
                        "output): no model code / checkpoint needed, and "
                        "novel batch sizes never compile under the "
                        "request lock (static-batch artifacts pad to "
                        "their baked bucket)")
    p.add_argument("--frac", type=float, default=0.0)
    p.add_argument("--est", action="store_true",
                   help="load the pre_est_* regression checkpoints")
    p.add_argument("--idx", type=int, default=-1)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--port", type=int, default=8642)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--allow-missing-vae", action="store_true",
                   help="serve even if no VAE checkpoint matches "
                        "(predictions will be garbage; debug only)")
    p.add_argument("--batch-window-ms", type=float, default=None,
                   help="enable dynamic micro-batching: coalesce "
                        "concurrent requests for up to this many ms "
                        "into one padded-to-bucket program call "
                        "(0 = only what is already queued; the "
                        "throughput curve is steeply batch-favored — "
                        "docs/BENCHMARKS.md)")
    p.add_argument("--max-batch", type=int, default=64,
                   help="micro-batching: max coalesced frames per call")
    opts = p.parse_args(argv)
    if opts.artifact:
        from lsps_tpu.serve.export import ArtifactPoseEstimator

        est = ArtifactPoseEstimator(opts.artifact)
        print(f"serving AOT artifact {opts.artifact} "
              f"(bucket={est.bucket or 'symbolic'}, "
              f"joints={est.n_joints})", file=sys.stderr)
    elif opts.config:
        est = build_estimator(opts.config, frac=opts.frac, est=opts.est,
                              idx=opts.idx, bf16=opts.bf16,
                              allow_missing_vae=opts.allow_missing_vae)
    else:
        p.error("one of --config or --artifact is required")
    serve_forever(est, port=opts.port, host=opts.host,
                  batch_window_ms=opts.batch_window_ms,
                  max_batch=opts.max_batch)


if __name__ == "__main__":
    main(sys.argv[1:])
