#!/usr/bin/env python
"""Daemon-level serving benchmark: concurrent HTTP clients vs the
micro-batcher (serve/server.py).

Measures what a deployment actually sees — requests/s through the HTTP
daemon under N concurrent 1-frame clients — for the plain (locked,
one-request-per-program) server and the micro-batched one
(``--batch-window-ms``).  The per-program throughput curve is steeply
batch-favored (docs/BENCHMARKS.md: ~1.1k img/s at batch 1 vs ~55k at
batch 256 with the einsum warp), so the expected win grows with client
concurrency.

Run on the TPU (unset JAX_PLATFORMS); one job at a time on this host:

    env -u JAX_PLATFORMS python scripts/bench_serve_daemon.py \
        [--clients 1,8,32] [--requests 64] [--window-ms 2]

Uses the /predict_npz binary endpoint (the JSON float round-trip of a
480x640 frame costs more than the model).  Prints one JSON line per
(mode, clients) pair.
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_estimator(small: bool = False):
    import jax
    import jax.numpy as jnp

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.data.camera import Camera
    from lsps_tpu.models import build_model
    from lsps_tpu.serve.inference import PoseEstimator

    if small:  # CPU smoke-test size
        hyp = default_hyperparameters(reg_dim=108, small=True)
        hyp["dis"]["ch"] = 4
        hyp["gen"]["ch"] = 4
    else:
        hyp = default_hyperparameters(reg_dim=108, ch=64)
    kd, kv = jax.random.split(jax.random.PRNGKey(0))
    params = {"dis": build_model(hyp["dis"]).init(kd),
              "vae": build_model(hyp["vae"]).init(kv)}
    return PoseEstimator(hyp, params, camera=Camera.nyu(),
                         dtype=jnp.bfloat16)


def _frame():
    rng = np.random.RandomState(0)
    frame = np.zeros((480, 640), np.float32)
    frame[200:320, 260:380] = rng.uniform(700, 900, (120, 120))
    com = np.array([320.0, 240.0, 800.0], np.float32)
    cube = np.array([300.0, 300.0, 300.0], np.float32)
    return frame, com, cube


# the server's own bucketing policy: warming must track it exactly or
# an XLA compile lands inside a measured run
from lsps_tpu.serve.server import _bucket  # noqa: E402


def _serve(est, window_ms, max_batch):
    from lsps_tpu.serve.server import PoseHTTPServer, PoseServer

    ps = PoseServer(est, batch_window_ms=window_ms, max_batch=max_batch)
    httpd = PoseHTTPServer(("127.0.0.1", 0), ps.handler())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return ps, httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def _run_clients(url, body, n_clients, n_requests):
    """n_clients threads, n_requests posts each; returns
    (wall_s, errs, per-request latencies in seconds)."""
    errs = [0] * n_clients
    lats = [[] for _ in range(n_clients)]
    barrier = threading.Barrier(n_clients + 1)

    def client(ci):
        barrier.wait()
        for _ in range(n_requests):
            req = urllib.request.Request(url + "/predict_npz", data=body,
                                         method="POST")
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    r.read()
                lats[ci].append(time.perf_counter() - t0)
            except Exception:
                errs[ci] += 1

    ts = [threading.Thread(target=client, args=(i,))
          for i in range(n_clients)]
    for t in ts:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in ts:
        t.join()
    return (time.perf_counter() - t0, sum(errs),
            [x for per in lats for x in per])


def _pct(sorted_lats, q):
    if not sorted_lats:
        return float("nan")
    i = min(len(sorted_lats) - 1, int(round(q * (len(sorted_lats) - 1))))
    return sorted_lats[i]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clients", default="1,8,32")
    p.add_argument("--requests", type=int, default=64,
                   help="requests per client")
    p.add_argument("--window-ms", type=float, default=2.0)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--small", action="store_true",
                   help="tiny model (CPU smoke test)")
    opts = p.parse_args(argv)
    clients = [int(c) for c in opts.clients.split(",")]

    est = _mk_estimator(small=opts.small)
    frame, com, cube = _frame()
    buf = io.BytesIO()
    np.savez(buf, frames=frame[None], coms=com[None], cubes=cube[None])
    body = buf.getvalue()

    results = []
    for window in (None, opts.window_ms):
        ps, httpd, url = _serve(est, window, opts.max_batch)
        mode = "plain" if window is None else f"microbatch_{window}ms"
        # warm: compile the b1 program, then (batched arm) EVERY
        # power-of-two bucket the measured concurrency levels can
        # coalesce into, so no XLA compile lands inside a measured run
        _run_clients(url, body, 1, 3)
        if window is not None:
            # a k-frame request dispatches a padded _bucket(k) batch
            # deterministically (concurrent 1-frame warmups might not
            # coalesce into the intended bucket)
            b = 2
            while b <= min(_bucket(max(clients)), opts.max_batch):
                buf = io.BytesIO()
                np.savez(buf, frames=np.repeat(frame[None], b, 0),
                         coms=np.repeat(com[None], b, 0),
                         cubes=np.repeat(cube[None], b, 0))
                _run_clients(url, buf.getvalue(), 1, 1)
                b <<= 1
        for n in clients:
            calls0 = ps.batches
            wall, errs, lats = _run_clients(url, body, n, opts.requests)
            total = n * opts.requests
            lats.sort()
            results.append({
                "mode": mode, "clients": n, "requests": total,
                "wall_s": round(wall, 3),
                "req_per_s": round(total / wall, 1),
                "ms_per_req": round(wall / total * 1e3, 3),
                "p50_ms": round(_pct(lats, 0.50) * 1e3, 3),
                "p95_ms": round(_pct(lats, 0.95) * 1e3, 3),
                "p99_ms": round(_pct(lats, 0.99) * 1e3, 3),
                # calls made DURING this run (ps.batches is cumulative)
                "estimator_calls": ps.batches - calls0, "errors": errs,
            })
            print(json.dumps(results[-1]), flush=True)
        httpd.shutdown()
        if ps.batcher is not None:
            ps.batcher.close()

    # summary: speedup per concurrency level
    by = {}
    for r in results:
        by.setdefault(r["clients"], {})[r["mode"].split("_")[0]] = r
    for n, d in sorted(by.items()):
        if "plain" in d and "microbatch" in d:
            s = d["microbatch"]["req_per_s"] / max(d["plain"]["req_per_s"],
                                                   1e-9)
            print(f"# clients={n}: micro-batching {s:.2f}x "
                  f"({d['plain']['req_per_s']} -> "
                  f"{d['microbatch']['req_per_s']} req/s)",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
