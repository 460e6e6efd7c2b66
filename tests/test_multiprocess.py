"""Multi-PROCESS execution of the multihost path (SURVEY §2.8).

test_multihost.py covers the single-process contracts; here the success
path actually RUNS: two coordinated processes (2 CPU devices each) form
a jax.distributed cluster, ``initialize`` succeeds with
``process_count == 2``, ``global_batch_from_host_shards`` assembles a
4-device global batch from per-host shards, and one fused pretrain step
executes with XLA's cross-process gradient all-reduce.  The trajectory
must match a 1-process 4-device control run bit-for-bit at f32
tolerance (same global batch, same replicated init).

Skips (with the captured reason) only if this JAX build genuinely
cannot form a CPU cluster — otherwise a failure here is a real bug.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(pid, nproc, port, ndev):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(HERE)
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port),
         str(ndev)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=os.path.dirname(HERE))


def _harvest(proc, timeout):
    out, err = proc.communicate(timeout=timeout)
    for line in out.splitlines():
        if line.startswith("UNSUPPORTED:"):
            return None, line[len("UNSUPPORTED:"):].strip(), out + err
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):]), None, out + err
    raise AssertionError(
        f"worker exited rc={proc.returncode} with no RESULT/UNSUPPORTED:\n"
        f"stdout:\n{out}\nstderr:\n{err}")


def test_two_process_pretrain_matches_single_process():
    # no pytest-timeout on this box; the _harvest timeouts bound the run
    port = _free_port()
    workers = [_spawn(i, 2, port, 2) for i in range(2)]
    results, unsupported = [], None
    for w in workers:
        try:
            res, unsup, log = _harvest(w, timeout=720)
        except subprocess.TimeoutExpired:
            for x in workers:
                x.kill()
            raise
        if unsup is not None:
            unsupported = unsup
        else:
            results.append(res)
    if unsupported is not None:
        pytest.skip(f"this JAX build cannot form a 2-process CPU "
                    f"cluster: {unsupported}")

    assert len(results) == 2
    for r in results:
        assert r["process_count"] == 2
        assert r["n_devices"] == 4
    # both controllers observe the same replicated metrics
    for k in results[0]:
        np.testing.assert_allclose(results[0][k], results[1][k],
                                   rtol=1e-6, atol=1e-7, err_msg=k)

    # control: same global batch on a single-process 4-device mesh
    ctl = _spawn(0, 1, port, 4)
    res, unsup, log = _harvest(ctl, timeout=720)
    assert unsup is None, f"control arm unexpectedly unsupported: {unsup}"
    assert res["process_count"] == 1 and res["n_devices"] == 4
    for k in ("dis_loss", "dis_ad_loss", "gen_total_loss", "gen_ll_loss",
              "dis_true_acc", "dis_fake_acc"):
        np.testing.assert_allclose(
            results[0][k], res[k], rtol=5e-5, atol=1e-6,
            err_msg=f"2-process vs 1-process {k}")
