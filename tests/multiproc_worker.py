"""Worker process for tests/test_multiprocess.py.

Argv: <process_id> <num_processes> <coordinator_port> <local_devices>

Forms (or joins) a jax.distributed CPU cluster via
lsps_tpu.parallel.multihost.initialize, builds the global mesh,
assembles its per-host shard of a DETERMINISTIC global batch via
global_batch_from_host_shards, runs ONE fused pretrain step
(dis+gen update — the product training program), and prints the
metrics as a single ``RESULT {...}`` JSON line for the parent test.

Prints ``UNSUPPORTED: <reason>`` instead if this JAX build cannot run
cross-process CPU collectives (the parent skips with that reason).
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    ndev_local = int(sys.argv[4])

    # control local device count explicitly (conftest-style); the
    # baked sitecustomize may have initialized the axon backend
    os.environ.pop("XLA_FLAGS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as jeb

        jeb.clear_backends()
    except Exception:
        pass
    jax.config.update("jax_num_cpu_devices", ndev_local)
    try:  # cross-process CPU collectives backend (name varies by ver)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from lsps_tpu.parallel.multihost import (global_batch_from_host_shards,
                                             initialize)

    if nproc > 1:
        ok, reason = initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=pid)
        if not ok:
            print(f"UNSUPPORTED: initialize failed: {reason}", flush=True)
            return 0
        assert jax.process_count() == nproc, jax.process_count()

    import numpy as np

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.parallel import make_mesh, pjit_update, shard_state
    from lsps_tpu.train import LSPSTrainer

    devs = jax.devices()
    n_global = nproc * ndev_local
    assert len(devs) == n_global, (len(devs), n_global)

    hyp = default_hyperparameters(reg_dim=12, small=True)
    hyp["vae"]["input_dim"] = 12
    hyp["dis"]["reg_dim"] = 12
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    hyp["map"]["output_ch"] = 16

    trainer = LSPSTrainer(hyp)
    # same PRNGKey in every process -> identical replicated params
    state = trainer.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=n_global)

    # deterministic GLOBAL batch, recomputed identically per process;
    # each host contributes only its contiguous shard
    b = n_global
    rs = np.random.RandomState(7)
    imgs_a = (rs.randn(b, 128, 128, 1) * 0.2).astype(np.float32)
    lbls_a = (rs.randn(b, 12) * 0.1).astype(np.float32)
    imgs_b = (rs.randn(b, 128, 128, 1) * 0.2).astype(np.float32)
    lbls_b = (rs.randn(b, 12) * 0.1).astype(np.float32)
    lo = pid * b // nproc
    hi = (pid + 1) * b // nproc

    try:
        state = shard_state(mesh, state)
        batch = global_batch_from_host_shards(
            mesh, [imgs_a[lo:hi], lbls_a[lo:hi],
                   imgs_b[lo:hi], lbls_b[lo:hi]])
        step = pjit_update(trainer._pretrain_update, mesh, n_batch_args=4,
                           donate_state=False)
        with mesh:
            state, mets, _ = step(state, *batch, jax.random.PRNGKey(2))
        out = {k: float(np.asarray(v)) for k, v in mets.items()
               if k in ("dis_loss", "dis_ad_loss", "gen_total_loss",
                        "gen_ll_loss", "dis_true_acc", "dis_fake_acc")}
    except Exception as e:  # genuine incapability vs a real bug is
        # decided by the parent on the reason text
        print(f"UNSUPPORTED: {type(e).__name__}: {e}", flush=True)
        return 0
    out["process_count"] = jax.process_count()
    out["n_devices"] = len(devs)
    print("RESULT " + json.dumps(out, sort_keys=True), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
