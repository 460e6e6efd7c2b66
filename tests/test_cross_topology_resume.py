"""Cross-topology checkpoint restore (preemption-resume on a DIFFERENT
slice shape).

Checkpoints are topology-free by construction: both stores serialize
host arrays (CheckpointManager via np.asarray of each leaf,
OrbaxStateStore via jax.device_get before the async write), and both
restore paths produce host state that the caller then lays out on
whatever mesh the resuming run was given (cli/depth_train.py shards
AFTER all checkpoint loads).  These tests pin that property with VALUE
equality: a trajectory continued on 4 or 1 devices from an 8-device
checkpoint (and the reverse) must produce the same step metrics as the
uninterrupted run.

Reference semantics being preserved: lsps_trainer.py:278-332 resume —
the reference is single-GPU so "same trajectory after resume" is its
whole contract; the mesh dimension is TPU-native scope (SURVEY §2.8).
"""

import os

import numpy as np
import pytest

import jax

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.parallel import make_mesh, pjit_update, shard_batch, \
    shard_state
from lsps_tpu.train import LSPSTrainer
from lsps_tpu.train.checkpoint import CheckpointManager, OrbaxStateStore

from helpers import make_synth_cfg, read_metrics

BATCH = 8  # divisible by every mesh size used (8, 4, 2, 1)
REG = 12


def _hyp():
    hyp = default_hyperparameters(reg_dim=REG, small=True)
    hyp["vae"]["input_dim"] = REG
    hyp["dis"]["reg_dim"] = REG
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    hyp["map"]["output_ch"] = 16
    return hyp


def _batches(n_steps):
    rs = np.random.RandomState(7)
    out = []
    for _ in range(n_steps):
        out.append((rs.randn(BATCH, 128, 128, 1).astype(np.float32) * .2,
                    rs.randn(BATCH, REG).astype(np.float32) * .3,
                    rs.randn(BATCH, 128, 128, 1).astype(np.float32) * .2,
                    rs.randn(BATCH, REG).astype(np.float32) * .3))
    return out


def _run(trainer, host_state, n_devices, batches, start_step=0):
    """Run len(batches) fused pretrain steps on an n-device mesh from a
    HOST state; returns (host_state, [metrics])."""
    mesh = make_mesh(n_data=n_devices,
                     devices=jax.devices()[:n_devices])
    state = shard_state(mesh, host_state)

    # pjit with in_shardings rejects call-time kwargs; close over
    # with_viz the way cli/depth_train._mk_step does
    def _step(s, ia, la, ib, lb, r):
        return trainer._pretrain_update(s, ia, la, ib, lb, r,
                                        with_viz=False)

    step_fn = pjit_update(_step, mesh, n_batch_args=4,
                          donate_state=False)
    metrics = []
    with mesh:
        for k, (ia, la, ib, lb) in enumerate(batches):
            sia, sla, sib, slb = shard_batch(mesh, ia, la, ib, lb)
            state, m, _ = step_fn(state, sia, sla, sib, slb,
                                  jax.random.PRNGKey(100 + start_step + k))
            metrics.append({k2: float(np.asarray(v))
                            for k2, v in m.items()})
    return jax.device_get(state), metrics


def _assert_metrics_close(a, b, what):
    for key in ("dis_loss", "gen_total_loss", "gen_ad_loss",
                "gen_ll_loss"):
        np.testing.assert_allclose(
            a[key], b[key], rtol=2e-3, atol=1e-4,
            err_msg=f"{what}: metric {key}")


@pytest.mark.parametrize("save_n,restore_ns", [(8, (4, 1)), (1, (8,))])
def test_trainer_cross_topology_resume(tmp_path, save_n, restore_ns):
    """Save mid-trajectory under one mesh size, restore and continue
    under others; every continuation must reproduce the uninterrupted
    run's metrics (cross-sharding reduction-order tolerance only)."""
    trainer = LSPSTrainer(_hyp())
    init = jax.device_get(trainer.init_state(jax.random.PRNGKey(0)))
    batches = _batches(3)

    # uninterrupted run on the saving topology
    mid, m01 = _run(trainer, init, save_n, batches[:2])
    _, m2 = _run(trainer, mid, save_n, batches[2:], start_step=2)
    reference_step3 = m2[0]

    # save the mid-state through BOTH stores
    prefix = str(tmp_path / "out" / "pre")
    ckpt = CheckpointManager()
    ckpt.save(mid, prefix, iterations=1)  # writes step 2 files
    store = OrbaxStateStore(str(tmp_path / "orbax"))
    store.save(mid, step=2)
    store.wait()

    for n in restore_ns:
        # npz path: overlay onto a FRESH template (new init); loads
        # gen/dis/map params + gen/dis opt (the reference-parity file
        # family); vae comes from its own fraction-keyed file in the
        # CLI, so carry it here
        fresh = jax.device_get(trainer.init_state(jax.random.PRNGKey(9)))
        restored, iters = ckpt.resume(fresh, prefix, load_opt=True)
        assert iters == 2 and ckpt.last_opt_loaded
        restored["params"]["vae"] = mid["params"]["vae"]
        restored["opt"]["vae"] = mid["opt"]["vae"]
        restored["step"] = mid["step"]
        _, m_npz = _run(trainer, restored, n, batches[2:], start_step=2)
        _assert_metrics_close(m_npz[0], reference_step3,
                              f"npz {save_n}->{n} devices")

        # orbax path: full state in one unit
        fresh = jax.device_get(trainer.init_state(jax.random.PRNGKey(9)))
        restored_o, step = store.restore(fresh)
        assert step == 2
        _, m_orb = _run(trainer, restored_o, n, batches[2:],
                        start_step=2)
        _assert_metrics_close(m_orb[0], reference_step3,
                              f"orbax {save_n}->{n} devices")


def test_cli_cross_topology_resume(tmp_path):
    """The product path: pretrain --mesh-data 8 saves a snapshot, a
    resumed run on --mesh-data 4 (and single-device) continues from it
    through the ordinary --resume 1 machinery."""
    from lsps_tpu.cli import depth_train

    cfg = make_synth_cfg(tmp_path, "xt", ch=4, n_frames=10,
                         snapshot_iters=2, image_iters=100)
    log8 = str(tmp_path / "logs8")
    depth_train.main(["--config", cfg, "--mode", "pretrain",
                      "--log", log8, "--max-iterations", "2",
                      "--batch-size", "8", "--mesh-data", "8"])
    out_dir = str(tmp_path / "xt")
    files = os.listdir(out_dir)
    assert any(f.startswith("pre_gen_") for f in files), files
    # keep a pristine copy of the 8-device snapshot: each resumed run
    # writes ITS OWN later snapshots into out_dir, and --resume picks
    # the lexicographic latest, so the second resume would otherwise
    # continue the first resume instead of the 8-device checkpoint
    import shutil

    saved = str(tmp_path / "xt_saved")
    shutil.copytree(out_dir, saved)

    for tag, extra in (("res4", ["--mesh-data", "4"]), ("res1", [])):
        shutil.rmtree(out_dir)
        shutil.copytree(saved, out_dir)
        log = str(tmp_path / f"logs_{tag}")
        depth_train.main(["--config", cfg, "--mode", "pretrain",
                          "--resume", "1", "--log", log,
                          "--max-iterations", "4", "--batch-size", "8"]
                         + extra)
        recs = read_metrics(log, cfg)
        # resumed at iteration 2 -> exactly steps 3..4 run
        assert [r["step"] for r in recs] == [3, 4], (tag, recs)
        assert all(np.isfinite(r["dis_loss"]) for r in recs)
