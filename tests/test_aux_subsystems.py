"""Aux-subsystem tests (SURVEY.md §5): determinism, orbax async
checkpointing, profiler hooks, docom crop refinement."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.train import LSPSTrainer
from lsps_tpu.train.checkpoint import OrbaxStateStore


def test_vae_update_deterministic():
    """Same seeds -> bit-identical losses across two fresh runs."""
    hyp = default_hyperparameters(reg_dim=12, small=True)
    hyp["vae"]["input_dim"] = 12
    y = jnp.asarray(np.random.RandomState(0).randn(8, 12), jnp.float32)

    def run():
        tr = LSPSTrainer(hyp)
        s = tr.init_state(jax.random.PRNGKey(5))
        losses = []
        for i in range(3):
            s, m, _ = tr.vae_update(s, y, jax.random.PRNGKey(i))
            losses.append(float(m["vae_total_loss"]))
        return losses

    assert run() == run()


def test_orbax_async_state_roundtrip(tmp_path):
    hyp = default_hyperparameters(reg_dim=12, small=True)
    hyp["vae"]["input_dim"] = 12
    hyp["dis"]["reg_dim"] = 12
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    hyp["map"]["output_ch"] = 16
    tr = LSPSTrainer(hyp)
    state = tr.init_state(jax.random.PRNGKey(0))

    store = OrbaxStateStore(str(tmp_path / "ckpt"))
    assert store.latest_step() is None
    store.save(state, 7)
    store.wait()
    assert store.latest_step() == 7

    template = tr.init_state(jax.random.PRNGKey(99))  # different values
    restored, step = store.restore(template)
    assert step == 7
    a = jax.tree_util.tree_leaves(state["params"]["gen"])[0]
    b = jax.tree_util.tree_leaves(restored["params"]["gen"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profile_trace_writes(tmp_path):
    from lsps_tpu.utils.logging import profile_trace

    logdir = str(tmp_path / "prof")
    with profile_trace(logdir):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    assert os.path.isdir(logdir)
    found = any("trace" in f or f.endswith(".pb") or "plugins" in d
                for d, _, fs in os.walk(logdir) for f in fs + [d])
    assert found


def test_docom_crop_refinement():
    """docom=True recenters the crop on the content CoM
    (handdetector.py:415-428)."""
    from lsps_tpu.data.camera import Camera
    from lsps_tpu.data.detector import HandDetector
    from lsps_tpu.data.synthetic import render_hand_depth

    cam = Camera.nyu()
    gen = np.random.RandomState(9)
    com3d = np.array([0.0, 0.0, 750.0], np.float32)
    dpt, _ = render_hand_depth(cam, com3d, 14, gen)
    hd = HandDetector(dpt, cam.fx, cam.fy)
    # give a com offset ~40px from the true hand
    bad_com = cam.to_img(com3d) + np.array([30.0, 30.0, 0.0])
    crop0, _, com0 = hd.crop_area_3d(com=bad_com, size=(300, 300, 300),
                                     docom=False)
    crop1, _, com1 = hd.crop_area_3d(com=bad_com, size=(300, 300, 300),
                                     docom=True)
    true_uv = cam.to_img(com3d)
    # refined com is closer to the true hand center than the bad one
    assert (np.linalg.norm(com1[:2] - true_uv[:2])
            < np.linalg.norm(np.asarray(bad_com[:2]) - true_uv[:2]))


def test_step_timer():
    from lsps_tpu.utils.logging import StepTimer

    t = StepTimer()
    t.tick(10)
    dt, sps = t.window()
    assert dt >= 0 and sps >= 0


def test_xla_cache_opt_out_subprocess():
    """LSPS_XLA_CACHE=0 genuinely disables the persistent compilation
    cache (it used to be silently re-enabled through a second env-var
    config in cli/common.py — review finding, round 3)."""
    import subprocess
    import sys

    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import lsps_tpu, lsps_tpu.cli.common; "
            "print('DIR=%r' % jax.config.jax_compilation_cache_dir)")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env={**os.environ, "LSPS_XLA_CACHE": "0"},
    )
    assert "DIR=None" in out.stdout, (out.stdout, out.stderr)
    on = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300,
        env={k: v for k, v in os.environ.items() if k != "LSPS_XLA_CACHE"},
    )
    assert "lsps_xla" in on.stdout, (on.stdout, on.stderr)
