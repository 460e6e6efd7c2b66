"""End-of-pretrain GAN-health advisory (cli/depth_train.gan_health_note):
the measured full-size chains (docs/BENCHMARKS.md "fused-step accuracy
A/B") showed tail dis_fake_acc >= ~0.95 predicts a weak latent space
(~2x estimate-mode error); the CLI surfaces that to the user while a
re-seed is still cheap."""

from helpers import make_synth_cfg

from lsps_tpu.cli.depth_train import FAKE_ACC_DOMINANT, gan_health_note


def test_dominant_tail_produces_note():
    tail = [(0.75, 0.96), (0.70, 0.97), (0.73, 0.95)]
    note = gan_health_note(tail)
    assert note is not None
    assert "--seed" in note and "0.96" in note


def test_healthy_tail_is_silent():
    assert gan_health_note([(0.57, 0.75), (0.60, 0.80)]) is None
    assert gan_health_note([]) is None


def test_threshold_separates_measured_chains():
    """The constant must keep separating the measured basins: healthy
    arms ended <= 0.85 tail fake acc, weak arms >= 0.95."""
    assert 0.85 < FAKE_ACC_DOMINANT < 0.95


def test_cli_wires_the_tail(tmp_path, monkeypatch):
    """A tiny pretrain run populates the acc tail from display-cadence
    metrics and prints the note iff the tail is dominant (monkeypatch
    the threshold to force both branches on the same 3-step run)."""
    import lsps_tpu.cli.depth_train as dt

    cfg = make_synth_cfg(tmp_path, "ganhealth")
    log = str(tmp_path / "logs")

    monkeypatch.setattr(dt, "FAKE_ACC_DOMINANT", -1.0)

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        dt.main(["--config", cfg, "--mode", "pretrain", "--log", log,
                 "--max-iterations", "3", "--batch-size", "4"])
    out = buf.getvalue()
    assert "discriminator-dominant" in out, out

    monkeypatch.setattr(dt, "FAKE_ACC_DOMINANT", 2.0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        dt.main(["--config", cfg, "--mode", "pretrain", "--log",
                 str(tmp_path / "logs2"), "--max-iterations", "3",
                 "--batch-size", "4"])
    assert "discriminator-dominant" not in buf.getvalue()
