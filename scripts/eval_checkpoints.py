"""Evaluate saved estimate-mode checkpoints (mean mm error / acc).

Re-runs the depth CLI's test-set evaluation (depth_train.py:185-253 in
the reference) over each ``pre_est_*`` snapshot of an experiment —
useful to recover eval numbers from a run whose stdout was lost, or to
plot error-vs-iteration after the fact.

Usage:
    env -u JAX_PLATFORMS python scripts/eval_checkpoints.py \
        --config exps/synth_step.yaml --frac 0.9 --bf16
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--frac", type=float, default=0.9)
    p.add_argument("--mode-idx", type=int, default=3)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--batch-size", type=int, default=32,
                   help="training batch size of the run (test batch is "
                        "32x this, as in the CLI)")
    opts = p.parse_args()
    opts.seed = 1
    opts.max_iterations = None

    import jax
    from lsps_tpu.cli import common as C
    from lsps_tpu.cli.depth_train import evaluate_estimation
    from lsps_tpu.data.loader import get_data_loader
    from lsps_tpu.train.checkpoint import get_model_list

    Evaluation, color_idx, bones = C.select_eval(opts.config)
    config = C.load_experiment(opts)
    _, dataset_b, dataset_test = C.make_datasets(config)
    trainer = C.make_trainer(config, sch_interval=100)
    state = trainer.init_state(jax.random.PRNGKey(opts.seed))

    vae_frac = 2 + opts.frac if opts.mode_idx in (3, 4) else opts.frac
    state, ok = trainer.load_vae(state, config.snapshot_prefix, vae_frac)
    if not ok:
        raise SystemExit("no VAE checkpoint for frac "
                         f"{vae_frac:.2f} under {config.snapshot_prefix}")
    if 0.0 < opts.frac < 1.0:
        dataset_b.set_nmax(opts.frac)

    test_loader = get_data_loader(dataset_test, opts.batch_size * 32,
                                  shuffle=False)
    image_dir = tempfile.mkdtemp(prefix="eval_ckpt_")

    # enumerate est checkpoints (oldest -> newest) by probing idx 0..n
    dirname = os.path.dirname(config.snapshot_prefix) or "."
    files = []
    i = 0
    while True:
        try:
            f = get_model_list(dirname, "est_gen", i)
        except IndexError:
            break
        if f is None or f in files:
            break
        files.append(f)
        i += 1
    if not files:
        raise SystemExit(f"no est_gen checkpoints under {dirname}")

    is_nyu = "nyu" in opts.config
    for i, f in enumerate(files):
        st, it = trainer.resume(state, config.snapshot_prefix, idx=i,
                                est=True)
        err, acc = evaluate_estimation(
            trainer, st, test_loader, dataset_b.di, Evaluation,
            color_idx, bones, image_dir, opts.mode_idx, is_nyu)
        print(f"checkpoint {os.path.basename(f)} (iteration {it}): "
              f"Mean err: {err:.4f} mm, Max over 40mm: {acc:.2f} %",
              flush=True)


if __name__ == "__main__":
    main()
