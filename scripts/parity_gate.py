"""One-command ±0.5 mm parity gate against released reference
checkpoints (docs/REALDATA.md §3, automated).

    python scripts/parity_gate.py --config exps/nnyu.yaml \
        --dis <pre_dis_*.pkl> --vae <pre_vae_*.pkl> [--expect <mm>]

Loads the released torch ``.pkl`` state_dicts through the converter
(lsps_tpu.train.torch_convert), runs OUR eval pipeline (the exact
protocol of cli.depth_train.evaluate_estimation — reference
src/depth_train.py:185-253 incl. the NYU 14-joint subset) over the
config's test dataset, and prints the mean mm error.  With ``--expect``
(the reference's published/printed number) it exits nonzero unless
|ours - expected| <= 0.5 mm.

When the datasets or checkpoints are missing it reports exactly what is
needed and exits 2 — the same command runs the real gate unmodified the
day they appear.  The trained-weights proxy for this environment is
tests/test_trained_weights_parity.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--config", required=True)
    p.add_argument("--dis", required=True,
                   help="released pre_dis_*.pkl (or pre_est_dis_*.pkl)")
    p.add_argument("--vae", required=True,
                   help="released pre_vae_<frac>_*.pkl")
    p.add_argument("--gen", default=None,
                   help="optional pre_gen_*.pkl (not needed for eval)")
    p.add_argument("--expect", type=float, default=None,
                   help="reference mean mm error; gate = +-0.5 mm")
    p.add_argument("--tolerance", type=float, default=0.5)
    p.add_argument("--batch-size", type=int, default=64)
    opts = p.parse_args(argv)

    missing = [f for f in (opts.dis, opts.vae, opts.gen)
               if f and not os.path.isfile(f)]
    if missing:
        print("MISSING checkpoints:\n  " + "\n  ".join(missing))
        print("Provide the released .pkl files "
              "(reference lsps_trainer.py:307-323 naming).")
        return 2

    import jax

    from lsps_tpu.cli import common as C
    from lsps_tpu.cli.depth_train import evaluate_estimation
    from lsps_tpu.data.loader import get_data_loader, get_dataset
    from lsps_tpu.train.torch_convert import load_torch_checkpoint

    from lsps_tpu.config import NetConfig

    Evaluation, color_idx, bones = C.select_eval(opts.config)
    config = NetConfig(opts.config)

    # dataset availability check, with a precise report
    test_spec = config.datasets.get("test_b")
    root = test_spec.get("root", "") if test_spec else ""
    if not root or not os.path.isdir(root):
        print(f"MISSING dataset: test_b root {root!r} does not exist.\n"
              "Point exps/*.yaml root: at the real NYU/ICVL layout "
              "(docs/REALDATA.md §1).")
        return 2

    try:
        dataset_test = get_dataset(test_spec)
    except Exception as e:
        print(f"Dataset load failed: {type(e).__name__}: {e}\n"
              "Check the layout against docs/REALDATA.md §1.")
        return 2

    trainer = C.make_trainer(config, sch_interval=1000)
    state = trainer.init_state(jax.random.PRNGKey(0))
    params = dict(state["params"])
    params["dis"] = load_torch_checkpoint(opts.dis, params["dis"])
    params["vae"] = load_torch_checkpoint(opts.vae, params["vae"])
    if opts.gen:
        params["gen"] = load_torch_checkpoint(opts.gen, params["gen"])
    state = {**state, "params": params}

    test_loader = get_data_loader(dataset_test, opts.batch_size,
                                  shuffle=False)
    image_dir = "./outputs/parity_gate"
    os.makedirs(image_dir, exist_ok=True)
    err, acc = evaluate_estimation(
        trainer, state, test_loader, dataset_test.di, Evaluation,
        color_idx, bones, image_dir, mode_idx=3,
        nyu_protocol="nyu" in opts.config)
    print(f"parity_gate: mean err {err:.4f} mm, {acc:.2f}% within 40 mm")

    if opts.expect is not None:
        delta = abs(err - opts.expect)
        ok = delta <= opts.tolerance
        print(f"parity_gate: |{err:.4f} - {opts.expect:.4f}| = "
              f"{delta:.4f} mm -> {'PASS' if ok else 'FAIL'} "
              f"(tolerance {opts.tolerance} mm)")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
