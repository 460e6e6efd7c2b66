"""Tabulate the fused-step accuracy A/B arms (docs/BENCHMARKS.md).

Reads each arm's pretrain metrics.jsonl (final discriminator true/fake
accuracies — the GAN-health signal the reference logs to TensorBoard,
lsps_trainer.py:194-199) and estimate3 log (first / best mean mm error)
and prints one table row per arm.

Usage: python scripts/ab_summary.py [logdir ...]
Defaults to the four round-3 arms.
"""

import json
import os
import re
import sys

DEFAULT_ARMS = [
    ("step s23455", "logs/stress_step", "estimate3_20k.log"),
    ("native s23455", "logs/ab_native", "estimate3.log"),
    ("native s777", "logs/ab_native_s777", "estimate3.log"),
    ("step s777", "logs/ab_step_s777", "estimate3.log"),
]

MEAN_RE = re.compile(r"Mean err: ([0-9.]+) \(([0-9.]+)\) mm")


def pretrain_accs(logdir):
    """Mean of the last 5 logged (true, fake) discriminator accuracies."""
    for sub in sorted(os.listdir(logdir)):
        p = os.path.join(logdir, sub, "metrics.jsonl")
        if not os.path.isfile(p):
            continue
        rows = [json.loads(line) for line in open(p)]
        acc = [r for r in rows if "dis_true_acc" in r]
        if acc:
            tail = acc[-5:]
            t = sum(r["dis_true_acc"] for r in tail) / len(tail)
            f = sum(r["dis_fake_acc"] for r in tail) / len(tail)
            return t, f
    return None


def est3_errors(path):
    """(first_eval_mm, best_mm, n_evals) from an estimate3 log."""
    if not os.path.isfile(path):
        return None
    vals = [float(m.group(1)) for m in MEAN_RE.finditer(open(path).read())]
    if not vals:
        return None
    return vals[0], min(vals), len(vals)


def main():
    arms = DEFAULT_ARMS
    if len(sys.argv) > 1:
        arms = [(d, d, "estimate3.log") for d in sys.argv[1:]]
    print(f"{'arm':<16} {'pretrain true/fake acc':<24} "
          f"{'est3 first':<11} {'est3 best':<10} evals")
    for name, logdir, est_log in arms:
        if not os.path.isdir(logdir):
            print(f"{name:<16} (missing: {logdir})")
            continue
        accs = pretrain_accs(logdir)
        accs_s = "%.2f / %.2f" % accs if accs else "-"
        est = est3_errors(os.path.join(logdir, est_log))
        est_s = ("%-11.2f %-10.2f %d" % est) if est else "(pending)"
        print(f"{name:<16} {accs_s:<24} {est_s}")


if __name__ == "__main__":
    main()
