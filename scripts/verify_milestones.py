#!/usr/bin/env python
"""Assert the MultiStepLR decay boundaries landed exactly in a
milestones_chain.sh run (metrics carry the per-update dis_lr/gen_lr).

Boundaries with --sch-interval 10: iteration 2000 (x0.5), 3000 (x0.25),
4000 (x0.125), 4500 (x0.0625) — reference milestones [200,300,400,450]
gamma 0.5, lsps_trainer.py:32-34.
"""

import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return {r["step"]: r for r in map(json.loads,
                                          f.read().splitlines())}


def expect_lr(step, lr):
    # metrics log the lr used AT that step (count = step-1, epoch =
    # (count+1)//10 = step//10; boundary at step 2000 -> epoch 200)
    n = sum(step // 10 >= m for m in (200, 300, 400, 450))
    return lr * 0.5 ** n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run1", required=True)
    p.add_argument("--run2", required=True)
    p.add_argument("--lr", type=float, default=1e-4)
    opts = p.parse_args(argv)

    recs = load(opts.run1)
    recs.update(load(opts.run2))
    checks = [1950, 2000, 2050, 2950, 3000, 3950, 4000, 4450, 4500, 5000]
    bad = 0
    for step in checks:
        r = recs.get(step)
        if r is None:
            print(f"step {step}: MISSING")
            bad += 1
            continue
        want = expect_lr(step, opts.lr)
        got = r["dis_lr"]
        ok = abs(got - want) <= 1e-9 + 1e-6 * want
        ok_g = abs(r["gen_lr"] - want) <= 1e-9 + 1e-6 * want
        fin = all(v == v and abs(v) < 1e9
                  for k, v in r.items() if k.endswith("loss"))
        print(f"step {step}: dis_lr={got:.3e} want={want:.3e} "
              f"{'OK' if ok and ok_g and fin else 'FAIL'}"
              f"{'' if fin else ' (non-finite loss!)'}")
        bad += 0 if (ok and ok_g and fin) else 1
    if bad:
        print(f"{bad} checks failed")
        return 1
    print("milestones chain: all LR boundaries landed exactly; "
          "losses finite throughout")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
