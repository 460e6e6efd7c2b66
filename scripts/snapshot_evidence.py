#!/usr/bin/env python
"""Snapshot training-run evidence into the repo (docs/evidence/).

The benchmark claims in docs/BENCHMARKS.md are backed by on-disk
training logs under ./logs/** — which live outside git and are lost
whenever this environment is reset.  This tool copies the *tails* of
every run log and metrics.jsonl (the parts that carry the eval metric
lines: "Mean err ... mm, Max over 40mm ... %", loss cadence prints,
iteration stamps) into docs/evidence/<run>/ so the numbers stay
independently checkable from the repository alone.

Usage:
    python scripts/snapshot_evidence.py [logdir ...]   # default: ./logs
"""

import os
import sys

TAIL_LINES = 120
# also keep every eval-metric line regardless of position in the file
KEEP_MARKERS = ("Mean err", "best", "Iteration:", "lr=",
                "collapse guard", "overfit advisory", "GAN health")
MAX_KEPT = 400


def snapshot_file(src: str, dst: str) -> None:
    with open(src, "r", errors="replace") as f:
        lines = f.readlines()
    kept = [ln for ln in lines[:-TAIL_LINES]
            if any(m in ln for m in KEEP_MARKERS)]
    if len(kept) > MAX_KEPT:  # thin evenly, keep first/last
        step = len(kept) / float(MAX_KEPT)
        kept = [kept[int(i * step)] for i in range(MAX_KEPT)]
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        f.write("# evidence snapshot of %s (%d lines total; kept %d "
                "metric lines + last %d lines)\n"
                % (src, len(lines), len(kept), TAIL_LINES))
        f.writelines(kept)
        if kept:
            f.write("# ---- tail ----\n")
        f.writelines(lines[-TAIL_LINES:])


def main(argv):
    roots = argv[1:] or ["./logs"]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_root = os.path.join(here, "docs", "evidence")
    n = 0
    for root in roots:
        for dirpath, _, names in os.walk(root):
            for name in sorted(names):
                if not (name.endswith(".log") or name == "metrics.jsonl"):
                    continue
                src = os.path.join(dirpath, name)
                rel = os.path.relpath(src, root).replace(os.sep, "/")
                run = os.path.basename(os.path.abspath(root))
                dst = os.path.join(out_root, run, *rel.split("/"))
                snapshot_file(src, dst)
                print("snapshot:", src, "->", os.path.relpath(dst, here))
                n += 1
    if not n:
        print("no .log / metrics.jsonl files found under", roots)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
