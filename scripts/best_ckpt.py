#!/usr/bin/env python3
"""Select the best checkpoint from a directory of eval stat dumps — CLI
replacement for the reference's
``scripts/search_for_checkpoint_thru_validation/find_bestCkpt_lowestValSTFTLoss.ipynb``
(which parsed train.log by hand).

Usage:
    python scripts/best_ckpt.py MODEL_DIR [--metric mem_l2_last] [--split val]

Scans ``{split}_stats_ckpt_{i}_{seed}.json`` files written by the evaluator
and prints the checkpoint index with the lowest mean of the chosen metric.
"""

import argparse
import glob
import json
import os
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--metric", default="mem_l2_last")
    ap.add_argument("--split", default="val")
    args = ap.parse_args()

    pattern = os.path.join(args.model_dir, f"{args.split}_stats_ckpt_*_*.json")
    best = None
    for path in sorted(glob.glob(pattern)):
        m = re.search(r"_ckpt_(\d+)_", os.path.basename(path))
        if not m:
            continue
        idx = int(m.group(1))
        with open(path) as f:
            stats = json.load(f)
        if args.metric not in stats:
            continue
        val = stats[args.metric]["mean"]
        if best is None or val < best[1]:
            best = (idx, val, path)

    if best is None:
        raise SystemExit(f"no eval stats matching {pattern} with {args.metric}")
    print(
        json.dumps(
            {"best_ckpt_index": best[0], args.metric: best[1], "stats_file": best[2]}
        )
    )


if __name__ == "__main__":
    main()
