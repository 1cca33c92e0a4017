#!/usr/bin/env python3
"""Symlink every Nth checkpoint into a validation-sweep directory — CLI
replacement for the reference's
``scripts/search_for_checkpoint_thru_validation/link_ckpts_for_val.ipynb``.

Usage:
    python scripts/link_ckpts.py SRC_DATA_DIR DST_DATA_DIR [--every 5]

The polling evaluator (``--run-type eval``) watches DST_DATA_DIR, so linking
a subset lets a single eval job sweep a long training run cheaply. Links are
renumbered densely (``ckpt.0.pth, ckpt.1.pth, ...``) in source-index order,
as the notebook did.
"""

import argparse
import os
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--every", type=int, default=1)
    args = ap.parse_args()

    ckpts = []
    for name in os.listdir(args.src):
        m = re.fullmatch(r"ckpt\.(\d+)\.pth", name)
        if m:
            ckpts.append((int(m.group(1)), name))
    ckpts.sort()
    os.makedirs(args.dst, exist_ok=True)

    linked = []
    for out_idx, (src_idx, name) in enumerate(ckpts[:: args.every]):
        dst = os.path.join(args.dst, f"ckpt.{out_idx}.pth")
        if os.path.lexists(dst):
            os.unlink(dst)
        os.symlink(os.path.abspath(os.path.join(args.src, name)), dst)
        linked.append((out_idx, src_idx))
    for out_idx, src_idx in linked:
        print(f"ckpt.{out_idx}.pth -> src ckpt.{src_idx}.pth")
    print(f"linked {len(linked)} of {len(ckpts)} checkpoints")


if __name__ == "__main__":
    main()
