#!/usr/bin/env python3
"""Merge a nav-policy checkpoint and a quality-improvement-policy checkpoint
into one switch-policy eval checkpoint — CLI replacement for the reference's
``scripts/farTarget_eval/copy_individualCkptsNCfgs_switchPolicyEval.ipynb``.

Usage:
    python scripts/merge_switch_ckpt.py NAV_CKPT QUALIMPROV_CKPT OUT_CKPT
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("nav_ckpt")
    ap.add_argument("qual_improv_ckpt")
    ap.add_argument("out_ckpt")
    args = ap.parse_args()

    from move2hear_tpu.eval.evaluator import merge_switch_policy_checkpoint

    out = merge_switch_policy_checkpoint(
        args.nav_ckpt, args.qual_improv_ckpt, args.out_ckpt
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
