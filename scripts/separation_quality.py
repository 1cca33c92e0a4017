#!/usr/bin/env python3
"""Aggregate per-episode LAST-STEP separation quality from the evaluator's
``eval_metrics_ckpt_{i}.pkl`` dump — CLI replacement for the reference's
``scripts/separated_audio_quality/compute_separation_qualtiy.ipynb`` (sic),
which printed mean/std of last-step SI-SDR / STFT-L2 per checkpoint.

Usage:
    python scripts/separation_quality.py MODEL_DIR [--ckpt 0]
        [--metrics si_sdr si_sdri]

Handles both dump layouts: the host evaluator's per-episode dict (lists of
per-step values + per-step ``quality`` dicts) and the device evaluator's
per-batch (T, N) arrays.
"""

import argparse
import json
import os
import pickle

import numpy as np


def _collect_host(dump, metrics):
    """{(scene, ep): {mono_l2: [...], quality: [{mono: {...}, ...}]}}."""
    out = {}
    for ep_metrics in dump.values():
        for k in ("mono_l2", "mem_l2", "bin_l2"):
            if ep_metrics.get(k):
                out.setdefault(f"{k}_last", []).append(ep_metrics[k][-1])
        quality = ep_metrics.get("quality")
        if quality:
            last = quality[-1]
            for head in ("mono", "monoFromMem"):
                for m in metrics:
                    if m in last.get(head, {}):
                        out.setdefault(f"{head}_{m}_last", []).append(
                            last[head][m]
                        )
    return out

def _collect_device(dump):
    """{batch_idx: {mono_l2: (T, N) array, ...}}."""
    out = {}
    for batch in dump.values():
        for k, arr in batch.items():
            arr = np.asarray(arr)
            if arr.ndim == 2:  # (T, N): last step, each env
                out.setdefault(f"{k}_last", []).extend(arr[-1].tolist())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--ckpt", type=int, default=0)
    ap.add_argument("--metrics", nargs="*", default=["si_sdr", "si_sdri"])
    args = ap.parse_args()

    path = os.path.join(args.model_dir, f"eval_metrics_ckpt_{args.ckpt}.pkl")
    with open(path, "rb") as f:
        dump = pickle.load(f)

    first = next(iter(dump.values()))
    if isinstance(first, dict) and any(
        isinstance(v, np.ndarray) for v in first.values()
    ):
        collected = _collect_device(dump)
    else:
        collected = _collect_host(dump, args.metrics)

    summary = {
        k: {
            "mean": float(np.mean(v)),
            "std": float(np.std(v)),
            "n": len(v),
        }
        for k, v in sorted(collected.items())
        if len(v)
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
