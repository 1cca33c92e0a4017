#!/usr/bin/env python3
"""Group a jax.profiler trace's per-op time by HLO op_name metadata.

Maps each traced fusion/op name back to its `metadata={op_name=...}` line in
a compiled HLO dump, then aggregates device time by a short component label
(the jit(...)/ prefix chain + source file). This turns the flat fusion list
from profile_collect.py into a per-subsystem cost report.

Usage:
  python scripts/attribute_trace.py --trace-dir /tmp/m2h_trace \
      --hlo /tmp/m2h_collect_hlo.txt --iters 3
"""

import argparse
import glob
import gzip
import json
import re


def load_opnames(hlo_path):
    """name -> (op_name, source_file:line) from an HLO text dump."""
    pat = re.compile(
        r"%(\S+?) = .*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:[^}]*?source_file=\"([^\"]*)\")?"
        r"(?:[^}]*?source_line=(\d+))?"
    )
    out = {}
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                name, op, sf, sl = m.groups()
                src = f"{sf.split('/')[-1]}:{sl}" if sf else ""
                out[name] = (op, src)
    return out


def component(op_name, src):
    """Short label: innermost named jit scope + op kind + source."""
    parts = op_name.split("/")
    jits = [p for p in parts if p.startswith("jit(") or p.startswith("vmap")]
    scope = jits[-1] if jits else (parts[0] if parts else "?")
    kind = parts[-1].split("[")[0] if parts else "?"
    return f"{scope}/{kind}" + (f"  [{src}]" if src else "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/m2h_trace")
    ap.add_argument("--hlo", default="/tmp/m2h_collect_hlo.txt")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    names = load_opnames(args.hlo)
    paths = glob.glob(
        glob.os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
        recursive=True)
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}

    totals, counts, unmapped = {}, {}, {}
    grand = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        # umbrella spans (whole-program / while loop) double-count leaves
        if name.startswith("jit_") or name.startswith("while"):
            continue
        dur = e.get("dur", 0.0)
        grand += dur
        if name in names:
            op, src = names[name]
            label = component(op, src)
        else:
            label = f"<unmapped> {name.split('.')[0]}"
            unmapped[name] = unmapped.get(name, 0.0) + dur
        totals[label] = totals.get(label, 0.0) + dur
        counts[label] = counts.get(label, 0) + 1
    print(f"# leaf device time: {grand/1e3/args.iters:.1f} ms/iter "
          f"({len(unmapped)} unmapped op names, "
          f"{sum(unmapped.values())/1e3/args.iters:.1f} ms/iter)")
    for label, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{dur/1e3/args.iters:9.3f} ms/iter {100*dur/grand:5.1f}%  "
              f"{counts[label]//args.iters:5d}x  {label[:110]}")


if __name__ == "__main__":
    main()
