#!/usr/bin/env python3
"""Measure the host<->device link: upload bandwidth (device_put), fetch RTT,
and fetch bandwidth. The episode-keyed sub-bank path (env/sub_bank.py)
re-uploads evicted RIR rows, so its sustainable env-steps/s is bounded by

    link_bw / (miss_rate * s_mix * row_bytes / horizon)    [per env]

— on a PCIe-attached TPU host this bound is thousands of steps/s; on the
tunneled single-chip dev environment it is single digits (the bench's
`--mode sub` number; docs/ROUND5_NOTES.md "sub-mode analysis"). This probe
prints the measured numbers that analysis plugs in.

Usage: python scripts/link_probe.py [--mb 64] [--repeats 3]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    nbytes = args.mb * 2**20
    host = np.random.default_rng(0).integers(
        0, 255, nbytes, dtype=np.uint8
    )

    # upload bandwidth: device_put + block
    up = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        arr = jax.device_put(host, dev)
        arr.block_until_ready()
        up.append(nbytes / (time.perf_counter() - t0))
        del arr
    # fetch RTT: 4-byte scalar round trip
    small = jax.device_put(np.float32(1.0), dev)
    small.block_until_ready()
    rtts = []
    for _ in range(max(3, args.repeats)):
        t0 = time.perf_counter()
        float(small)
        rtts.append(time.perf_counter() - t0)
    # fetch bandwidth
    big = jax.device_put(host, dev)
    big.block_until_ready()
    down = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        np.asarray(big)
        down.append(nbytes / (time.perf_counter() - t0))

    print(
        json.dumps(
            {
                "platform": dev.platform,
                "upload_MBps": round(max(up) / 2**20, 1),
                "fetch_MBps": round(max(down) / 2**20, 1),
                "fetch_rtt_ms": round(min(rtts) * 1e3, 2),
                "probe_mb": args.mb,
            }
        )
    )


if __name__ == "__main__":
    main()
