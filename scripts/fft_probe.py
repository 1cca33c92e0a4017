#!/usr/bin/env python3
"""Probe XLA:TPU FFT cost vs transform length for the render-chain shapes.

The binaural render convolves 16000-sample mono with 16000-tap RIRs
(reference: habitat_audio/simulator_train.py:417-419). The "same" window
only needs a circular conv of length >= 24000 (ops/convolve.py), so any
even 5-smooth size in [24000, 32768] is a candidate. This measures, for
each size: compile seconds and steady ms/call of (a) the eager
rfft+product+irfft pipeline at collect batch shapes and (b) the same body
inside a lax.scan over T steps — scan compilation can behave differently.

Usage: python scripts/fft_probe.py [--batch 112] [--steps 20] [--timeout-ok]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_compile(fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    return compiled, time.time() - t0


def steady_ms(compiled, *args, iters=10):
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = compiled(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=112)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[24000, 24576, 25600, 27000, 32768])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    b, s, r, lx = args.batch, 2, 16000, 16000
    rng = np.random.default_rng(0)
    mono = jnp.asarray(rng.standard_normal((b, s, lx)), jnp.float32)
    rirs = jnp.asarray(
        rng.standard_normal((b, s, 2, r)) * 0.05, jnp.float32
    )

    print(f"# batch={b} sources={s} ears=2 rir={r} mono={lx} "
          f"device={jax.devices()[0]}")
    for nfft in args.sizes:
        nf = nfft // 2 + 1
        mf = jnp.fft.rfft(mono, n=nfft, axis=-1)[:, :, None, :]  # (B,S,1,NF)

        def render(mf_, h_):
            hf = jnp.fft.rfft(h_, n=nfft, axis=-1)          # (B,S,2,NF)
            y = jnp.fft.irfft(mf_ * hf, n=nfft, axis=-1)
            start = (r - 1) // 2
            return jax.lax.dynamic_slice_in_dim(y, start, lx, axis=-1)

        c_eager, ct = timed_compile(render, mf, rirs)
        ms = steady_ms(c_eager, mf, rirs, iters=args.iters)

        def scan_body(carry, x):
            # scale the RIRs by the per-step scalar so the render is NOT
            # loop-invariant (XLA would hoist it out of the scan otherwise)
            y = render(mf, rirs * x)
            return carry + y[..., 0].sum(), None

        def scanned(c0, xs):
            out, _ = jax.lax.scan(scan_body, c0, xs)
            return out

        xs = jnp.asarray(rng.standard_normal(args.steps), jnp.float32)
        c_scan, ct_s = timed_compile(scanned, jnp.float32(0), xs)
        ms_s = steady_ms(c_scan, jnp.float32(0), xs, iters=3)

        print(f"nfft={nfft:6d} (nf={nf:5d})  eager: compile {ct:6.1f}s "
              f"run {ms:8.2f} ms   scan[{args.steps}]: compile {ct_s:6.1f}s "
              f"run {ms_s:8.2f} ms ({ms_s/args.steps:6.2f} ms/step)")


if __name__ == "__main__":
    main()
