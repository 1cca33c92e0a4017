"""On-device (real TPU chip) accuracy + speed check for the DFT-matmul STFT.

The CPU test suite can't see TPU matmul precision semantics: on TPU,
Precision.DEFAULT would run the f32 DFT dots as single-pass bf16 multiplies
(ADVICE r3, medium). This probe runs on whatever the default platform is
(the axon TPU plugin on this rig) and compares the production `stft` against
jnp.fft.rfft computed on the same device, reporting max abs/rel error and
per-call wall time. Run: python scripts/ondevice_stft_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from move2hear_tpu.ops.stft import N_FFT, HOP_LENGTH, hann_window, stft


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}")
    rng = np.random.default_rng(0)
    # bench-shaped batch: 14 envs x 2 sources x 2 ears, ~1 s at 16 kHz
    x = rng.standard_normal((14, 4, 16384)).astype(np.float32)
    xd = jax.device_put(x)

    got = jax.jit(stft)(xd)
    got.block_until_ready()

    # oracle: frame exactly as production does, then jnp.fft.rfft on-device
    @jax.jit
    def oracle(x):
        pad = N_FFT // 2
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
        n = 1 + (xp.shape[-1] - N_FFT) // HOP_LENGTH
        idx = (
            np.arange(n)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
        )
        frames = xp[..., idx] * hann_window(N_FFT)
        return jnp.swapaxes(jnp.fft.rfft(frames, axis=-1), -1, -2)

    ref = oracle(xd)
    ref.block_until_ready()

    # complex64 device->host transfer is unimplemented on this runtime;
    # pull real/imag as separate f32 planes
    split = jax.jit(lambda z: (jnp.real(z), jnp.imag(z)))
    g = np.asarray(split(got)[0]) + 1j * np.asarray(split(got)[1])
    r = np.asarray(split(ref)[0]) + 1j * np.asarray(split(ref)[1])
    scale = np.abs(r).max()
    abs_err = np.abs(g - r).max()
    print(f"max_abs_err={abs_err:.3e}  spec_scale={scale:.3e}  "
          f"rel={abs_err / scale:.3e}")

    for name, fn in (("dft_matmul_stft", jax.jit(stft)), ("xla_fft", oracle)):
        fn(xd).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(xd)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt * 1e3:.2f} ms/call")

    assert abs_err / scale < 5e-5, "DFT-matmul STFT deviates from FFT on-device"
    print("OK")


if __name__ == "__main__":
    main()
