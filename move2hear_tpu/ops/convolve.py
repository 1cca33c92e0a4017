"""FFT-based linear convolution for binaural RIR rendering.

TPU-native replacement for ``scipy.signal.fftconvolve(mono, rir, mode="same")``
as used by the reference at ``habitat_audio/simulator_train.py:417-419`` and
``audio_separation/pretrain/datasets/dataset.py:178-180``. One batched
rfft·rfft→irfft on device instead of per-env host FFTs.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _next_fast_len(n: int) -> int:
    """Next power of two >= n. XLA's TPU FFT is happiest at powers of two."""
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


@partial(jax.jit, static_argnames=())
def _fftconv_full(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    lx, lh = x.shape[-1], h.shape[-1]
    n = lx + lh - 1
    nfft = _next_fast_len(n)
    X = jnp.fft.rfft(x, n=nfft, axis=-1)
    H = jnp.fft.rfft(h, n=nfft, axis=-1)
    y = jnp.fft.irfft(X * H, n=nfft, axis=-1)
    return y[..., :n]


def fftconvolve_same(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Linear convolution of the last axes, returning the centered `same`-size
    slice, matching ``scipy.signal.fftconvolve(x, h, mode="same")``.

    Broadcasts over leading batch axes. Output length = x.shape[-1].
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    h = jnp.asarray(h, dtype=jnp.float32)
    lx, lh = x.shape[-1], h.shape[-1]
    full = _fftconv_full(x, h)
    # scipy "same": output is the size of in1, centered w.r.t. the full output.
    start = (lh - 1) // 2
    return jax.lax.dynamic_slice_in_dim(full, start, lx, axis=-1)
