"""Batched STFT / ISTFT kernels for TPU.

Implements the exact spectral frontend used by the reference
(``habitat_audio/simulator_train.py:426-447`` and
``audio_separation/pretrain/datasets/dataset.py:190-207``): librosa-semantics
STFT with ``n_fft=1023``, ``hop_length=512``, a periodic Hann window,
``center=True`` reflect padding — producing 512 frequency bins (a power of
two, which is why the reference picked the odd n_fft; it also happens to be
the TPU-friendly lane width x4).

Everything here is pure jax.numpy: batched rfft/irfft map onto XLA's TPU FFT,
framing is a single strided gather that XLA fuses with the window multiply.
Shapes are static; all functions are jit-compatible and vmap-friendly.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 1023
HOP_LENGTH = 512
N_FREQ = N_FFT // 2 + 1  # = 512


@lru_cache(maxsize=4)
def _dft_mats(n: int):
    """Real-DFT cosine/sine matrices (n, n//2+1), f32.

    The k*j products are reduced mod n BEFORE the angle multiply so the
    cos/sin arguments stay in [0, 2pi) — without the reduction, f64 rounding
    of angles up to ~2pi*n/2*n wrecks several digits."""
    nb = n // 2 + 1
    kj = np.outer(np.arange(n), np.arange(nb)) % n
    ang = -2.0 * np.pi * kj.astype(np.float64) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _rfft_matmul(frames: jnp.ndarray, n: int) -> jnp.ndarray:
    """rfft of (..., n) real frames as one MXU matmul per component.

    XLA's TPU FFT for non-power-of-two lengths lowers to a windowed
    convolution emitter: for the n_fft=1023 (= 3*11*31) binaural STFT it
    measured ~23% of the entire collect scan step. The explicit
    (M, n) @ (n, n//2+1) DFT matmuls are ~6x faster at these frame counts
    and keep full f32 accuracy (angle-reduced matrices).

    Precision: TPU Precision.DEFAULT would run the f32 dot as a single
    bf16 multiply pass (preferred_element_type only pins the accumulator),
    silently degrading the spectrograms that feed observations and eval
    metrics (measured 2e-3 relative error on-chip). Precision.HIGH (3-pass
    bf16) measures 1e-5 relative vs an f64 oracle at the SAME wall time as
    DEFAULT (the extra passes hide under the HBM-bound load), while HIGHEST
    (6-pass) costs +33%; scripts/ondevice_stft_check.py is the on-device
    accuracy + speed check against the FFT."""
    cos_m, sin_m = _dft_mats(n)
    # M2H_STFT_PRECISION={default,high,highest}: perf-bisect knob only —
    # production stays HIGH (see docstring); used to A/B the r3->r4
    # regression candidates on one host (docs/ROUND5_NOTES.md)
    import os as _os

    hi = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[_os.environ.get("M2H_STFT_PRECISION", "high")]
    re = jnp.dot(
        frames, jnp.asarray(cos_m),
        precision=hi, preferred_element_type=jnp.float32,
    )
    im = jnp.dot(
        frames, jnp.asarray(sin_m),
        precision=hi, preferred_element_type=jnp.float32,
    )
    return jax.lax.complex(re, im)


def _np_hann(n_fft: int) -> np.ndarray:
    n = np.arange(n_fft)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))


def hann_window(n_fft: int = N_FFT, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic ("fftbins") Hann window, identical to
    ``scipy.signal.get_window('hann', n_fft, fftbins=True)`` that librosa uses.
    """
    return jnp.asarray(_np_hann(n_fft), dtype=dtype)


def num_frames(length: int, n_fft: int = N_FFT, hop_length: int = HOP_LENGTH) -> int:
    """Number of STFT frames for a centered STFT of a `length`-sample signal."""
    padded = length + 2 * (n_fft // 2)
    return 1 + (padded - n_fft) // hop_length


def _frame(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Frame the last axis of `x` into overlapping windows.

    x: (..., L_padded) -> (..., n_frames, n_fft)

    Built from ceil(n_fft/hop) shifted contiguous slices reshaped to
    (n_frames, hop) and concatenated along the window axis — frame i,
    sample j*hop+m of view j is x[i*hop + j*hop + m]. Pure slices +
    reshapes + one concat: on TPU this lowers to plain copies, where the
    equivalent advanced-index gather (n_frames*n_fft indices) was measured
    ~20x off memcpy speed and forced layout copies around it (the framing
    gather was ~half the collect-scan's device time at the bench shapes).
    """
    length = x.shape[-1]
    n = 1 + (length - n_fft) // hop_length
    k = -(-n_fft // hop_length)  # shifted views per frame
    need = hop_length * (n - 1) + k * hop_length
    if need > length:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, need - length)]
        x = jnp.pad(x, pad)
    views = [
        x[..., j * hop_length : j * hop_length + n * hop_length].reshape(
            x.shape[:-1] + (n, hop_length)
        )
        for j in range(k)
    ]
    return jnp.concatenate(views, axis=-1)[..., :n_fft]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def stft(
    x: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    center: bool = True,
) -> jnp.ndarray:
    """Centered STFT with librosa semantics.

    Args:
        x: real signal(s), shape (..., L).
    Returns:
        complex spectrogram, shape (..., n_freq, n_frames) matching
        ``librosa.stft`` layout (frequency-major).
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    if center:
        pad = n_fft // 2
        pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_width, mode="reflect")
    frames = _frame(x, n_fft, hop_length)  # (..., n_frames, n_fft)
    frames = frames * hann_window(n_fft)
    if n_fft & (n_fft - 1):
        spec = _rfft_matmul(frames, n_fft)  # non-pow2: DFT matmul (see above)
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (..., n_freq, n_frames)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def stft_mag_phase(
    x: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    center: bool = True,
):
    """Magnitude + phase-angle of the centered STFT.

    Equivalent to ``librosa.magphase(librosa.stft(x)); phase = np.angle(...)``
    as used at ``habitat_audio/simulator_train.py:426-435``.
    """
    spec = stft(x, n_fft=n_fft, hop_length=hop_length, center=center)
    return jnp.abs(spec), jnp.angle(spec)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "length", "center"))
def istft_mag_phase(
    mag: jnp.ndarray,
    phase: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    length: int = 16000,
    center: bool = True,
) -> jnp.ndarray:
    """ISTFT from real magnitude/phase arrays.

    This is the TPU-safe entry point: the complex spectrum is assembled
    on-device with ``lax.complex`` so no complex literals or host<->device
    complex transfers are needed (the axon TPU runtime does not implement
    complex buffer transfers). Mirrors the eval path
    ``mag * exp(1j * phase) -> librosa.istft`` (common/eval_metrics.py:242-251).
    """
    spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
    return istft(spec, n_fft=n_fft, hop_length=hop_length, length=length, center=center)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "length", "center"))
def istft(
    spec: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    length: int = 16000,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT with librosa semantics (windowed overlap-add with
    squared-window normalization), mirroring ``librosa.istft`` as used by
    ``audio_separation/common/eval_metrics.py:232-251``.

    Args:
        spec: complex spectrogram (..., n_freq, n_frames).
    Returns:
        real signal (..., length).
    """
    spec = jnp.swapaxes(spec, -1, -2)  # (..., n_frames, n_freq)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (..., n_frames, n_fft)
    win = hann_window(n_fft)
    frames = frames * win

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    # Overlap-add via shifted hop-chunks: pad each frame to k*hop, split into
    # k hop-sized chunks, and sum the k chunk-grids at offsets 0..k-1 — the
    # dual of _frame's gather-free framing. Static pads + adds instead of a
    # scatter (TPU scatters serialize; this is a handful of vector adds).
    k = -(-n_fft // hop_length)
    nd = frames.ndim
    fr = jnp.pad(
        frames, [(0, 0)] * (nd - 1) + [(0, k * hop_length - n_fft)]
    ).reshape(frames.shape[:-1] + (k, hop_length))
    parts = [
        jnp.pad(
            fr[..., j, :],
            [(0, 0)] * (nd - 2) + [(j, k - 1 - j), (0, 0)],
        )
        for j in range(k)
    ]
    chunks = parts[0]
    for p in parts[1:]:
        chunks = chunks + p  # (..., n_frames + k - 1, hop)
    sig = chunks.reshape(frames.shape[:-2] + ((n_frames + k - 1) * hop_length,))
    sig = sig[..., :out_len]

    # squared-window normalization envelope (static, built in numpy so it is
    # a compile-time constant even under jit tracing)
    wsq = _np_hann(n_fft) ** 2
    env = np.zeros(out_len)
    for s in np.arange(n_frames) * hop_length:
        env[s : s + n_fft] += wsq
    tiny = np.finfo(np.float32).tiny
    env = np.where(env > tiny, env, 1.0)
    sig = sig / jnp.asarray(env, dtype=sig.dtype)

    if center:
        sig = sig[..., n_fft // 2 :]
    return sig[..., :length]
