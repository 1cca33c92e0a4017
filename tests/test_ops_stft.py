"""Golden tests for the STFT/ISTFT kernels against independent numpy
references implementing librosa's documented semantics (librosa itself is not
installed in this image; the numpy reference below follows
librosa.stft/istft docs: centered reflect padding, periodic Hann,
squared-window-normalized overlap-add)."""

import numpy as np
import pytest

from move2hear_tpu.ops import (
    HOP_LENGTH,
    N_FFT,
    N_FREQ,
    hann_window,
    istft,
    num_frames,
    stft,
    stft_mag_phase,
)


def np_hann(n):
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def np_stft(y, n_fft=N_FFT, hop=HOP_LENGTH):
    """Reference numpy STFT mirroring librosa.stft(center=True, 'hann')."""
    pad = n_fft // 2
    y = np.pad(y, pad, mode="reflect")
    win = np_hann(n_fft)
    n = 1 + (len(y) - n_fft) // hop
    cols = []
    for i in range(n):
        fr = y[i * hop : i * hop + n_fft] * win
        cols.append(np.fft.rfft(fr, n=n_fft))
    return np.stack(cols, axis=1)  # (n_freq, n_frames)


def np_istft(S, n_fft=N_FFT, hop=HOP_LENGTH, length=16000):
    """Reference numpy ISTFT mirroring librosa.istft."""
    win = np_hann(n_fft)
    n_frames = S.shape[1]
    out_len = n_fft + hop * (n_frames - 1)
    sig = np.zeros(out_len)
    env = np.zeros(out_len)
    for i in range(n_frames):
        fr = np.fft.irfft(S[:, i], n=n_fft) * win
        sig[i * hop : i * hop + n_fft] += fr
        env[i * hop : i * hop + n_fft] += win**2
    nz = env > np.finfo(np.float32).tiny
    sig[nz] /= env[nz]
    sig = sig[n_fft // 2 :]
    return sig[:length]


def test_hann_window_periodic():
    w = np.asarray(hann_window(8))
    expected = 0.5 * (1 - np.cos(2 * np.pi * np.arange(8) / 8))
    np.testing.assert_allclose(w, expected, atol=1e-7)


def test_num_frames_16000():
    # 16 kHz 1-second signal -> the canonical 512x32 spectrogram
    assert num_frames(16000) == 32
    assert N_FREQ == 512


def test_stft_matches_numpy_reference(rng):
    y = rng.standard_normal(16000).astype(np.float32)
    ours = np.asarray(stft(y))
    ref = np_stft(y)
    assert ours.shape == (512, 32)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_stft_batched_matches_single(rng):
    y = rng.standard_normal((3, 2, 16000)).astype(np.float32)
    batched = np.asarray(stft(y))
    for i in range(3):
        for c in range(2):
            single = np.asarray(stft(y[i, c]))
            np.testing.assert_allclose(batched[i, c], single, atol=1e-5)


def test_magphase(rng):
    y = rng.standard_normal(16000).astype(np.float32)
    mag, phase = stft_mag_phase(y)
    S = np.asarray(stft(y))
    np.testing.assert_allclose(np.asarray(mag), np.abs(S), atol=1e-5)
    np.testing.assert_allclose(np.asarray(phase), np.angle(S), atol=1e-4)


def test_istft_matches_numpy_reference(rng):
    y = rng.standard_normal(16000).astype(np.float32)
    S = np_stft(y)
    ours = np.asarray(istft(S, length=16000))
    ref = np_istft(S, length=16000)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_stft_istft_roundtrip(rng):
    y = rng.standard_normal(16000).astype(np.float32)
    S = stft(y)
    y2 = np.asarray(istft(S, length=16000))
    # perfect reconstruction away from the edges (COLA for hop=n_fft//2 holds
    # approximately; hop 512 of 1023 is not exactly COLA, so modest tolerance)
    err = np.abs(y2[1024:-1024] - y[1024:-1024])
    assert err.max() < 5e-3


def test_istft_mag_phase_reconstruction(rng):
    """The eval-metrics path: istft(mag * exp(1j*phase)) ~ signal
    (``common/eval_metrics.py:242-243``)."""
    y = rng.standard_normal(16000).astype(np.float32)
    mag, phase = stft_mag_phase(y)
    S = np.asarray(mag) * np.exp(1j * np.asarray(phase))
    y2 = np.asarray(istft(S, length=16000))
    ref = np_istft(np_stft(y), length=16000)
    np.testing.assert_allclose(y2, ref, atol=5e-3)
