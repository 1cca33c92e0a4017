"""Golden tests: RIR fft-convolution vs scipy, spectrogram helpers vs
independent numpy implementations of the reference math."""

import numpy as np
from scipy.signal import fftconvolve

from move2hear_tpu.ops import (
    SLICE_FACTOR,
    apply_mask_log1p,
    deslice16,
    fftconvolve_same,
    l2_norm_scale,
    masked_mix,
    quantize_int16,
    slice16,
)


def test_fftconvolve_same_matches_scipy(rng):
    x = rng.standard_normal(16000).astype(np.float32) * 1000
    for rir_len in [100, 1023, 4096, 16000]:
        h = rng.standard_normal(rir_len).astype(np.float32)
        ref = fftconvolve(x, h, mode="same")
        ours = np.asarray(fftconvolve_same(x, h))
        np.testing.assert_allclose(ours, ref, atol=2e-2 * np.abs(ref).max() * 1e-3 + 1e-1)


def test_fftconvolve_same_batched(rng):
    x = rng.standard_normal((2, 3, 1, 4000)).astype(np.float32)
    h = rng.standard_normal((2, 3, 2, 900)).astype(np.float32)
    out = np.asarray(fftconvolve_same(x, h))
    assert out.shape == (2, 3, 2, 4000)
    ref = fftconvolve(x[1, 2, 0], h[1, 2, 1], mode="same")
    np.testing.assert_allclose(out[1, 2, 1], ref, atol=1e-2)


def test_fftconvolve_zero_rir(rng):
    """Zero RIR fallback (simulator_train.py:407-415) renders silence."""
    x = rng.standard_normal(16000).astype(np.float32)
    h = np.zeros(16000, np.float32)
    assert np.abs(np.asarray(fftconvolve_same(x, h))).max() == 0.0


def test_quantize_int16(rng):
    x = rng.standard_normal(1000).astype(np.float32) * 20000
    ref = np.round(x).astype("int16").astype("float32") * (1 / 32768)
    np.testing.assert_allclose(np.asarray(quantize_int16(x)), ref, atol=1e-7)


def test_quantize_int16_wraparound():
    # Values beyond int16 range wrap exactly like numpy's cast.
    x = np.array([40000.0, -40000.0, 32767.4, -32768.4], np.float32)
    ref = np.round(x).astype("int16").astype("float32") * (1 / 32768)
    np.testing.assert_allclose(np.asarray(quantize_int16(x)), ref, atol=1e-7)


def test_slice16_roundtrip_and_layout(rng):
    x = rng.standard_normal((2, 512, 32, 2)).astype(np.float32)
    s = np.asarray(slice16(x))
    assert s.shape == (2, 32, 32, 2 * SLICE_FACTOR)
    np.testing.assert_allclose(np.asarray(deslice16(s)), x, atol=0)

    # Layout parity with the torch reference (separator_cnn.py:87-89):
    # BCHW view(B, C, 16, H/16, W).reshape(B, C*16, ...) -> channel = c*16 + k
    xt = np.transpose(x, (0, 3, 1, 2))  # BCHW
    xt = xt.reshape(2, 2, 16, 32, 32).reshape(2, 32, 32, 32)  # (B, C*16, h, w)
    ref = np.transpose(xt, (0, 2, 3, 1))  # back to NHWC
    np.testing.assert_allclose(s, ref, atol=0)


def test_masked_mix_math(rng):
    mix_lin = np.abs(rng.standard_normal((4, 512, 32, 2))).astype(np.float32)
    mix_log = np.log1p(mix_lin)
    mask = rng.uniform(0, 1, (4, 512, 32, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(masked_mix(mix_log, mask)), mix_lin * mask, rtol=1e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(apply_mask_log1p(mix_log, mask)),
        np.log1p(np.clip(mix_lin * mask, 0, None)),
        rtol=1e-4,
        atol=5e-4,
    )


def test_l2_norm_scale(rng):
    mag = np.abs(rng.standard_normal((3, 512, 32))).astype(np.float32)
    out = np.asarray(l2_norm_scale(mag, 1.2))
    rms = np.sqrt(np.mean(out**2, axis=(-2, -1)))
    np.testing.assert_allclose(rms, 1.2, rtol=1e-5)
    # 0.0 disables
    np.testing.assert_allclose(np.asarray(l2_norm_scale(mag, 0.0)), mag)
    # zero input stays zero (no NaN)
    z = np.zeros((512, 32), np.float32)
    assert np.all(np.asarray(l2_norm_scale(z, 1.2)) == 0)
