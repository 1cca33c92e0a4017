"""End-to-end golden test for the fused TPU audio frontend against a pure
numpy/scipy re-implementation of the reference rendering chain
(``habitat_audio/simulator_train.py:386-486``)."""

import numpy as np
from scipy.signal import fftconvolve

from move2hear_tpu.ops import render_binaural_mixture


def np_hann(n):
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def np_stft_mag_phase(y, n_fft=1023, hop=512):
    pad = n_fft // 2
    y = np.pad(y, pad, mode="reflect")
    win = np_hann(n_fft)
    n = 1 + (len(y) - n_fft) // hop
    cols = [np.fft.rfft(y[i * hop : i * hop + n_fft] * win, n=n_fft) for i in range(n)]
    S = np.stack(cols, axis=1)
    return np.abs(S), np.angle(S)


def reference_render(mono_wavs, rirs, gt_mono_mag_norm):
    """Numpy mirror of get_current_mixed_bin_audio_mag_spec for one env."""
    S = mono_wavs.shape[0]
    gt_bin, gt_mono = [], []
    mixed = 0.0
    for s in range(S):
        conv = []
        for ch in range(2):
            conv.append(fftconvolve(mono_wavs[s], rirs[s, :, ch], mode="same"))
        conv = np.array(conv)
        conv = np.round(conv).astype("int16").astype("float32") * (1 / 32768)

        mag_l, ph_l = np_stft_mag_phase(conv[0])
        mag_r, ph_r = np_stft_mag_phase(conv[1])
        gt_bin.append(np.stack([mag_l, ph_l, mag_r, ph_r], axis=-1).astype(np.float16))

        mono = mono_wavs[s].astype("float32") / 32768
        m_mag, m_ph = np_stft_mag_phase(mono)
        if gt_mono_mag_norm != 0.0:
            rms = np.sqrt(np.mean(m_mag**2))
            if rms != 0.0:
                m_mag = m_mag * gt_mono_mag_norm / rms
        gt_mono.append(np.stack([m_mag, m_ph], axis=-1).astype(np.float16))

        mixed = mixed + conv
    mixed = mixed / S
    mx_mag_l, mx_ph_l = np_stft_mag_phase(mixed[0])
    mx_mag_r, mx_ph_r = np_stft_mag_phase(mixed[1])
    mixed_mag = np.stack([mx_mag_l, mx_mag_r], axis=-1).astype(np.float16)
    mixed_phase = np.stack([mx_ph_l, mx_ph_r], axis=-1).astype(np.float16)
    return (
        np.log1p(mixed_mag),
        mixed_phase,
        np.concatenate(gt_bin, axis=2),
        np.concatenate(gt_mono, axis=2),
    )


def test_frontend_matches_reference_chain(rng):
    B, S, L, R = 2, 2, 16000, 3000
    mono = (rng.standard_normal((B, S, L)) * 8000).astype(np.float32)
    rirs = (rng.standard_normal((B, S, R, 2)) * 0.05).astype(np.float32)

    out = render_binaural_mixture(mono, rirs, gt_mono_mag_norm=1.2)

    for b in range(B):
        ref_mag, ref_phase, ref_bin, ref_mono = reference_render(mono[b], rirs[b], 1.2)
        assert np.asarray(out.mixed_bin_audio_mag)[b].shape == ref_mag.shape
        # rtol covers float16 rounding-boundary flips at large magnitudes
        np.testing.assert_allclose(
            np.asarray(out.mixed_bin_audio_mag)[b], ref_mag, atol=2e-3, rtol=2e-3
        )
        np.testing.assert_allclose(np.asarray(out.gt_bin_comps)[b, ..., 0::2],
                                   ref_bin[..., 0::2], atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(out.gt_mono_comps)[b, ..., 0::2],
                                   ref_mono[..., 0::2], atol=5e-3, rtol=2e-3)
        # Phases only need to agree where magnitude is non-negligible.
        mag = ref_bin[..., 0::2]
        ph_err = np.abs(np.asarray(out.gt_bin_comps)[b, ..., 1::2] - ref_bin[..., 1::2])
        assert np.median(ph_err[mag > 1e-2]) < 1e-2


def test_frontend_shapes_single_source(rng):
    out = render_binaural_mixture(
        (rng.standard_normal((1, 1, 16000)) * 1000).astype(np.float32),
        (rng.standard_normal((1, 1, 500, 2)) * 0.1).astype(np.float32),
    )
    assert np.asarray(out.mixed_bin_audio_mag).shape == (1, 512, 32, 2)
    assert np.asarray(out.gt_bin_comps).shape == (1, 512, 32, 4)
    assert np.asarray(out.gt_mono_comps).shape == (1, 512, 32, 2)


def test_precomputed_render_matches_plain(rng):
    """render_binaural_mixture_pre (static per-sound rffts + GT mono specs)
    must reproduce render_binaural_mixture. The only tolerated difference is
    an occasional off-by-one int16 quantization flip when a convolution
    sample lands exactly on a rounding boundary (1/32768-scale spectral
    wobble)."""
    import jax.numpy as jnp

    from move2hear_tpu.env.device_env import (
        build_gt_mono_bank,
        build_wav_rfft_bank,
    )
    from move2hear_tpu.ops.frontend import (
        render_binaural_mixture,
        render_binaural_mixture_pre,
    )

    n_sounds, L, R = 5, 4000, 700
    bank = (rng.standard_normal((n_sounds, L)) * 6000).astype(np.float32)
    rfft_bank = build_wav_rfft_bank(jnp.asarray(bank), R)
    gt_bank = build_gt_mono_bank(jnp.asarray(bank))

    b, s = 3, 2
    ids = rng.integers(0, n_sounds, (b, s))
    rirs = (rng.standard_normal((b, s, R, 2)) * 0.05).astype(np.float32)

    ref = render_binaural_mixture(
        jnp.asarray(bank[ids]), jnp.asarray(rirs), gt_mono_mag_norm=1.2
    )
    out = render_binaural_mixture_pre(
        rfft_bank[jnp.asarray(ids)], jnp.asarray(rirs),
        gt_bank[jnp.asarray(ids)], L, gt_mono_mag_norm=1.2,
    )
    for name in ref._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            atol=2e-3, rtol=1e-3, err_msg=name,
        )
    # GT mono comps are built from the same cached values -> exact
    np.testing.assert_array_equal(
        np.asarray(out.gt_mono_comps), np.asarray(ref.gt_mono_comps)
    )


def test_precomputed_render_with_rir_rfft_matches_plain(rng):
    """Full precompute (mono + RIR rffts + GT mono) == plain render."""
    import jax.numpy as jnp

    from move2hear_tpu.env.device_env import (
        build_gt_mono_bank,
        build_rir_rfft_bank,
        build_wav_rfft_bank,
    )
    from move2hear_tpu.ops.frontend import (
        render_binaural_mixture,
        render_binaural_mixture_pre,
    )

    n_sounds, L, R, V = 4, 3000, 500, 3
    bank = (rng.standard_normal((n_sounds, L)) * 6000).astype(np.float32)
    rir_bank = (rng.standard_normal((4, V, V, R, 2)) * 0.05).astype(np.float32)
    rfft_bank = build_wav_rfft_bank(jnp.asarray(bank), R)
    gt_bank = build_gt_mono_bank(jnp.asarray(bank))
    rir_f_bank = build_rir_rfft_bank(jnp.asarray(rir_bank), L)

    b, s = 2, 2
    ids = rng.integers(0, n_sounds, (b, s))
    az = rng.integers(0, 4, (b,))
    node = rng.integers(0, V, (b,))
    srcs = rng.integers(0, V, (b, s))
    rirs = rir_bank[az[:, None], node[:, None], srcs]

    ref = render_binaural_mixture(
        jnp.asarray(bank[ids]), jnp.asarray(rirs), gt_mono_mag_norm=1.2
    )
    out = render_binaural_mixture_pre(
        rfft_bank[jnp.asarray(ids)], None, gt_bank[jnp.asarray(ids)], L,
        gt_mono_mag_norm=1.2,
        rir_rfft=rir_f_bank[
            jnp.asarray(az)[:, None], jnp.asarray(node)[:, None],
            jnp.asarray(srcs),
        ],
        rir_len=R,
    )
    for name in ref._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            atol=2e-3, rtol=1e-3, err_msg=name,
        )
