"""The fused TPU binaural audio frontend.

Replaces the reference's per-env host-CPU audio rendering
(``habitat_audio/simulator_train.py:386-486``) with one batched, jitted device
computation: for every env and every source,

    binaural = fftconvolve(mono_raw, rir, mode='same')        # per ear
    binaural = round->int16->float32 / 32768                  # quantize
    per-source binaural STFT -> (mag, phase)                  # gt bin comps
    mono STFT of mono_raw/32768 -> (mag [L2-renormed], phase) # gt mono comps
    mixture = mean_s(binaural) -> STFT -> log1p(mag), phase   # sensor inputs

The intermediate float16 casts of the reference (simulator_train.py:441,467,
483-484 store spectrograms as float16 before log1p / sensor reads) are
reproduced so loss curves match bit-for-bit at fp16 resolution.

This is the dominant cost of the reference's training loop (host FFTs in every
env worker); here it is a single MXU/VPU-friendly batch per rollout step.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from move2hear_tpu.ops.convolve import fftconvolve_same
from move2hear_tpu.ops.spec import l2_norm_scale, quantize_int16
from move2hear_tpu.ops.stft import HOP_LENGTH, N_FFT, stft


class RenderedAudio(NamedTuple):
    """Per-step audio sensor bundle (shapes for B envs, S sources, F=512, T=32).

    Field layouts match the reference sensors (``habitat_audio/task.py:60-176``):
      mixed_bin_audio_mag:   (B, F, T, 2)  log1p magnitude
      mixed_bin_audio_phase: (B, F, T, 2)
      gt_bin_comps:          (B, F, T, 4*S) per source [mag_l, ph_l, mag_r, ph_r]
      gt_mono_comps:         (B, F, T, 2*S) per source [mag, phase]
    """

    mixed_bin_audio_mag: jnp.ndarray
    mixed_bin_audio_phase: jnp.ndarray
    gt_bin_comps: jnp.ndarray
    gt_mono_comps: jnp.ndarray


def _f16(x: jnp.ndarray, enabled: bool) -> jnp.ndarray:
    return x.astype(jnp.float16).astype(jnp.float32) if enabled else x


def _bin_and_mix(conv: jnp.ndarray, cast_f16: bool, mags_only: bool = False):
    """Per-source binaural spectrograms + mixture spectrogram from the
    quantized convolved waves conv (B, S, 2, L).

    The mixture spectrogram is the mean of the per-source complex
    spectrograms (the STFT is linear, so this equals the STFT of the mean
    waveform up to f32 summation order — invisible under the f16 cast that
    follows), saving a third of the framing + DFT-matmul work vs a third
    STFT over the mixed waveform.

    mags_only: phase channels are emitted as ZEROS and the atan2 (angle)
    computation disappears from the program entirely. Training-path
    consumers only use phases through stft_l2_distance, where both sides
    carry the SAME phase — there cos^2+sin^2 == 1 makes the result
    mathematically independent of the phase value, so zero phases give
    equal results while XLA DCEs every transcendental (eval paths, which
    ISTFT with the GT phase, keep mags_only=False)."""
    b, s = conv.shape[0], conv.shape[1]
    bin_spec = stft(conv, n_fft=N_FFT, hop_length=HOP_LENGTH)  # (B,S,2,F,T)
    bin_mag = _f16(jnp.abs(bin_spec), cast_f16)
    bin_phase = (
        jnp.zeros_like(bin_mag)
        if mags_only
        else _f16(jnp.angle(bin_spec), cast_f16)
    )
    comps = jnp.stack(
        [bin_mag[:, :, 0], bin_phase[:, :, 0], bin_mag[:, :, 1], bin_phase[:, :, 1]],
        axis=-1,
    )  # (B, S, F, T, 4)
    f, t = comps.shape[2], comps.shape[3]
    gt_bin_comps = jnp.moveaxis(comps, 1, -2).reshape(b, f, t, 4 * s)

    mix_spec = jnp.mean(bin_spec, axis=1)  # (B, 2, F, T)
    mix_mag = _f16(jnp.abs(mix_spec), cast_f16)
    mix_phase = (
        jnp.zeros_like(mix_mag)
        if mags_only
        else _f16(jnp.angle(mix_spec), cast_f16)
    )
    mixed_bin_audio_mag = jnp.log1p(jnp.moveaxis(mix_mag, 1, -1))  # (B, F, T, 2)
    mixed_bin_audio_phase = jnp.moveaxis(mix_phase, 1, -1)
    return mixed_bin_audio_mag, mixed_bin_audio_phase, gt_bin_comps


@partial(
    jax.jit, static_argnames=("gt_mono_mag_norm", "cast_f16", "mags_only")
)
def render_binaural_mixture(
    mono_wavs: jnp.ndarray,
    rirs: jnp.ndarray,
    gt_mono_mag_norm: float = 0.0,
    cast_f16: bool = True,
    mags_only: bool = False,
) -> RenderedAudio:
    """Render the mixed-binaural observation and GT components for a batch.

    Args:
        mono_wavs: (B, S, L) raw int16-scale mono waveforms (as read from wav).
        rirs: (B, S, R, 2) binaural room impulse responses (zero-padded to a
            static length R; zero RIRs reproduce the reference's unreadable-RIR
            fallback, ``simulator_train.py:407-415``).
        gt_mono_mag_norm: GT_MONO_MAG_NORM config — L2 renorm target for the
            GT mono magnitude (0.0 disables).
        cast_f16: reproduce the reference's float16 spectrogram storage.

    Returns:
        RenderedAudio with B leading batch dim.
    """
    mono_wavs = jnp.asarray(mono_wavs, jnp.float32)
    rirs = jnp.asarray(rirs, jnp.float32)
    b, s, _ = mono_wavs.shape

    # (B, S, 2, L): convolve each ear. fftconvolve_same broadcasts batch axes.
    conv = fftconvolve_same(
        mono_wavs[:, :, None, :], jnp.moveaxis(rirs, -1, -2)
    )
    conv = quantize_int16(conv)
    mixed_bin_audio_mag, mixed_bin_audio_phase, gt_bin_comps = _bin_and_mix(
        conv, cast_f16, mags_only=mags_only
    )

    # GT mono spectrograms from the raw (unconvolved) waveforms.
    mono_scaled = mono_wavs * (1.0 / 32768.0)
    mono_spec = stft(mono_scaled, n_fft=N_FFT, hop_length=HOP_LENGTH)
    mono_mag = jnp.abs(mono_spec)
    mono_mag = l2_norm_scale(mono_mag, gt_mono_mag_norm)
    mono_mag = _f16(mono_mag, cast_f16)
    mono_phase = (
        jnp.zeros_like(mono_mag)
        if mags_only
        else _f16(jnp.angle(mono_spec), cast_f16)
    )
    mcomps = jnp.stack([mono_mag, mono_phase], axis=-1)  # (B, S, F, T, 2)
    f, t = mcomps.shape[2], mcomps.shape[3]
    gt_mono_comps = jnp.moveaxis(mcomps, 1, -2).reshape(b, f, t, 2 * s)

    return RenderedAudio(
        mixed_bin_audio_mag=mixed_bin_audio_mag,
        mixed_bin_audio_phase=mixed_bin_audio_phase,
        gt_bin_comps=gt_bin_comps,
        gt_mono_comps=gt_mono_comps,
    )


@partial(
    jax.jit,
    static_argnames=(
        "mono_len", "gt_mono_mag_norm", "cast_f16", "rir_len", "mags_only"
    ),
)
def render_binaural_mixture_pre(
    mono_rfft: jnp.ndarray,
    rirs: jnp.ndarray,
    gt_mono_raw: jnp.ndarray,
    mono_len: int,
    gt_mono_mag_norm: float = 0.0,
    cast_f16: bool = True,
    rir_rfft: jnp.ndarray = None,
    rir_len: int = 0,
    mags_only: bool = False,
) -> RenderedAudio:
    """render_binaural_mixture consuming PRECOMPUTED per-sound tensors.

    The mono-wav forward FFTs and the GT mono spectrograms depend only on the
    sound bank — static for a whole training run — so the device env
    precomputes them once (env/device_env.py:build_wav_rfft_bank /
    build_gt_mono_bank) and each step pays only the RIR FFTs + inverse FFTs
    + binaural/mixture STFTs. Measured: the render was ~3/4 of the collect
    scan's device time; this removes ~40%% of its FFT work.

    Args:
        mono_rfft: (B, S, NF, 2) real/imag of rfft(mono, n=nfft) where
            nfft = fast_circular_len(mono_len, R) (ops/convolve.py; stored as
            floats — complex64 transfers are unimplemented on some runtimes).
        rirs: (B, S, R, 2) binaural RIRs.
        gt_mono_raw: (B, S, F, T, 2): [..., 0] = raw (un-normed, f32) mono
            STFT magnitude, [..., 1] = mono phase (already f16-cast).
        mono_len: original mono length L (the "same"-mode output length).
        rir_rfft: optional (B, S, NF, 2 ears, 2 re/im) precomputed RIR rffts
            (TPU.PRECOMPUTE_RIR_RFFT; build_rir_rfft_bank) — removes the last
            per-step forward FFTs at ~2x the RIR bank's HBM. `rir_len` (the
            time-domain R) is then required for the "same" slice.
    """
    nfft = 2 * (mono_rfft.shape[-2] - 1)
    if rir_rfft is not None:
        b, s = rir_rfft.shape[0], rir_rfft.shape[1]
        r = rir_len
        h = jnp.moveaxis(
            jax.lax.complex(rir_rfft[..., 0], rir_rfft[..., 1]), -1, -2
        )  # (B, S, 2, NF)
    else:
        rirs = jnp.asarray(rirs, jnp.float32)
        b, s = rirs.shape[0], rirs.shape[1]
        r = rirs.shape[2]
        h = jnp.fft.rfft(
            jnp.moveaxis(rirs, -1, -2), n=nfft, axis=-1
        )  # (B, S, 2, NF)
    mf = jax.lax.complex(mono_rfft[..., 0], mono_rfft[..., 1])[:, :, None, :]
    full = jnp.fft.irfft(mf * h, n=nfft, axis=-1)
    # circular conv at nfft >= mono_len + r - 1 - start keeps the "same"
    # window [start, start + mono_len) alias-free (ops/convolve.py docstring);
    # full pow2 lengths satisfy the same bound, so both bank layouts work.
    start = (r - 1) // 2
    conv = jax.lax.dynamic_slice_in_dim(full, start, mono_len, axis=-1)
    conv = quantize_int16(conv)
    mixed_bin_audio_mag, mixed_bin_audio_phase, gt_bin_comps = _bin_and_mix(
        conv, cast_f16, mags_only=mags_only
    )

    mono_mag = _f16(
        l2_norm_scale(gt_mono_raw[..., 0], gt_mono_mag_norm), cast_f16
    )
    mono_phase = (
        jnp.zeros_like(mono_mag) if mags_only else gt_mono_raw[..., 1]
    )
    mcomps = jnp.stack([mono_mag, mono_phase], axis=-1)
    f, t = mcomps.shape[2], mcomps.shape[3]
    gt_mono_comps = jnp.moveaxis(mcomps, 1, -2).reshape(b, f, t, 2 * s)

    return RenderedAudio(
        mixed_bin_audio_mag=mixed_bin_audio_mag,
        mixed_bin_audio_phase=mixed_bin_audio_phase,
        gt_bin_comps=gt_bin_comps,
        gt_mono_comps=gt_mono_comps,
    )
