"""Spectrogram helper ops: 16-way frequency slicing, mask application,
int16 waveform quantization, L2 magnitude normalization.

These mirror the reference's numerical chain exactly:
  - slice16/deslice16: ``rl/models/separator_cnn.py:87-89,163-165`` — 512x32
    spectrograms are split into 16 frequency chunks stacked on channels so the
    U-Nets see 32x32 images (new channel index = c*16 + chunk).
  - masked_mix / apply_mask_log1p: ``rl/models/separator_cnn.py:73-79`` and
    ``rl/models/audio_cnn.py:124-128`` — ``log1p(clamp(mask*(exp(mix)-1), 0))``.
  - quantize_int16: ``habitat_audio/simulator_train.py:421-423`` — round to
    int16 (with wraparound cast semantics) then scale to [-1, 1].
  - l2_norm_scale: ``habitat_audio/simulator_train.py:451-456`` — GT mono
    magnitude renormalized so its RMS equals GT_MONO_MAG_NORM.

All tensors use the reference's sensor layout (..., F=512, T=32, C) which is
already NHWC, the TPU-native convolution layout.
"""

import jax.numpy as jnp

SLICE_FACTOR = 16


def slice16(x: jnp.ndarray, slice_factor: int = SLICE_FACTOR) -> jnp.ndarray:
    """(..., F, T, C) -> (..., F/k, T, C*k) with out-channel = c*k + chunk.

    chunk j covers frequency rows [j*F/k, (j+1)*F/k).
    """
    *lead, f, t, c = x.shape
    k = slice_factor
    x = x.reshape(*lead, k, f // k, t, c)  # (..., chunk, f', t, c)
    # target channel order: c*k + chunk  -> bring c before chunk
    x = jnp.moveaxis(x, -4, -1)  # (..., f', t, c, chunk)
    return x.reshape(*lead, f // k, t, c * k)


def deslice16(x: jnp.ndarray, slice_factor: int = SLICE_FACTOR) -> jnp.ndarray:
    """Inverse of :func:`slice16`: (..., F/k, T, C*k) -> (..., F, T, C)."""
    *lead, fp, t, ck = x.shape
    k = slice_factor
    c = ck // k
    x = x.reshape(*lead, fp, t, c, k)
    x = jnp.moveaxis(x, -1, -4)  # (..., chunk, f', t, c)
    return x.reshape(*lead, k * fp, t, c)


def masked_mix(mixed_log_mag: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """``mask * (exp(mix) - 1)`` — reconstructed masked linear magnitude.

    `mixed_log_mag` is the log1p magnitude sensor reading; `mask` the predicted
    ratio mask. (``rl/ppo/ppo.py:222``, ``common/eval_metrics.py:323-324``.)
    """
    return jnp.expm1(mixed_log_mag) * mask


def apply_mask_log1p(mixed_log_mag: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """``log1p(clamp(mask * (exp(mix) - 1), min=0))`` — the bin2mono encoder
    and bin AudioCNN input transform (``separator_cnn.py:73-79``)."""
    return jnp.log1p(jnp.clip(masked_mix(mixed_log_mag, mask), min=0))


def quantize_int16(x: jnp.ndarray) -> jnp.ndarray:
    """Round to nearest-even int16 (with numpy's wraparound cast) and rescale
    to [-1, 1): ``np.round(x).astype('int16').astype('float32') / 32768``.

    numpy's float->int16 cast wraps modulo 2**16; XLA's saturates, so the wrap
    is made explicit here for bit parity with the reference rendering chain.
    """
    r = jnp.round(x).astype(jnp.int32)
    wrapped = ((r + 32768) % 65536) - 32768
    return wrapped.astype(jnp.float32) * (1.0 / 32768.0)


def l2_norm_scale(mag: jnp.ndarray, target_norm: float) -> jnp.ndarray:
    """Scale magnitude so RMS over all bins equals `target_norm`; identity when
    the RMS is zero or `target_norm` == 0 (``simulator_train.py:451-456``)."""
    if target_norm == 0.0:
        return mag
    rms = jnp.sqrt(jnp.mean(jnp.square(mag), axis=(-2, -1), keepdims=True))
    scale = jnp.where(rms > 0.0, target_norm / jnp.where(rms > 0.0, rms, 1.0), 1.0)
    return mag * scale
