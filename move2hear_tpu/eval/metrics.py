"""Spectrogram-level quality metrics (``common/eval_metrics.py:306-366``).

STFT-L2: mean squared distance between complex spectrograms reconstructed
with the GROUND-TRUTH phase — i.e. for predictions only the magnitude is the
model's, the phase is taken from the GT components. Binaural distance is the
sum of left+right mean squared distances; mono is a single channel.
Device-resident and jitted: used per rollout step for logging and as the eval
headline metric.
"""

import jax
import jax.numpy as jnp

from move2hear_tpu.ops.spec import masked_mix


def _real_imag_sqdist(mag_a, phase_a, mag_b, phase_b):
    """Mean over (F*T*2) of squared distance between complex specs given as
    (mag, phase), matching the reference's real/imag concat + mean layout
    (eval_metrics.py:310-343): mean over the flattened [real; imag] vector."""
    dr = mag_a * jnp.cos(phase_a) - mag_b * jnp.cos(phase_b)
    di = mag_a * jnp.sin(phase_a) - mag_b * jnp.sin(phase_b)
    b = mag_a.shape[0]
    stacked = jnp.concatenate(
        [dr.reshape(b, -1), di.reshape(b, -1)], axis=-1
    )
    return jnp.mean(jnp.square(stacked), axis=-1, keepdims=True)  # (B, 1)


@jax.jit
def stft_l2_distance(
    mixed_log_mag: jnp.ndarray,   # (B, F, T, 2)
    pred_binSepMasks: jnp.ndarray,  # (B, F, T, 2)
    gt_bin_comps: jnp.ndarray,    # (B, F, T, 4S) [mag_l, ph_l, mag_r, ph_r]*S
    pred_mono: jnp.ndarray,       # (B, F, T, 1)
    gt_mono_comps: jnp.ndarray,   # (B, F, T, 2S) [mag, ph]*S
):
    """Returns (bin_stft_l2 (B, 1), mono_stft_l2 (B, 1)) for the target
    source (index 0)."""
    gt_bin_mag_l = gt_bin_comps[..., 0]
    gt_bin_ph_l = gt_bin_comps[..., 1]
    gt_bin_mag_r = gt_bin_comps[..., 2]
    gt_bin_ph_r = gt_bin_comps[..., 3]

    pred_bin = masked_mix(mixed_log_mag, pred_binSepMasks)
    bin_l = _real_imag_sqdist(gt_bin_mag_l, gt_bin_ph_l, pred_bin[..., 0], gt_bin_ph_l)
    bin_r = _real_imag_sqdist(gt_bin_mag_r, gt_bin_ph_r, pred_bin[..., 1], gt_bin_ph_r)
    bin_dist = bin_l + bin_r

    gt_mono_mag = gt_mono_comps[..., 0]
    gt_mono_ph = gt_mono_comps[..., 1]
    mono_dist = _real_imag_sqdist(
        gt_mono_mag, gt_mono_ph, pred_mono[..., 0], gt_mono_ph
    )
    return bin_dist, mono_dist
