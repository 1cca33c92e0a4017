from move2hear_tpu.ops.stft import (
    N_FFT,
    HOP_LENGTH,
    N_FREQ,
    hann_window,
    stft,
    stft_mag_phase,
    istft,
    istft_mag_phase,
    num_frames,
)
from move2hear_tpu.ops.convolve import fftconvolve_same
from move2hear_tpu.ops.spec import (
    SLICE_FACTOR,
    slice16,
    deslice16,
    apply_mask_log1p,
    masked_mix,
    quantize_int16,
    l2_norm_scale,
)
from move2hear_tpu.ops.frontend import render_binaural_mixture, RenderedAudio

__all__ = [
    "N_FFT",
    "HOP_LENGTH",
    "N_FREQ",
    "hann_window",
    "stft",
    "stft_mag_phase",
    "istft",
    "istft_mag_phase",
    "num_frames",
    "fftconvolve_same",
    "SLICE_FACTOR",
    "slice16",
    "deslice16",
    "apply_mask_log1p",
    "masked_mix",
    "quantize_int16",
    "l2_norm_scale",
    "render_binaural_mixture",
    "RenderedAudio",
]
