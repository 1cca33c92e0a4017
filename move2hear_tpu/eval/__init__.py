from move2hear_tpu.eval.metrics import stft_l2_distance
from move2hear_tpu.eval.bss import (
    NAME_OF_ALL_QUALITY_METRICS,
    scale_bss_eval,
    evaluate,
    compute_waveform_quality,
)

__all__ = [
    "stft_l2_distance",
    "NAME_OF_ALL_QUALITY_METRICS",
    "scale_bss_eval",
    "evaluate",
    "compute_waveform_quality",
]
