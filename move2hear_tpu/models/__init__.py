from move2hear_tpu.models.unet import PassiveSepEncoder, PassiveSepDecoder
from move2hear_tpu.models.memory import AcousticMem
from move2hear_tpu.models.audio_cnn import AudioCNN
from move2hear_tpu.models.visual_cnn import VisualCNN
from move2hear_tpu.models.rnn import GRUStateEncoder
from move2hear_tpu.models.policy import (
    Move2HearPolicy,
    Move2HearPassiveWoMemoryPolicy,
    PolicyNet,
)
from move2hear_tpu.models.distributions import Categorical

__all__ = [
    "PassiveSepEncoder",
    "PassiveSepDecoder",
    "AcousticMem",
    "AudioCNN",
    "VisualCNN",
    "GRUStateEncoder",
    "Move2HearPolicy",
    "Move2HearPassiveWoMemoryPolicy",
    "PolicyNet",
    "Categorical",
]
