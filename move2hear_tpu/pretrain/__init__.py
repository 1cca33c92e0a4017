from move2hear_tpu.pretrain.dataset import (
    CLASS_NAMES_TO_LABELS,
    LABELS_TO_CLASS_NAMES,
    PassiveDataSource,
    SyntheticPassiveSource,
    FilePassiveSource,
)
from move2hear_tpu.pretrain.trainer import PassiveTrainer

__all__ = [
    "CLASS_NAMES_TO_LABELS",
    "LABELS_TO_CLASS_NAMES",
    "PassiveDataSource",
    "SyntheticPassiveSource",
    "FilePassiveSource",
    "PassiveTrainer",
]
