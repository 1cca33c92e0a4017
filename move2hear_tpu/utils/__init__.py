from move2hear_tpu.utils.config_tree import Config
from move2hear_tpu.utils.registry import registry, baseline_registry
from move2hear_tpu.utils.misc import (
    batch_obs,
    linear_decay,
    poll_checkpoint_folder,
)
from move2hear_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "Config",
    "registry",
    "baseline_registry",
    "batch_obs",
    "linear_decay",
    "poll_checkpoint_folder",
    "save_checkpoint",
    "load_checkpoint",
]
