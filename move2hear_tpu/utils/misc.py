"""Small host-side utilities (``common/utils.py:53-125``)."""

import glob
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


def batch_obs(observations: List[Dict]) -> Dict[str, np.ndarray]:
    """List-of-dicts -> dict of stacked float32 arrays (utils.py:75-97).
    Integer sensors (target_class) stay integer."""
    batch = defaultdict(list)
    for obs in observations:
        for sensor, v in obs.items():
            batch[sensor].append(np.asarray(v))
    out = {}
    for sensor, vals in batch.items():
        arr = np.stack(vals, axis=0)
        if np.issubdtype(arr.dtype, np.integer):
            out[sensor] = arr.astype(np.int32)
        else:
            out[sensor] = arr.astype(np.float32)
    return out


def linear_decay(epoch: int, total_num_updates: int) -> float:
    """LR/clip multiplier decaying linearly to 0 (utils.py:53-63)."""
    return 1.0 - (epoch / float(total_num_updates))


def poll_checkpoint_folder(
    checkpoint_folder: str, previous_ckpt_ind: int, eval_interval: int = 1
) -> Optional[str]:
    """mtime-ordered discovery of the next unevaluated ckpt
    (utils.py:100-125). Returns a path or None."""
    assert os.path.isdir(checkpoint_folder), checkpoint_folder
    models_paths = list(
        filter(os.path.isfile, glob.glob(os.path.join(checkpoint_folder, "*")))
    )
    models_paths.sort(key=os.path.getmtime)
    ind = previous_ckpt_ind + eval_interval
    if ind < len(models_paths):
        return models_paths[ind]
    return None
