"""Abstract trainer API + checkpoint-polling eval loop
(``audio_separation/common/base_trainer.py``)."""

import os
import time
from typing import Optional

from move2hear_tpu.utils.misc import poll_checkpoint_folder


class BaseTrainer:
    def train(self) -> None:
        raise NotImplementedError

    def eval(self, eval_interval: int = 1, prev_ckpt_ind: int = -1) -> None:
        raise NotImplementedError

    def save_checkpoint(self, file_name: str) -> None:
        raise NotImplementedError

    def load_checkpoint(self, checkpoint_path: str):
        raise NotImplementedError

    def _interrupt_scope(self) -> str:
        """Keys the preemption snapshot to this experiment (trainer kind +
        checkpoint folder) so runs sharing the default JOB_ID can't adopt
        each other's interrupted state."""
        return f"{type(self).__name__}:{self.config.CHECKPOINT_FOLDER}"

    def _clear_interrupted_state(self) -> None:
        """Remove this experiment's preemption snapshot after a run completes
        normally; no-op when the run is exiting BECAUSE of a preemption."""
        import os

        from move2hear_tpu.parallel.ddppo import (
            EXIT,
            get_distrib_info,
            interrupted_state_path,
        )

        if EXIT.is_set():
            return
        _, world_rank, _ = get_distrib_info()
        if world_rank != 0:
            return
        path = interrupted_state_path(self.config.JOB_ID, self._interrupt_scope())
        if os.path.exists(path):
            try:
                os.remove(path)
            except OSError:
                pass


class BaseRLTrainer(BaseTrainer):
    def __init__(self, config):
        self.config = config

    def eval(self, eval_interval: int = 1, prev_ckpt_ind: int = -1) -> None:
        """Single-checkpoint eval when EVAL_CKPT_PATH_DIR is a file; otherwise
        poll the checkpoint dir forever, evaluating each new ckpt in mtime
        order (base_trainer.py:59-102)."""
        ckpt_dir = self.config.EVAL_CKPT_PATH_DIR
        if os.path.isfile(ckpt_dir):
            self._eval_checkpoint(ckpt_dir, checkpoint_index=0)
            return
        while True:
            current_ckpt = None
            while current_ckpt is None:
                current_ckpt = poll_checkpoint_folder(
                    ckpt_dir, prev_ckpt_ind, eval_interval
                )
                if current_ckpt is None:
                    if getattr(self, "_eval_poll_once", False):
                        return
                    time.sleep(2)
            prev_ckpt_ind += eval_interval
            self._eval_checkpoint(
                checkpoint_path=current_ckpt, checkpoint_index=prev_ckpt_ind
            )

    def _eval_checkpoint(
        self, checkpoint_path: str, checkpoint_index: int = 0
    ) -> None:
        raise NotImplementedError

    @staticmethod
    def _setup_eval_config(checkpoint_config, eval_config):
        """Merge priority: eval CLI opts > ckpt CLI opts > eval cfg > ckpt cfg
        (base_trainer.py:104-140). Falls back to the eval config alone when
        the saved config is outdated (missing/renamed keys)."""
        import logging

        from move2hear_tpu.utils.config_tree import Config

        ckpt_dict = (
            checkpoint_config if isinstance(checkpoint_config, dict) else {}
        )
        eval_dict = (
            eval_config.to_dict()
            if isinstance(eval_config, Config) else dict(eval_config)
        )
        ckpt_opts = list(ckpt_dict.get("CMD_TRAILING_OPTS") or [])
        eval_opts = list(eval_dict.get("CMD_TRAILING_OPTS") or [])

        merged = Config(ckpt_dict)
        merged.merge_from_other(eval_dict)
        try:
            merged.merge_from_list(ckpt_opts)
            merged.merge_from_list(eval_opts)
        except (KeyError, AssertionError):
            logging.getLogger(__name__).info(
                "Saved config is outdated, using solely eval config"
            )
            merged = Config(eval_dict)
            if eval_opts:
                merged.merge_from_list(eval_opts)
        return merged.freeze()
