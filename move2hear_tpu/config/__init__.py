from move2hear_tpu.config.default import get_config, get_task_config, default_config

__all__ = ["get_config", "get_task_config", "default_config"]
