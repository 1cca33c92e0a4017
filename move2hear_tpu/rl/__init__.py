from move2hear_tpu.rl.gae import compute_returns
from move2hear_tpu.rl.ppo import (
    PPOConfig,
    AgentState,
    create_agent_state,
    ppo_update_pol,
    ppo_update_sep,
    load_pretrained_passive_separators,
    POL_KEYS,
    SEP_TRAIN_KEYS,
)

__all__ = [
    "compute_returns",
    "PPOConfig",
    "AgentState",
    "create_agent_state",
    "ppo_update_pol",
    "ppo_update_sep",
    "load_pretrained_passive_separators",
    "POL_KEYS",
    "SEP_TRAIN_KEYS",
]
