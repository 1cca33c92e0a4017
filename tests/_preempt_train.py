"""Subprocess target for the preemption test (tests/test_parallel.py):
a tiny device-path training run with the production signal handlers
installed, exactly as main.py wires them. On SIGUSR2 the trainer must save
the interrupted train state for its JOB_ID and exit cleanly."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from move2hear_tpu.config import get_config
from move2hear_tpu.env.micro_scene import build_micro_scene
from move2hear_tpu.parallel.ddppo import add_signal_handlers
from move2hear_tpu.rl.trainer import PPOTrainer


def main():
    model_dir = sys.argv[1]
    add_signal_handlers()
    cfg = get_config(
        model_dir=model_dir,
        opts=[
            "JOB_ID", "preempt-test",
            "NUM_PROCESSES", "2",
            "NUM_UPDATES", "50",
            "CHECKPOINT_INTERVAL", "1000",
            "LOG_INTERVAL", "1000",
            "RL.PPO.hidden_size", "32",
            "RL.PPO.num_steps", "2",
            "RL.PPO.num_updates_per_cycle", "1",
            "RL.PPO.ppo_epoch", "1",
            "RL.PPO.num_mini_batch", "1",
            "RL.PPO.use_ddppo", "True",
            "RL.PPO.sep_reward_weight", "1.0",
            "RL.PPO.nav_reward_weight", "0.0",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "3",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ],
    )
    bundle = build_micro_scene(
        rows=3, cols=3, num_episodes=8, near_target=True, rir_length=300
    )
    print("READY", flush=True)
    PPOTrainer(cfg, bundle=bundle).train()
    print("CLEAN_EXIT", flush=True)


if __name__ == "__main__":
    main()
