"""E2E drive of the RL trainer surface on the real TPU (micro-scene)."""
import logging, time, os
logging.basicConfig(level=logging.INFO, format="%(message)s")
from move2hear_tpu.config import get_config
from move2hear_tpu.env.micro_scene import build_micro_scene
from move2hear_tpu.rl.trainer import PPOTrainer

cfg = get_config(model_dir="/tmp/m2h_rl_run", opts=[
    "NUM_PROCESSES", "4",
    "NUM_UPDATES", "4",
    "CHECKPOINT_INTERVAL", "2",
    "LOG_INTERVAL", "1",
    "RL.PPO.num_steps", "4",
    "RL.PPO.num_updates_per_cycle", "2",
    "RL.PPO.num_mini_batch", "1",
    "RL.PPO.ppo_epoch", "2",
    "RL.PPO.use_ddppo", "True",
    "RL.PPO.sep_reward_weight", "1.0",
    "RL.PPO.nav_reward_weight", "0.0",
    "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "4",
    "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
])
bundle = build_micro_scene(rows=4, cols=4, num_episodes=32, near_target=True, rir_length=1000)
trainer = PPOTrainer(cfg, bundle=bundle)
t0 = time.time()
trainer.train()
print(f"train() completed in {time.time()-t0:.1f}s")
ckpts = os.listdir(cfg.CHECKPOINT_FOLDER)
print("checkpoints:", sorted(ckpts))
assert any(c.startswith("ckpt.") for c in ckpts)
print("TRAINER E2E OK")
