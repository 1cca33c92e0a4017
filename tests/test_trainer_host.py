"""End-to-end HOST-path trainer test (TPU.DEVICE_ENV=False): the reference-
shaped VectorEnv loop — per-step fused device program, reward finalize-one-
late, rollout inserts, PPO + separator updates, episode windows, TB scalars,
checkpoints. This is the parity path for file-backed scenes too large for
device banks (rl/trainer.py:_train_host)."""

import os

import numpy as np
import pytest

from move2hear_tpu.config import get_config
from move2hear_tpu.env.micro_scene import build_micro_scene
from move2hear_tpu.rl.trainer import PPOTrainer
from move2hear_tpu.utils.checkpoint import load_checkpoint


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    model_dir = str(tmp_path_factory.mktemp("rl_host_run"))
    cfg = get_config(
        model_dir=model_dir,
        opts=[
            "NUM_PROCESSES", "2",
            "NUM_UPDATES", "4",
            "CHECKPOINT_INTERVAL", "2",
            "LOG_INTERVAL", "1",
            "USE_SYNC_VECENV", "True",
            "TPU.DEVICE_ENV", "False",
            "RL.PPO.hidden_size", "32",
            "RL.PPO.num_steps", "2",
            "RL.PPO.num_updates_per_cycle", "2",
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
        rows=3, cols=3, num_episodes=8, near_target=True, rir_length=400
    )
    trainer = PPOTrainer(cfg, bundle=bundle)
    trainer.train()
    return cfg, trainer


def test_host_loop_trains_and_checkpoints(run):
    cfg, trainer = run
    ckpts = [c for c in os.listdir(cfg.CHECKPOINT_FOLDER) if c.startswith("ckpt.")]
    assert ckpts
    ckpt = load_checkpoint(os.path.join(cfg.CHECKPOINT_FOLDER, sorted(ckpts)[-1]))
    assert ckpt["extra_state"]["update_count"] == 4
    assert "opt_state_pol" in ckpt and "opt_state_sep" in ckpt
    import jax

    for leaf in jax.tree.leaves(trainer._final_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_host_loop_episode_windows(run):
    _, trainer = run
    w = trainer._windows
    # 8 env-steps per env with 3-step episodes -> at least 2 episode ends
    assert len(w["reward"]) >= 2
    assert np.isfinite(list(w["reward"])).all()
    assert all(s == 3 for s in w["steps"])


def test_host_loop_writes_tensorboard(run):
    cfg, _ = run
    assert os.path.isdir(cfg.TENSORBOARD_DIR)
    assert any("tfevents" in f for f in os.listdir(cfg.TENSORBOARD_DIR))
