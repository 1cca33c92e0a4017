"""Learning-dynamics tests (VERDICT r4 item 6): parity tests pin the math
against oracles, but cannot catch a sign error in the reward/advantage
wiring — only an actual optimization trajectory can. These run the real
trainers long enough on tiny shapes (CPU) to assert the headline signals
move the right way:

  - RL (micro-scene near-target, the reference's quality-improvement task,
    ppo_trainer.py:880-977): the separator-refit memory L1 falls, the
    windowed mem-STFT-L2(last-step) falls, and the windowed reward rises
    between the first and last thirds of training.
  - Passive pretrain (passive_trainer.py:259-266): the val mono L1 drops
    materially from epoch 0.
"""

import numpy as np
import pytest

from move2hear_tpu.config import get_config
from move2hear_tpu.env.micro_scene import build_micro_scene
from move2hear_tpu.rl.trainer import PPOTrainer


@pytest.fixture(scope="module")
def rl_run(tmp_path_factory):
    """~36 updates of the full device-path trainer on a 4x4 micro-scene:
    small enough for CPU, long enough for the memory refit + reward signal
    to move decisively (measured trajectories are deterministic given the
    seeds)."""
    model_dir = str(tmp_path_factory.mktemp("learn_rl"))
    cfg = get_config(
        model_dir=model_dir,
        opts=[
            "NUM_PROCESSES", "2",
            "NUM_UPDATES", "36",
            "CHECKPOINT_INTERVAL", "1000",
            "LOG_INTERVAL", "1000",
            "RL.PPO.hidden_size", "64",
            "RL.PPO.num_steps", "10",
            "RL.PPO.num_updates_per_cycle", "6",
            "RL.PPO.ppo_epoch", "2",
            "RL.PPO.num_mini_batch", "1",
            "RL.PPO.use_ddppo", "True",
            "RL.PPO.sep_reward_weight", "1.0",
            "RL.PPO.nav_reward_weight", "0.0",
            "RL.PPO.reward_window_size", "20",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "10",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
            "TPU.KEEP_STATS_HISTORY", "True",
        ],
    )
    bundle = build_micro_scene(
        rows=4, cols=4, num_episodes=16, near_target=True, rir_length=400
    )
    trainer = PPOTrainer(cfg, bundle=bundle)
    trainer.train()
    return trainer


def _cycle_means(trainer, field):
    """Per-cycle mean of a packed-stats field over (T, N)."""
    return np.asarray([float(np.mean(st[field])) for st in trainer._stats_log])


def _cycle_last_step_means(trainer, field, t_steps, horizon):
    """Per-cycle mean of `field` over the episode-final steps only (the
    reference's *_last windows, keyed on done)."""
    vals = []
    for st in trainer._stats_log:
        done = st["done"] > 0.5
        if done.any():
            vals.append(float(st[field][done].mean()))
        else:
            vals.append(np.nan)
    return np.asarray(vals)


def test_rl_memory_refit_loss_falls(rl_run):
    """The acoustic-memory refit L1 (the one loss the separator optimizer
    trains, ppo.py:179-246) must fall decisively over training."""
    mem = np.asarray([float(sep[-1][2]) for _, sep in rl_run._loss_log])
    assert len(mem) >= 6
    first, last = mem[0], mem[-1]
    assert last < 0.7 * first, f"mem refit L1 did not fall: {mem.tolist()}"


def test_rl_mem_stft_l2_improves(rl_run):
    """Windowed mem-L2 at episode-final steps: last third of training must
    beat the first third (the reference's avg_mem_stftl2_dist_lastStep
    channel, ppo_trainer.py:930-947)."""
    traj = _cycle_last_step_means(rl_run, "mem_l2", 10, 10)
    traj = traj[~np.isnan(traj)]
    k = max(1, len(traj) // 3)
    early, late = traj[:k].mean(), traj[-k:].mean()
    assert late < early, f"mem_l2(last) early {early:.4f} -> late {late:.4f}"


def test_rl_reward_improves(rl_run):
    """Windowed reward must rise: the quality-improvement reward is driven
    by the same memory quality the refit trains, so a sign error anywhere in
    the reward/advantage chain shows up here."""
    traj = _cycle_means(rl_run, "reward")
    k = max(1, len(traj) // 3)
    early, late = traj[:k].mean(), traj[-k:].mean()
    assert late > early, f"reward early {early:.5f} -> late {late:.5f}"


def test_pretrain_val_loss_drops(tmp_path):
    """Passive pretraining: val mono L1 after a few epochs must drop
    materially below epoch 0 (passive_trainer.py:259-266 keeps best-on-val
    for exactly this signal)."""
    from move2hear_tpu.pretrain import PassiveTrainer, SyntheticPassiveSource

    cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "Pretrain.Passive.NUM_EPOCHS", "6",
            "Pretrain.Passive.BATCH_SIZE", "8",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ],
    )
    sources = {
        "train": SyntheticPassiveSource(num_datapoints=32, rir_length=400, seed=0),
        "val": SyntheticPassiveSource(num_datapoints=8, rir_length=400, seed=1),
        "nonoverlapping_val": SyntheticPassiveSource(
            num_datapoints=8, rir_length=400, seed=2
        ),
    }
    trainer = PassiveTrainer(cfg, sources=sources)
    trainer.train()
    hist = trainer._val_history
    assert len(hist) == 6
    first = hist[0]["val"][1]
    best = min(h["val"][1] for h in hist)
    assert best < 0.8 * first, (
        f"val mono L1 never dropped: epoch0 {first:.4f}, best {best:.4f}, "
        f"trajectory {[round(h['val'][1], 4) for h in hist]}"
    )
