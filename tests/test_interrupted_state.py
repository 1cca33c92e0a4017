"""Interrupted-state (preemption snapshot) keying and auto-resume safety.

Regression for a real collision: a bench run and a test run both using the
default JOB_ID=1 shared one `~/.interrupted_states/1.ckpt`, so the test's
trainer auto-resumed a 512-hidden micro-scene model into a 64-hidden
file-backed config and died on a conv kernel shape mismatch. Snapshots are
now keyed by (JOB_ID, trainer kind + CHECKPOINT_FOLDER), and auto-resume
validates parameter-tree shapes before adopting a snapshot
(reference analog: SLURM_JOB_ID is unique per job, ddppo_utils.py:59-95)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from move2hear_tpu.parallel import ddppo
from move2hear_tpu.utils.checkpoint import tree_shapes_match


def test_scope_separates_snapshots(monkeypatch, tmp_path):
    monkeypatch.setenv("INTERRUPTED_STATE_DIR", str(tmp_path))
    a = ddppo.interrupted_state_path(1, scope="PPOTrainer:/runs/bench/data")
    b = ddppo.interrupted_state_path(1, scope="PPOTrainer:/runs/test/data")
    c = ddppo.interrupted_state_path(1, scope="PassiveTrainer:/runs/bench/data")
    assert len({a, b, c}) == 3
    # same (job, scope) is stable — a requeued rerun finds its own snapshot
    assert a == ddppo.interrupted_state_path(1, scope="PPOTrainer:/runs/bench/data")
    # unscoped legacy path unchanged
    assert ddppo.interrupted_state_path(7).endswith("7.ckpt")


def test_save_load_roundtrip_respects_scope(monkeypatch, tmp_path):
    monkeypatch.setenv("INTERRUPTED_STATE_DIR", str(tmp_path))
    state = {"params": {"w": np.ones((2, 2), np.float32)},
             "extra_state": {"update_count": 3}}
    ddppo.save_interrupted_state(state, 1, scope="A")
    assert ddppo.load_interrupted_state(1, scope="B") is None
    got = ddppo.load_interrupted_state(1, scope="A")
    assert got is not None and got["extra_state"]["update_count"] == 3


def test_load_if_compatible_rejects_structure_mismatch(tmp_path):
    """A stale snapshot with a *different tree structure* (extra/missing
    param keys, e.g. use_ddppo toggling BatchNorm) must be skipped, not
    crash in flax.serialization.from_bytes before the shape gate runs."""
    from move2hear_tpu.utils.checkpoint import (
        load_checkpoint_if_compatible,
        save_checkpoint,
    )

    path = str(tmp_path / "snap.ckpt")
    save_checkpoint(
        path,
        {
            "params": {"enc": {"kernel": np.ones((3, 3), np.float32)}},
            "extra_state": {"update_count": 7},
        },
    )
    # same structure + shapes: adopted
    ok = load_checkpoint_if_compatible(
        path, targets={"params": {"enc": {"kernel": jnp.zeros((3, 3))}}}
    )
    assert ok is not None and ok["extra_state"]["update_count"] == 7
    # different key set: ValueError inside from_bytes without the pre-check
    assert (
        load_checkpoint_if_compatible(
            path,
            targets={
                "params": {"enc": {"kernel": jnp.zeros((3, 3))},
                           "bn": {"scale": jnp.zeros((3,))}}
            },
        )
        is None
    )
    # different leaf shape: also skipped
    assert (
        load_checkpoint_if_compatible(
            path, targets={"params": {"enc": {"kernel": jnp.zeros((4, 3))}}}
        )
        is None
    )
    # corrupt file: skipped, not raised
    with open(path, "wb") as f:
        f.write(b"not a pickle")
    assert (
        load_checkpoint_if_compatible(
            path, targets={"params": {"enc": {"kernel": jnp.zeros((3, 3))}}}
        )
        is None
    )


def test_tree_shapes_match():
    a = {"conv": {"kernel": jnp.zeros((8, 8, 3, 32))}}
    b = {"conv": {"kernel": jnp.zeros((8, 8, 4, 32))}}
    assert tree_shapes_match(a, a)
    assert not tree_shapes_match(a, b)
    assert not tree_shapes_match(a, {"conv": {}})


@pytest.mark.parametrize("env_path", ["device", "host"])
@pytest.mark.parametrize("compatible", [True, False])
def test_rl_auto_resume_shape_gate(
    monkeypatch, tmp_path, compatible, env_path, caplog
):
    """Both trainer paths must adopt a compatible snapshot and ignore an
    incompatible one (instead of crashing in flax with ScopeParamShapeError)."""
    from move2hear_tpu.config import get_config
    from move2hear_tpu.env.micro_scene import build_micro_scene
    from move2hear_tpu.rl.trainer import PPOTrainer

    monkeypatch.setenv("INTERRUPTED_STATE_DIR", str(tmp_path / "interr"))
    hidden = "32"
    cfg = get_config(
        model_dir=str(tmp_path / "md"),
        opts=[
            "NUM_PROCESSES", "2",
            "NUM_UPDATES", "1",
            "CHECKPOINT_INTERVAL", "1000",
            "LOG_INTERVAL", "1000",
            "RL.PPO.hidden_size", hidden,
            "RL.PPO.num_steps", "2",
            "RL.PPO.num_updates_per_cycle", "1",
            "RL.PPO.ppo_epoch", "1",
            "RL.PPO.num_mini_batch", "1",
            "RL.PPO.pretrained_passive_separators_ckpt", "",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "3",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ]
        + (
            ["TPU.DEVICE_ENV", "False", "USE_SYNC_VECENV", "True"]
            if env_path == "host"
            else []
        ),
    )
    bundle = build_micro_scene(
        rows=3, cols=3, num_episodes=8, near_target=True, rir_length=300
    )
    trainer = PPOTrainer(cfg, bundle=bundle)

    # Seed a snapshot with the right scope; when `compatible` is False a
    # different hidden size produces a structurally-similar but
    # shape-incompatible tree (the stale-bench-snapshot scenario).
    from move2hear_tpu.models.policy import Move2HearPolicy
    import jax

    size = 32 if compatible else 16
    pol = Move2HearPolicy(num_actions=3, hidden_size=size)
    n = 2
    obs = {
        "mixed_bin_audio_mag": jnp.zeros((n, 512, 32, 2)),
        "gt_bin_comps": jnp.zeros((n, 512, 32, 4)),
        "gt_mono_comps": jnp.zeros((n, 512, 32, 2)),
        "target_class": jnp.zeros((n, 1), jnp.int32),
        # mirror the trainer's init_obs: the micro-scene bundle has frame
        # banks, so its policy sees rgb+depth
        "rgb": jnp.zeros((n, 128, 128, 3), jnp.uint8),
        "depth": jnp.zeros((n, 128, 128, 1)),
    }
    variables = pol.init(
        jax.random.PRNGKey(0), obs, jnp.zeros((n, size)), jnp.ones((n, 1))
    )
    from move2hear_tpu.rl.ppo import PPOConfig, create_agent_state

    seeded = create_agent_state(PPOConfig(), variables)
    ddppo.save_interrupted_state(
        {
            "params": seeded.params,
            "batch_stats": seeded.batch_stats,
            "opt_state_pol": seeded.opt_state_pol,
            "opt_state_sep": seeded.opt_state_sep,
            "extra_state": {"update_count": 41},
            "config": cfg.to_dict(),
        },
        cfg.JOB_ID,
        scope=trainer._interrupt_scope(),
    )

    import logging

    with caplog.at_level(logging.INFO, logger="move2hear_tpu.rl.trainer"):
        trainer.train()  # must not raise either way

    if compatible:
        assert any(
            "resumed full train state" in r.getMessage() for r in caplog.records
        )
    else:
        assert any(
            "ignoring interrupted state" in r.getMessage() for r in caplog.records
        )
    # normal completion clears the snapshot either way
    assert (
        ddppo.load_interrupted_state(cfg.JOB_ID, scope=trainer._interrupt_scope())
        is None
    )
