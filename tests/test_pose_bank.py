"""Pose-indexed rollout observations (the policy-update visual dedup) must be
numerically equivalent to storing and re-encoding the raw rgb/depth frames:
the collect's stored data differs only in representation (pose index vs the
frame the index dereferences), and the update's per-epoch visual-feature bank
+ gather computes the identical forward with gradients accumulated per pose
instead of per step (see rl/ppo.py:make_update_pol)."""

import jax
import jax.numpy as jnp
import numpy as np

from move2hear_tpu.env import build_micro_scene
from move2hear_tpu.env.device_env import (
    build_device_bundle,
    env_reset_all,
    make_order_table,
)
from move2hear_tpu.env.sim import Action
from move2hear_tpu.models import Move2HearPolicy
from move2hear_tpu.rl.device_rollout import make_collect
from move2hear_tpu.rl.ppo import PPOConfig, create_agent_state, make_update_pol

N, T, H = 4, 20, 64
SENSORS = ("mixed_bin_audio_mag", "target_class", "rgb", "depth")


def _setup():
    bundle = build_micro_scene(
        rows=4, cols=4, num_episodes=2 * N, near_target=True, rir_length=400
    )
    dev = build_device_bundle(bundle)
    order = make_order_table(N, 2 * N, 0)
    env_state = env_reset_all(dev.scene, dev.episodes, jnp.asarray(order))
    policy = Move2HearPolicy(num_actions=3, hidden_size=H, use_ddppo=True)
    obs = {
        "rgb": jnp.zeros((N, 128, 128, 3), jnp.uint8),
        "depth": jnp.zeros((N, 128, 128, 1)),
        "mixed_bin_audio_mag": jnp.zeros((N, 512, 32, 2)),
        "target_class": jnp.zeros((N, 1), jnp.int32),
    }
    variables = policy.init(
        jax.random.PRNGKey(0), obs, jnp.zeros((N, H)), jnp.ones((N, 1))
    )
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=1)
    state = create_agent_state(cfg, variables)
    codes = tuple(int(Action[a]) for a in ("MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT"))
    args = (policy, cfg, T, 20, 1.2, True, 10.0, 0.0, codes, SENSORS)
    return dev, env_state, policy, cfg, state, args


def test_pose_rollouts_match_frame_rollouts():
    dev, env_state, policy, cfg, state, args = _setup()
    hidden = jnp.zeros((N, H))
    masks = jnp.ones((N, 1))
    prev_mem = jnp.zeros((N, 512, 32, 1))
    key = jax.random.PRNGKey(1)

    cargs = (dev, state.params, state.batch_stats, env_state, hidden, masks,
             prev_mem, key)
    out_f = jax.jit(make_collect(*args, pose_obs=False))(*cargs)
    out_p = jax.jit(make_collect(*args, pose_obs=True))(*cargs)

    # identical trajectories and rollout payloads
    np.testing.assert_array_equal(out_f.rollouts_pol["actions"],
                                  out_p.rollouts_pol["actions"])
    np.testing.assert_array_equal(out_f.rollouts_pol["rewards"],
                                  out_p.rollouts_pol["rewards"])
    rf, rp = out_f.rollouts_pol, out_p.rollouts_pol
    assert set(rp["observations"]) == {"mixed_bin_audio_mag", "target_class",
                                       "pose"}
    # the pose index dereferences to exactly the frames the other path stored
    v = dev.rgb_bank.shape[1]
    flat_rgb = np.asarray(dev.rgb_bank).reshape((-1,) + dev.rgb_bank.shape[3:])
    pose = np.asarray(rp["observations"]["pose"])
    np.testing.assert_array_equal(flat_rgb[pose],
                                  np.asarray(rf["observations"]["rgb"]))

    # the policy update from either representation produces the same step
    upd_f = jax.jit(make_update_pol(policy, cfg, N, pose_bank=False))
    upd_p = jax.jit(make_update_pol(policy, cfg, N, pose_bank=True))
    key_u = jax.random.PRNGKey(2)
    banks = {"rgb": dev.rgb_bank, "depth": dev.depth_bank}
    s_f, losses_f = upd_f(state, rf, key_u)
    s_p, losses_p = upd_p(state, rp, key_u, banks=banks)

    for lf, lp in zip(losses_f, losses_p):
        assert abs(float(lf) - float(lp)) <= 1e-5 * max(1.0, abs(float(lf)))
    flat_f, _ = jax.flatten_util.ravel_pytree(s_f.params)
    flat_p, _ = jax.flatten_util.ravel_pytree(s_p.params)
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_p), rtol=2e-4, atol=2e-5
    )


def test_trainer_device_pose_path_trains(tmp_path):
    """End-to-end: a config whose pose count fits N*T must auto-enable the
    pose-indexed rollouts and train through a full cycle (finite losses,
    checkpoints written)."""
    from move2hear_tpu.config import get_config
    from move2hear_tpu.rl.trainer import PPOTrainer

    cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "NUM_PROCESSES", "4",
            "NUM_UPDATES", "2",
            "CHECKPOINT_INTERVAL", "2",
            "LOG_INTERVAL", "2",
            "RL.PPO.hidden_size", "64",
            "RL.PPO.num_steps", "20",
            "RL.PPO.num_updates_per_cycle", "2",
            "RL.PPO.ppo_epoch", "1",
            "RL.PPO.num_mini_batch", "1",
            "RL.PPO.use_ddppo", "True",
            "RL.PPO.sep_reward_weight", "1.0",
            "RL.PPO.nav_reward_weight", "0.0",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "10",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ],
    )
    bundle = build_micro_scene(
        rows=4, cols=4, num_episodes=8, near_target=True, rir_length=400
    )
    trainer = PPOTrainer(cfg, bundle=bundle)
    trainer.train()
    assert trainer._pose_obs is True  # 16 nodes * 4 rots = 64 <= 4 envs * 20
    flat, _ = jax.flatten_util.ravel_pytree(trainer._final_state.params)
    assert bool(jnp.all(jnp.isfinite(flat)))
