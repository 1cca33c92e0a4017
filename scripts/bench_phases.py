#!/usr/bin/env python3
"""Phase breakdown of one training cycle on the current backend: times the
collect scan, the PPO policy update, the cached separator refit, and the
slab write separately (block_until_ready around each), at the published
bench shapes. Prints one JSON line; use it to aim the next optimization.

Run exclusively on the chip (tunnel serializes concurrent jobs)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import argparse

    from move2hear_tpu.config import get_config
    from move2hear_tpu.env import device_env as de
    from move2hear_tpu.env.micro_scene import build_micro_scene
    from move2hear_tpu.env.sim import Action
    from move2hear_tpu.models.policy import Move2HearPolicy
    from move2hear_tpu.rl.device_rollout import (
        RolloutSepIdx, make_collect, make_update_sep_from_slabs,
        write_sep_slab,
    )
    from move2hear_tpu.rl.ppo import PPOConfig, create_agent_state, make_update_pol

    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=14)
    args = ap.parse_args()

    n_envs, t_steps, cycle = args.envs, 20, 6
    cfg = get_config(model_dir="/tmp/m2h_phases", opts=[
        "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
    ])
    bundle = build_micro_scene(
        rows=4, cols=4, num_episodes=max(64, 2 * n_envs), near_target=True,
        rir_length=16000
    )
    dev = de.build_device_bundle(bundle)
    order = de.make_order_table(n_envs, max(64, 2 * n_envs), 0)
    env_state = de.env_reset_all(dev.scene, dev.episodes, jnp.asarray(order))

    actions = ("MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT")
    codes = tuple(int(Action[a]) for a in actions)
    policy = Move2HearPolicy(num_actions=3, hidden_size=512, use_ddppo=True)
    ppo_cfg = PPOConfig(ppo_epoch=4, num_mini_batch=1)

    pol_sensors = ("mixed_bin_audio_mag", "target_class", "rgb", "depth")
    collect = jax.jit(make_collect(
        policy, ppo_cfg, t_steps, 20, 1.2, True, 10.0, 0.0, codes,
        pol_sensors,
    ))
    update_pol = jax.jit(make_update_pol(policy, ppo_cfg, n_envs))
    # no donation here: the SAME state is reused across timing iterations
    update_sep = jax.jit(
        make_update_sep_from_slabs(policy, ppo_cfg, n_envs, cycle)
    )

    rng = np.random.default_rng(0)
    obs = {
        "rgb": jnp.zeros((n_envs, 128, 128, 3), jnp.uint8),
        "depth": jnp.zeros((n_envs, 128, 128, 1)),
        "mixed_bin_audio_mag": jnp.zeros((n_envs, 512, 32, 2)),
        "target_class": jnp.zeros((n_envs, 1), jnp.int32),
    }
    hidden = jnp.zeros((n_envs, 512))
    masks = jnp.ones((n_envs, 1))
    prev_mem = jnp.zeros((n_envs, 512, 32, 1))
    variables = policy.init(jax.random.PRNGKey(0), obs, hidden, masks)
    state = create_agent_state(ppo_cfg, variables)
    sep_buf = RolloutSepIdx.create(t_steps * cycle, n_envs, 2)
    banks = (dev.wav_bank, dev.rir_bank)

    def timeit(fn, warmup=1, iters=3):
        for _ in range(warmup):
            jax.block_until_ready(fn())
        t0 = time.time()
        for _ in range(iters):
            jax.block_until_ready(fn())
        return (time.time() - t0) / iters

    key = jax.random.PRNGKey(1)
    t_collect = timeit(lambda: collect(
        dev, state.params, state.batch_stats, env_state, hidden, masks,
        prev_mem, key,
    ))
    out = collect(
        dev, state.params, state.batch_stats, env_state, hidden, masks,
        prev_mem, key,
    )
    jax.block_until_ready(out.stats)
    t_update = timeit(lambda: update_pol(state, out.rollouts_pol, key)[1])
    t_slab = timeit(lambda: write_sep_slab(
        RolloutSepIdx.create(t_steps * cycle, n_envs, 2), out.sep_slab, 0
    ))

    lrs = jnp.ones((cycle,), jnp.float32)
    sep_buf = write_sep_slab(sep_buf, out.sep_slab, 0)

    def sep_once():
        s2, losses = update_sep(state, sep_buf, key, lrs)
        return losses

    t_sep = timeit(sep_once)

    cycle_s = cycle * (t_collect + t_update + t_slab) + t_sep
    steps = cycle * t_steps * n_envs
    print(json.dumps({
        "collect_s": round(t_collect, 4),
        "update_pol_s": round(t_update, 4),
        "write_slab_s": round(t_slab, 5),
        "update_sep_cycle_s": round(t_sep, 4),
        "derived_cycle_s": round(cycle_s, 4),
        "derived_steps_per_sec": round(steps / cycle_s, 1),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
