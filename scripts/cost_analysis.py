#!/usr/bin/env python3
"""XLA cost analysis of the three hot training programs (collect scan,
policy update, slab-cached separator refit) at the published bench shapes:
compiled FLOPs / bytes accessed, and the roofline-optimal time on the
current chip vs the measured wall time. Use it to see how far each program
sits from speed-of-light and whether it is FLOP- or bandwidth-bound.

Run exclusively on the chip (the tunnel serializes concurrent jobs).
"""

#
# CAVEAT: XLA's compiled cost_analysis counts a `lax.scan`/while BODY ONCE,
# not times its trip count — for the scanned programs here (the T-step
# collect, the epoch-loop updates) `gflops`/`gbytes`/`optimal_ms` are
# per-iteration-scale numbers while `wall_ms` is the whole program, so
# `x_from_optimal` overstates the gap by roughly the trip count. Compare
# wall_ms against optimal_ms * trip_count, or profile per-step.

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e peaks (per chip): 197 bf16 TFLOP/s -> ~49 f32 TFLOP/s via MXU,
# 819 GB/s HBM. Swap for other chips.
PEAK_F32_FLOPS = 49e12
PEAK_HBM_BPS = 819e9


def analyze(name, jitted, *args, iters=3):
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    jax.block_until_ready(jitted(*args))  # warm
    t0 = time.time()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    wall = (time.time() - t0) / iters
    t_flops = flops / PEAK_F32_FLOPS
    t_bw = bytes_accessed / PEAK_HBM_BPS
    optimal = max(t_flops, t_bw)
    return {
        "program": name,
        "gflops": round(flops / 1e9, 2),
        "gbytes": round(bytes_accessed / 1e9, 3),
        "flop_time_ms": round(t_flops * 1e3, 3),
        "bw_time_ms": round(t_bw * 1e3, 3),
        "bound": "flops" if t_flops > t_bw else "bandwidth",
        "optimal_ms": round(optimal * 1e3, 3),
        "wall_ms": round(wall * 1e3, 2),
        "x_from_optimal": round(wall / max(optimal, 1e-9), 1),
    }


def main():
    from move2hear_tpu.config import get_config
    from move2hear_tpu.env import device_env as de
    from move2hear_tpu.env.micro_scene import build_micro_scene
    from move2hear_tpu.env.sim import Action
    from move2hear_tpu.models.policy import Move2HearPolicy
    from move2hear_tpu.rl.device_rollout import (
        RolloutSepIdx, make_collect, make_update_sep_from_slabs,
    )
    from move2hear_tpu.rl.ppo import (
        PPOConfig, create_agent_state, make_update_pol,
    )

    n_envs, t_steps, cycle = 14, 20, 6
    get_config(model_dir="/tmp/m2h_cost", opts=[
        "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
    ])
    bundle = build_micro_scene(
        rows=4, cols=4, num_episodes=64, near_target=True, rir_length=16000
    )
    dev = de.build_device_bundle(bundle)
    order = de.make_order_table(n_envs, 64, 0)
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
    update_sep = jax.jit(
        make_update_sep_from_slabs(policy, ppo_cfg, n_envs, cycle)
    )

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
    key = jax.random.PRNGKey(1)

    rows = [
        analyze(
            "collect(T=20)", collect, dev, state.params, state.batch_stats,
            env_state, hidden, masks, prev_mem, key,
        )
    ]
    out = collect(
        dev, state.params, state.batch_stats, env_state, hidden, masks,
        prev_mem, key,
    )
    rows.append(analyze("update_pol", update_pol, state, out.rollouts_pol, key))

    from move2hear_tpu.rl.device_rollout import write_sep_slab

    sep_buf = RolloutSepIdx.create(t_steps * cycle, n_envs, 2)
    for sub in range(cycle):
        sep_buf = write_sep_slab(sep_buf, out.sep_slab, sub * t_steps)
    lrs = jnp.ones((cycle,), jnp.float32)
    rows.append(
        analyze("update_sep_cycle", update_sep, state, sep_buf, key, lrs)
    )

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
