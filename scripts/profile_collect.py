#!/usr/bin/env python3
"""Capture a jax.profiler trace of one training phase at bench shapes and
print per-op time attribution (top fusions by total duration).

This is the round-3 in-scan attribution method (docs/ROUND3_NOTES.md): trace
real executions, aggregate `ph=="X"` slice durations by name, then map hot
fusion names back to HLO with `compiled.as_text()`.

Usage: python scripts/profile_collect.py --envs 112 --phase collect
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(n_envs, t_steps, cycle, dtype="float32", pose=True):
    from move2hear_tpu.config import get_config
    from move2hear_tpu.env import device_env as de
    from move2hear_tpu.env.micro_scene import build_micro_scene
    from move2hear_tpu.env.sim import Action
    from move2hear_tpu.models.policy import Move2HearPolicy
    from move2hear_tpu.rl.device_rollout import (
        RolloutSepIdx, make_collect, make_update_sep_from_slabs,
        write_sep_slab,
    )
    from move2hear_tpu.rl.ppo import (
        PPOConfig, create_agent_state, make_update_pol,
    )

    get_config(model_dir="/tmp/m2h_prof", opts=[
        "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
    ])
    bundle = build_micro_scene(
        rows=4, cols=4, num_episodes=max(64, 2 * n_envs), near_target=True,
        rir_length=16000,
    )
    dev = de.build_device_bundle(
        bundle,
        precompute_rir_rfft=os.environ.get("M2H_PROF_RIRFFT", "1") == "1",
    )
    order = de.make_order_table(n_envs, max(64, 2 * n_envs), 0)
    env_state = de.env_reset_all(dev.scene, dev.episodes, jnp.asarray(order))

    actions = ("MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT")
    codes = tuple(int(Action[a]) for a in actions)
    policy = Move2HearPolicy(
        num_actions=3, hidden_size=512, use_ddppo=True,
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
    )
    ppo_cfg = PPOConfig(ppo_epoch=4, num_mini_batch=1)
    pol_sensors = ("mixed_bin_audio_mag", "target_class", "rgb", "depth")
    fb = dev.rgb_bank if dev.rgb_bank is not None else dev.depth_bank
    pose = pose and fb is not None and (
        fb.shape[0] * fb.shape[1] * 4 <= n_envs * t_steps
    )
    collect = jax.jit(make_collect(
        policy, ppo_cfg, t_steps, 20, 1.2, True, 10.0, 0.0, codes, pol_sensors,
        scan_unroll=int(os.environ.get("M2H_PROF_UNROLL", "1")),
        pose_obs=pose,
    ))
    update_pol = jax.jit(make_update_pol(policy, ppo_cfg, n_envs, pose_bank=pose))
    update_sep = jax.jit(make_update_sep_from_slabs(policy, ppo_cfg, n_envs, cycle))
    pol_banks = {"rgb": dev.rgb_bank, "depth": dev.depth_bank} if pose else None

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

    ctx = dict(
        dev=dev, state=state, env_state=env_state, hidden=hidden, masks=masks,
        prev_mem=prev_mem, key=key, collect=collect, update_pol=update_pol,
        update_sep=update_sep, RolloutSepIdx=RolloutSepIdx,
        write_sep_slab=write_sep_slab, t_steps=t_steps, cycle=cycle,
        n_envs=n_envs, pol_banks=pol_banks,
    )
    return ctx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=112)
    ap.add_argument("--phase", choices=("collect", "update_pol", "update_sep"),
                    default="collect")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/m2h_trace")
    ap.add_argument("--dtype", choices=("float32", "bfloat16"),
                    default="bfloat16")
    ap.add_argument("--no-pose", dest="pose", action="store_false",
                    default=True)
    args = ap.parse_args()

    c = build(args.envs, 20, 6, dtype=args.dtype, pose=args.pose)

    def run_collect():
        out = c["collect"](
            c["dev"], c["state"].params, c["state"].batch_stats,
            c["env_state"], c["hidden"], c["masks"], c["prev_mem"], c["key"],
        )
        jax.block_until_ready(out.stats)
        return out

    out = run_collect()  # compile + get real rollouts for the updates
    if args.phase == "collect":
        fn = run_collect
    elif args.phase == "update_pol":
        def fn():
            jax.block_until_ready(
                c["update_pol"](c["state"], out.rollouts_pol, c["key"],
                                banks=c["pol_banks"])[1])
    else:
        buf = c["write_sep_slab"](
            c["RolloutSepIdx"].create(
                c["t_steps"] * c["cycle"], c["n_envs"], 2),
            out.sep_slab, 0)
        lrs = jnp.ones((c["cycle"],), jnp.float32)
        def fn():
            jax.block_until_ready(
                c["update_sep"](c["state"], buf, c["key"], lrs)[1])

    fn()  # compile
    os.system(f"rm -rf {args.trace_dir}")
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            fn()

    # Parse the trace: sum ph=="X" durations by name on device tracks.
    paths = glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {args.trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # Identify device process ids (TPU/device tracks, not python host threads)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    totals = {}
    counts = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e.get("dur", 0.0)
        counts[name] = counts.get(name, 0) + 1
    total_us = sum(totals.values())
    print(f"# phase={args.phase} envs={args.envs} iters={args.iters} "
          f"device-total={total_us/1e3:.1f} ms "
          f"({total_us/1e3/args.iters:.1f} ms/iter)")
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{dur/1e3/args.iters:9.3f} ms/iter  {counts[name]/args.iters:7.1f} x  "
              f"{100*dur/total_us:5.1f}%  {name[:120]}")


if __name__ == "__main__":
    main()


def dump_hlo(ctx, names, path="/tmp/m2h_collect_hlo.txt"):
    """Write compiled HLO text for the collect program and grep `names`."""
    import re
    lowered = ctx["collect"].lower(
        ctx["dev"], ctx["state"].params, ctx["state"].batch_stats,
        ctx["env_state"], ctx["hidden"], ctx["masks"], ctx["prev_mem"],
        ctx["key"],
    )
    txt = lowered.compile().as_text()
    with open(path, "w") as f:
        f.write(txt)
    print(f"# HLO written to {path} ({len(txt)} bytes)")
