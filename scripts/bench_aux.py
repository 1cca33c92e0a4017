#!/usr/bin/env python3
"""Auxiliary throughput benchmarks on the current chip: the batched device
evaluator and the passive-pretrain loop (the RL training loop is bench.py).
One JSON line per benchmark.

    python scripts/bench_aux.py eval [--episodes 512] [--batch-envs 64]
    python scripts/bench_aux.py pretrain [--epochs 4] [--batch 64]

Run exclusively on the chip (the tunnel serializes concurrent jobs).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench_eval(episodes: int, batch_envs: int) -> dict:
    from move2hear_tpu.config import get_config
    from move2hear_tpu.env.micro_scene import build_micro_scene
    from move2hear_tpu.eval.device_evaluator import evaluate_checkpoint_device
    from move2hear_tpu.models import Move2HearPolicy
    from move2hear_tpu.utils.checkpoint import save_checkpoint

    tmp = tempfile.mkdtemp()
    cfg = get_config(model_dir=tmp, run_type="eval", opts=[
        "NUM_PROCESSES", "1",
        "RL.PPO.use_ddppo", "True",
        "EVAL_EPISODE_COUNT", str(episodes),
        "COMPUTE_EVAL_METRICS", "True",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "20",
        "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
    ])
    policy = Move2HearPolicy(num_actions=3, hidden_size=512, use_ddppo=True)
    obs = {
        "rgb": jnp.zeros((1, 128, 128, 3)),
        "depth": jnp.zeros((1, 128, 128, 1)),
        "mixed_bin_audio_mag": jnp.zeros((1, 512, 32, 2)),
        "target_class": jnp.zeros((1, 1), jnp.int32),
    }
    v = policy.init(
        jax.random.PRNGKey(0), obs, jnp.zeros((1, 512)), jnp.ones((1, 1))
    )
    ck = os.path.join(tmp, "ckpt.0.pth")
    save_checkpoint(ck, {
        "params": v["params"], "batch_stats": v.get("batch_stats") or {},
        "extra_state": {"update_count": 0}, "config": cfg.to_dict(),
    })
    bundle = build_micro_scene(
        rows=4, cols=4, num_episodes=max(64, episodes), near_target=True,
        rir_length=16000,
    )
    # first call pays bank upload + compile (the program cache absorbs it
    # for every later checkpoint of a polling run); report the warm number
    evaluate_checkpoint_device(
        cfg, ck, bundle=bundle, episode_count=episodes, batch_envs=batch_envs
    )
    t0 = time.time()
    evaluate_checkpoint_device(
        cfg, ck, bundle=bundle, episode_count=episodes, batch_envs=batch_envs
    )
    dt = time.time() - t0
    steps = episodes * cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS
    return {
        "metric": "eval_episodes_per_sec",
        "value": round(episodes / dt, 2),
        "unit": "episodes/s",
        "detail": {
            "episodes": episodes, "batch_envs": batch_envs,
            "env_steps_per_sec": round(steps / dt, 1),
            "warm_seconds": round(dt, 1),
        },
    }


def bench_pretrain(epochs: int, batch: int) -> dict:
    import logging

    logging.disable(logging.INFO)
    from move2hear_tpu.config import get_config
    from move2hear_tpu.pretrain.trainer import PassiveTrainer

    cfg = get_config(model_dir=tempfile.mkdtemp(), opts=[
        "TRAINER_NAME", "passive",
        "Pretrain.Passive.NUM_EPOCHS", str(epochs),
        "Pretrain.Passive.BATCH_SIZE", str(batch),
        "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
    ])
    t = PassiveTrainer(cfg)
    steps = t._steps_per_epoch

    t0 = time.time()
    t.train()
    total = time.time() - t0
    # epoch 0 pays the compile; the mean over all epochs is therefore a
    # LOWER bound on steady-state (see docs/ROUND2_NOTES.md for the steady
    # per-epoch number)
    items = epochs * steps * batch
    return {
        "metric": "pretrain_items_per_sec_incl_compile",
        "value": round(items / total, 2),
        "unit": "items/s",
        "detail": {
            "epochs": epochs, "steps_per_epoch": steps, "batch": batch,
            "total_seconds": round(total, 1),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    pe = sub.add_parser("eval")
    pe.add_argument("--episodes", type=int, default=512)
    pe.add_argument("--batch-envs", type=int, default=64)
    pp = sub.add_parser("pretrain")
    pp.add_argument("--epochs", type=int, default=4)
    pp.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    if args.mode == "eval":
        out = bench_eval(args.episodes, args.batch_envs)
    else:
        out = bench_pretrain(args.epochs, args.batch)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
