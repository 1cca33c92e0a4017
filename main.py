#!/usr/bin/env python3
"""CLI entry point (reference: ``main.py:20-78``): build config, resolve
trainer from the registry, dispatch train/eval.

    python main.py --run-type train --exp-config configs/pretrain_passive.yaml \
        --model-dir /tmp/run [DOTTED.KEY value ...]
"""

import argparse
import logging


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--run-type", choices=["train", "eval"], default="train",
        help="run type of the experiment (train or eval)",
    )
    parser.add_argument(
        "--exp-config", type=str, default=None,
        help="path to experiment config yaml",
    )
    parser.add_argument("--model-dir", default=None, help="output dir")
    parser.add_argument(
        "--eval-interval", type=int, default=1,
        help="evaluation interval of checkpoints",
    )
    parser.add_argument(
        "--prev-ckpt-ind", type=int, default=-1,
        help="index of the last evaluated checkpoint",
    )
    parser.add_argument(
        "opts", default=None, nargs=argparse.REMAINDER,
        help="dotted-key config overrides",
    )
    args = parser.parse_args()

    from move2hear_tpu.config import get_config
    from move2hear_tpu.utils.registry import registry

    # trainers self-register on import
    import move2hear_tpu.pretrain.trainer  # noqa: F401
    import move2hear_tpu.rl.trainer  # noqa: F401

    config = get_config(args.exp_config, args.opts, args.model_dir, args.run_type)
    trainer_cls = registry.get_trainer(config.TRAINER_NAME)
    assert trainer_cls is not None, f"{config.TRAINER_NAME} is not supported"

    # distributed control plane (ddppo_utils.py:43-56,117-165): multi-process
    # rendezvous BEFORE any backend touch, then preemption signal handlers
    # (SIGINT/SIGTERM/SIGUSR2 -> clean exit; SIGUSR1 -> requeue).
    from move2hear_tpu.parallel.ddppo import add_signal_handlers, init_distributed

    ppo = config.RL.PPO
    init_distributed(ppo.master_addr, ppo.master_port)
    add_signal_handlers()

    level = logging.DEBUG if config.DEBUG else logging.INFO
    logging.basicConfig(
        level=level,
        format="%(asctime)s, %(levelname)s: %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    trainer = trainer_cls(config)
    if args.run_type == "train":
        trainer.train()
    else:
        trainer.eval(args.eval_interval, args.prev_ckpt_ind)


if __name__ == "__main__":
    main()
