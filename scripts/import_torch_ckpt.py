#!/usr/bin/env python3
"""Import a reference (PyTorch) Move2Hear checkpoint into move2hear_tpu's
checkpoint format, so models trained with
SAGNIKMJR/move2hear-active-AV-separation evaluate/resume here directly.

Handles all three reference checkpoint layouts (auto-detected):
  - RL agent ckpts  ``ckpt.N.pth``: {"state_dict": agent.state_dict(), ...}
  - passive pretrain ``best_ckpt_*.pth``: separator-only state_dict
  - switch-policy ckpts: {"state_dict_nav", "state_dict_qualImprov", ...}

Weight-layout conversion (conv/convT/linear/GRU transposes, NCHW-flatten
reorders, BatchNorm stats) lives in move2hear_tpu/utils/torch_import.py and
is parity-tested against the reference's own torch forwards
(tests/test_torch_oracle.py).

Usage:
    python scripts/import_torch_ckpt.py IN.pth OUT.ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _to_numpy_sd(sd):
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}


def _detect_use_ddppo(sd):
    # the DDPPO AcousticMem variant has no BatchNorm (memory_nets.py:11-24)
    return not any(
        k.endswith("acoustic_mem.cnn.1.running_mean") for k in sd
    )


def _convert_one(sd):
    from move2hear_tpu.utils import torch_import as ti

    if any(k.startswith("actor_critic.pol_net.") for k in sd):
        use_ddppo = _detect_use_ddppo(sd)
        params, stats = ti.convert_agent_state_dict(sd, use_ddppo=use_ddppo)
        kind = f"agent(use_ddppo={use_ddppo})"
    else:
        params, stats = ti.convert_passive_state_dict(sd)
        kind = "passive"
    return params, stats, kind


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_ckpt")
    args = ap.parse_args()

    import torch

    from move2hear_tpu.utils.checkpoint import save_checkpoint

    raw = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)

    if "state_dict_nav" in raw:
        pn, sn, kn = _convert_one(_to_numpy_sd(raw["state_dict_nav"]))
        pq, sq, kq = _convert_one(_to_numpy_sd(raw["state_dict_qualImprov"]))
        save_checkpoint(
            args.out_ckpt,
            {
                "params_nav": pn,
                "batch_stats_nav": sn,
                "params_qualImprov": pq,
                "batch_stats_qualImprov": sq,
                "config": {
                    "imported_from": os.path.abspath(args.torch_ckpt),
                    "config_nav": repr(raw.get("config_nav")),
                    "config_qualImprov": repr(raw.get("config_qualImprov")),
                },
            },
        )
        print(f"imported switch ckpt ({kn} + {kq}) -> {args.out_ckpt}")
        return

    sd = _to_numpy_sd(raw["state_dict"] if "state_dict" in raw else raw)
    params, stats, kind = _convert_one(sd)
    save_checkpoint(
        args.out_ckpt,
        {
            "params": params,
            "batch_stats": stats,
            "extra_state": {"update_count": 0},
            "config": {
                "imported_from": os.path.abspath(args.torch_ckpt),
                "torch_config": repr(raw.get("config")),
            },
        },
    )
    print(f"imported {kind} ckpt -> {args.out_ckpt}")


if __name__ == "__main__":
    main()
