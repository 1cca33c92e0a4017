"""E2E drive of the device-evaluator surface on the real TPU (micro-scene):
evaluates a checkpoint left by .verify_trainer.py (run that first)."""
import logging, os, time
logging.basicConfig(level=logging.INFO, format="%(message)s")
from move2hear_tpu.config import get_config
from move2hear_tpu.env.micro_scene import build_micro_scene
from move2hear_tpu.eval.device_evaluator import evaluate_checkpoint_device

ckpt = "/tmp/m2h_rl_run/data/ckpt.0.pth"
assert os.path.exists(ckpt), "run .verify_trainer.py first"
cfg = get_config(model_dir="/tmp/m2h_rl_eval", opts=[
    "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "4",
    "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
    "EVAL_EPISODE_COUNT", "8",
    "COMPUTE_EVAL_METRICS", "True",
    # must match the ckpt's model config (the CLI eval flow merges the
    # ckpt's saved config; this direct-API drive sets it explicitly)
    "RL.PPO.use_ddppo", "True",
], run_type="eval")
bundle = build_micro_scene(rows=4, cols=4, num_episodes=32, near_target=True, rir_length=1000)
t0 = time.time()
stats = evaluate_checkpoint_device(cfg, ckpt, bundle=bundle, batch_envs=4)
print(f"eval in {time.time()-t0:.1f}s; keys: {sorted(stats)[:6]}")
for k in ("bin_l2_all", "mono_l2_last", "mem_l2_last",
          "mono_si_sdr_last", "monoFromMem_si_sdr_last"):
    assert k in stats, stats.keys()
    v = stats[k]
    v = float(v["mean"]) if isinstance(v, dict) else float(v)
    assert v == v, (k, v)  # finite
print("DEVICE EVAL E2E OK")
