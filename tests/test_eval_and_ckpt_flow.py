"""End-to-end eval + checkpoint flows on tiny shapes (CPU):
pretrain -> RL weight handoff, checkpoint evaluation (incl. switch policy),
ckpt polling, and the notebook-replacement CLIs."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from move2hear_tpu.config import get_config
from move2hear_tpu.env.micro_scene import build_micro_scene
from move2hear_tpu.eval.evaluator import (
    evaluate_checkpoint,
    merge_switch_policy_checkpoint,
)
from move2hear_tpu.models import Move2HearPolicy
from move2hear_tpu.rl.ppo import PPOConfig, create_agent_state
from move2hear_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from move2hear_tpu.utils.misc import poll_checkpoint_folder


HID = 64


def _make_ckpt(path, cfg, seed=0):
    policy = Move2HearPolicy(
        num_actions=len(cfg.TASK_CONFIG.TASK.POSSIBLE_ACTIONS),
        hidden_size=HID,
        use_ddppo=True,
    )
    obs = {
        "rgb": jnp.zeros((1, 128, 128, 3)),
        "depth": jnp.zeros((1, 128, 128, 1)),
        "mixed_bin_audio_mag": jnp.zeros((1, 512, 32, 2)),
        "target_class": jnp.zeros((1, 1), jnp.int32),
    }
    variables = policy.init(
        jax.random.PRNGKey(seed), obs, jnp.zeros((1, HID)), jnp.ones((1, 1))
    )
    state = create_agent_state(PPOConfig(), variables)
    save_checkpoint(
        path,
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "extra_state": {"update_count": 0},
            "config": cfg.to_dict(),
        },
    )
    return path


@pytest.fixture(scope="module")
def bundle():
    return build_micro_scene(rows=3, cols=3, num_episodes=4, rir_length=400)


def test_evaluate_checkpoint_end_to_end(tmp_path, bundle):
    cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "RL.PPO.hidden_size", str(HID),
            "RL.PPO.use_ddppo", "True",  # BN-free AcousticMem, as eval presets
            "EVAL_EPISODE_COUNT", "2",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "3",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
            "COMPUTE_EVAL_METRICS", "True",
            "EVAL_METRICS_TO_COMPUTE", "['si_sdr', 'si_sdri']",
        ],
    )
    ckpt = _make_ckpt(str(tmp_path / "data" / "ckpt.0.pth"), cfg)
    agg = evaluate_checkpoint(cfg, ckpt, 0, bundle=bundle)
    assert "mono_l2_last" in agg and "mem_l2_last" in agg
    assert np.isfinite(agg["mono_l2_last"]["mean"])
    # reference stats_episodes per-goal columns (ppo_trainer.py:1446-1478)
    assert np.isfinite(agg["geodesic_distance_0"]["mean"])
    assert np.isfinite(agg["euclidean_distance_0"]["mean"])
    stats_files = [f for f in os.listdir(tmp_path) if f.endswith(".json")]
    assert stats_files, "no stats dump written"
    pkl_files = [f for f in os.listdir(tmp_path) if f.endswith(".pkl")]
    assert pkl_files, "no eval metrics dump written"

    # best-ckpt CLI reads the dumps
    out = subprocess.run(
        [sys.executable, "scripts/best_ckpt.py", str(tmp_path),
         "--metric", "mem_l2_last", "--split", "val"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert out.returncode == 0, out.stderr
    best = json.loads(out.stdout)
    assert best["best_ckpt_index"] == 0


def test_switch_policy_eval(tmp_path, bundle):
    cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "RL.PPO.hidden_size", str(HID),
            "RL.PPO.use_ddppo", "True",
            "RL.PPO.switch_policy", "True",
            "RL.PPO.time_thres_for_pol_switch", "2",
            "EVAL_EPISODE_COUNT", "1",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "4",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ],
    )
    nav = _make_ckpt(str(tmp_path / "nav.pth"), cfg, seed=1)
    qi = _make_ckpt(str(tmp_path / "qi.pth"), cfg, seed=2)
    merged = merge_switch_policy_checkpoint(
        nav, qi, str(tmp_path / "switch.pth")
    )
    ckpt = load_checkpoint(merged)
    assert "params_nav" in ckpt and "params_qualImprov" in ckpt

    agg = evaluate_checkpoint(cfg, merged, 0, bundle=bundle)
    assert np.isfinite(agg["mem_l2_last"]["mean"])


def test_pretrain_to_rl_weight_handoff(tmp_path, bundle):
    """The passive pretrain ckpt loads into the RL policy by subtree name and
    freezes (ppo_trainer.py:543-577 / ppo.py:59-70)."""
    from move2hear_tpu.models import Move2HearPassiveWoMemoryPolicy
    from move2hear_tpu.rl.ppo import load_pretrained_passive_separators

    passive = Move2HearPassiveWoMemoryPolicy()
    pv = passive.init(
        jax.random.PRNGKey(7),
        {
            "mixed_bin_audio_mag": jnp.zeros((1, 512, 32, 2)),
            "target_class": jnp.zeros((1, 1), jnp.int32),
        },
        train=False,
    )
    ckpt_path = str(tmp_path / "best_ckpt_val.pth")
    save_checkpoint(
        ckpt_path,
        {
            "params": pv["params"],
            "batch_stats": pv.get("batch_stats", {}),
            "config": {},
        },
    )

    ckpt = load_checkpoint(ckpt_path)
    cfg = get_config(model_dir=str(tmp_path), opts=["RL.PPO.hidden_size", str(HID)])
    policy = Move2HearPolicy(num_actions=3, hidden_size=HID, use_ddppo=True)
    obs = {
        "rgb": jnp.zeros((1, 128, 128, 3)),
        "depth": jnp.zeros((1, 128, 128, 1)),
        "mixed_bin_audio_mag": jnp.zeros((1, 512, 32, 2)),
        "target_class": jnp.zeros((1, 1), jnp.int32),
    }
    variables = policy.init(
        jax.random.PRNGKey(0), obs, jnp.zeros((1, HID)), jnp.ones((1, 1))
    )
    new_params = load_pretrained_passive_separators(
        variables["params"], ckpt["params"]
    )
    for key in ("binSep_enc", "binSep_dec", "bin2mono_enc", "bin2mono_dec"):
        for a, b in zip(
            jax.tree.leaves(new_params[key]), jax.tree.leaves(ckpt["params"][key])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_poll_checkpoint_folder(tmp_path):
    d = tmp_path / "ckpts"
    d.mkdir()
    assert poll_checkpoint_folder(str(d), -1) is None
    import time
    for i in range(3):
        (d / f"ckpt.{i}.pth").write_bytes(b"x")
        time.sleep(0.02)
    assert poll_checkpoint_folder(str(d), -1).endswith("ckpt.0.pth")
    assert poll_checkpoint_folder(str(d), 0).endswith("ckpt.1.pth")
    assert poll_checkpoint_folder(str(d), 2) is None
    # eval_interval skipping
    assert poll_checkpoint_folder(str(d), -1, eval_interval=2).endswith("ckpt.1.pth")


def test_eval_video_option_disk(tmp_path, bundle):
    cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "RL.PPO.hidden_size", str(HID),
            "RL.PPO.use_ddppo", "True",
            "EVAL_EPISODE_COUNT", "1",
            "VIDEO_OPTION", "['disk']",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "2",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ],
    )
    ckpt = _make_ckpt(str(tmp_path / "data" / "ckpt.0.pth"), cfg)
    evaluate_checkpoint(cfg, ckpt, 0, bundle=bundle)
    vids = os.listdir(tmp_path / "videos")
    assert vids and vids[0].endswith(".npy")
    frames = np.load(tmp_path / "videos" / vids[0])
    assert frames.shape[1:] == (128, 128, 3) and frames.dtype == np.uint8


def test_setup_eval_config_priority(tmp_path):
    """Merge priority eval_opts > ckpt_opts > eval_cfg > ckpt_cfg
    (base_trainer.py:104-140), incl. the outdated-config fallback."""
    from move2hear_tpu.rl.base_trainer import BaseRLTrainer

    ckpt_cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "5",
            "SEED", "7",
        ],
    ).to_dict()
    eval_cfg = get_config(model_dir=str(tmp_path), opts=["SEED", "9"])

    merged = BaseRLTrainer._setup_eval_config(ckpt_cfg, eval_cfg)
    # a key set only via the ckpt's CLI opts survives the eval-config merge
    assert merged.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS == 5
    # eval CLI opts outrank ckpt CLI opts
    assert merged.SEED == 9

    stale = {"CMD_TRAILING_OPTS": ["NO.SUCH.KEY", "1"], "SEED": 3}
    merged2 = BaseRLTrainer._setup_eval_config(stale, eval_cfg)
    assert merged2.SEED == 9  # fell back to the eval config


def test_eval_routes_to_device_evaluator(tmp_path, bundle):
    """_eval_checkpoint must use the batched device evaluator for large
    EVAL_EPISODE_COUNT (round-1 always took the 1-env host path)."""
    from move2hear_tpu.rl.trainer import PPOTrainer

    cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "RL.PPO.hidden_size", str(HID),
            "RL.PPO.use_ddppo", "True",
            "EVAL_EPISODE_COUNT", "64",
            "COMPUTE_EVAL_METRICS", "True",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "3",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ],
    )
    ckpt = _make_ckpt(str(tmp_path / "data" / "ckpt.0.pth"), cfg)
    trainer = PPOTrainer(cfg, bundle=bundle)
    agg = trainer._eval_checkpoint(ckpt, 0)
    assert np.isfinite(agg["mem_l2_last"]["mean"])
    # SI metrics in the aggregate exist only on the device-evaluator path
    assert "mono_si_sdr_last" in agg


def test_link_ckpts_cli(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    for i in range(7):
        (src / f"ckpt.{i}.pth").write_bytes(b"x")
    out = subprocess.run(
        [sys.executable, "scripts/link_ckpts.py", str(src), str(dst),
         "--every", "3"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert out.returncode == 0, out.stderr
    links = sorted(os.listdir(dst))
    assert links == ["ckpt.0.pth", "ckpt.1.pth", "ckpt.2.pth"]
    # dense renumbering in source order: 0, 3, 6
    assert os.readlink(dst / "ckpt.1.pth").endswith("ckpt.3.pth")


def test_separation_quality_cli(tmp_path):
    import pickle

    # host-evaluator layout
    dump = {
        ("s", i): {
            "mono_l2": [0.5, 0.4 + i * 0.1],
            "mem_l2": [0.6, 0.3],
            "bin_l2": [0.2, 0.1],
            "quality": [
                {"mono": {"si_sdr": 1.0}, "monoFromMem": {"si_sdr": 2.0}},
                {"mono": {"si_sdr": 3.0 + i}, "monoFromMem": {"si_sdr": 4.0}},
            ],
        }
        for i in range(2)
    }
    with open(tmp_path / "eval_metrics_ckpt_0.pkl", "wb") as f:
        pickle.dump(dump, f)
    out = subprocess.run(
        [sys.executable, "scripts/separation_quality.py", str(tmp_path),
         "--metrics", "si_sdr"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert out.returncode == 0, out.stderr
    summary = json.loads(out.stdout)
    assert summary["mono_si_sdr_last"]["mean"] == 3.5
    assert summary["mem_l2_last"]["n"] == 2

    # device-evaluator layout
    dump2 = {0: {"mono_l2": np.ones((3, 4)), "mem_l2": np.zeros((3, 4))}}
    with open(tmp_path / "eval_metrics_ckpt_1.pkl", "wb") as f:
        pickle.dump(dump2, f)
    out2 = subprocess.run(
        [sys.executable, "scripts/separation_quality.py", str(tmp_path),
         "--ckpt", "1"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert out2.returncode == 0, out2.stderr
    summary2 = json.loads(out2.stdout)
    assert summary2["mono_l2_last"]["n"] == 4
