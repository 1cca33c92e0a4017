"""Checkpoint evaluation (``ppo_trainer.py:1015-1549``): single-env episode
rollouts with deterministic/sampled actions, per-step STFT-L2, optional
waveform quality (SI-SDR family), per-episode metric dumps, and the
far-target POLICY SWITCH (nav policy for the first ``time_thres_for_pol_switch``
steps, quality-improvement policy after — each with its own GRU hidden state;
the acoustic-memory chain continues across the switch as in the reference,
ppo_trainer.py:1093-1129,1230-1339).

Outputs: {split}_stats_{seed}.json with mean/std aggregates and
eval_metrics.pkl with per-episode, per-step metrics — the files the
reference's post-processing notebooks consume (SURVEY.md §2.8); this build
also ships CLI replacements for those notebooks (scripts/)."""

import json
import logging
import os
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from move2hear_tpu.env.micro_scene import MicroSceneBundle, build_micro_scene
from move2hear_tpu.eval.bss import compute_waveform_quality
from move2hear_tpu.eval.metrics import stft_l2_distance
from move2hear_tpu.models.policy import Move2HearPolicy
from move2hear_tpu.ops.frontend import render_binaural_mixture
from move2hear_tpu.utils.checkpoint import load_checkpoint

logger = logging.getLogger(__name__)


def per_goal_distance_columns(scene, episode) -> Dict[str, float]:
    """Per-goal start->goal distance columns of the reference's eval dump
    (ppo_trainer.py:1446-1478): ``geodesic_distance_{i}`` from the episode's
    own info when present, recomputed from the scene graph otherwise, and
    ``euclidean_distance_{i}`` = ||goal_pos - start_pos|| (the reference
    computes it from raw positions at ppo_trainer.py:1455)."""
    cols: Dict[str, float] = {}
    geos = episode.all_geodesic_distances
    start = int(episode.start_node)
    for gi, src in enumerate(episode.source_nodes):
        src = int(src)
        if geos is not None and gi < len(geos):
            g = float(geos[gi])
        elif gi == 0 and episode.geodesic_distance:
            g = float(episode.geodesic_distance)
        else:
            g = float(scene.geodesic_distance(start, src))
        cols[f"geodesic_distance_{gi}"] = g
        cols[f"euclidean_distance_{gi}"] = float(
            np.linalg.norm(scene.positions[src] - scene.positions[start])
        )
    return cols


def _policy_from_config(cfg) -> Move2HearPolicy:
    import jax.numpy as _jnp

    p = cfg.RL.PPO
    return Move2HearPolicy(
        num_actions=len(cfg.TASK_CONFIG.TASK.POSSIBLE_ACTIONS),
        hidden_size=p.hidden_size,
        extra_rgb=cfg.EXTRA_RGB,
        extra_depth=cfg.EXTRA_DEPTH,
        use_ddppo=p.use_ddppo,
        dtype=_jnp.bfloat16
        if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else _jnp.float32,
    )


# (policy static fields, gt_norm, deterministic) -> jitted step: checkpoint
# polling calls evaluate_checkpoint per new ckpt; a fresh jit closure per
# call would recompile every time (jit caches by function identity).
_STEP_FN_CACHE = {}


def _step_fn(policy: Move2HearPolicy, gt_norm: float, deterministic: bool):
    key = (
        policy.num_actions, policy.hidden_size, policy.extra_rgb,
        policy.extra_depth, policy.use_ddppo, str(policy.dtype),
        float(gt_norm), bool(deterministic),
    )
    cached = _STEP_FN_CACHE.get(key)
    if cached is not None:
        return cached

    @jax.jit
    def step(params, batch_stats, bank, host, hidden, masks, prev_mem_masked, rng):
        variables = {"params": params}
        if batch_stats:
            variables = {"params": params, "batch_stats": batch_stats}
        rendered = render_binaural_mixture(
            bank[host["sound_ids"]], host["rirs"], gt_mono_mag_norm=gt_norm
        )
        obs = {
            "mixed_bin_audio_mag": rendered.mixed_bin_audio_mag,
            "gt_bin_comps": rendered.gt_bin_comps,
            "gt_mono_comps": rendered.gt_mono_comps,
            "target_class": host["target_class"],
        }
        if "rgb" in host:
            obs["rgb"] = host["rgb"]
        if "depth" in host:
            obs["depth"] = host["depth"]
        pred_masks = policy.apply(variables, obs, method=Move2HearPolicy.get_binSepMasks)
        pred_mono = policy.apply(
            variables, pred_masks, obs["mixed_bin_audio_mag"],
            method=Move2HearPolicy.convert_bin2mono,
        )
        pred_mem = policy.apply(
            variables, pred_mono, prev_mem_masked,
            method=Move2HearPolicy.get_monoFromMem,
        )
        act = policy.apply(
            variables, obs, hidden, masks, pred_masks, pred_mono, pred_mem,
            rng, deterministic, method=Move2HearPolicy.act,
        )
        bin_l2, mono_l2 = stft_l2_distance(
            obs["mixed_bin_audio_mag"], pred_masks, obs["gt_bin_comps"],
            pred_mono, obs["gt_mono_comps"],
        )
        _, mem_l2 = stft_l2_distance(
            obs["mixed_bin_audio_mag"], pred_masks, obs["gt_bin_comps"],
            pred_mem, obs["gt_mono_comps"],
        )
        extras = {
            "mixed_phase": rendered.mixed_bin_audio_phase,
            "mixed_mag_lin": jnp.expm1(rendered.mixed_bin_audio_mag),
        }
        return obs, pred_mono, pred_mem, act, (bin_l2, mono_l2, mem_l2), extras

    _STEP_FN_CACHE[key] = step
    return step


def evaluate_checkpoint(
    config,
    checkpoint_path: str,
    checkpoint_index: int = 0,
    bundle: Optional[MicroSceneBundle] = None,
    episode_count: Optional[int] = None,
) -> Dict:
    cfg = config
    p = cfg.RL.PPO
    switch = p.switch_policy
    ckpt = load_checkpoint(checkpoint_path)

    policy = _policy_from_config(cfg)
    if switch:
        params_nav = ckpt["params_nav"]
        stats_nav = ckpt.get("batch_stats_nav") or {}
        params_qi = ckpt["params_qualImprov"]
        stats_qi = ckpt.get("batch_stats_qualImprov") or {}
    else:
        params_nav = ckpt["params"]
        stats_nav = ckpt.get("batch_stats") or {}
        params_qi, stats_qi = params_nav, stats_nav

    if bundle is None:
        # Unheard presets name a split with a disjoint sound pool
        # (reference: MONO_DIR repointed to the held-out dir,
        # configs/tasks/*/valUnheard_*.yaml); the synthetic analog is a
        # different procedural pool (micro_scene.py:unheard_sounds)
        unheard = "unheard" in cfg.TASK_CONFIG.DATASET.SPLIT.lower()
        bundle = build_micro_scene(
            rows=4, cols=4, num_episodes=64,
            near_target=not switch and cfg.RL.PPO.sep_reward_weight == 1.0,
            rir_length=cfg.TPU.MAX_RIR_LENGTH,
            unheard_sounds=unheard,
        )
    # eval scene filters (env_utils.py:683-685, dataset.py:134-160)
    episodes = bundle.episodes
    if cfg.EPS_SCENES:
        episodes = episodes.filter_by_scenes(cfg.EPS_SCENES)
    if cfg.EPS_SCENES_N_IDS:
        episodes = episodes.filter_by_scenes_n_ids(dict(cfg.EPS_SCENES_N_IDS))

    gt_norm = cfg.TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM
    env = bundle.make_env_fn(
        episodes=episodes if len(episodes) else None,
        max_episode_steps=cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS,
        with_distance_reward=False,
        eval_mode=True,
        gt_mono_mag_norm=gt_norm,
        possible_actions=tuple(cfg.TASK_CONFIG.TASK.POSSIBLE_ACTIONS),
        seed=cfg.SEED,
        shuffle_episodes=False,
    )()
    bank = jnp.asarray(bundle.audio_db.mono_bank())

    step = _step_fn(policy, gt_norm, p.deterministic_eval)
    hidden_size = p.hidden_size
    n_episodes = episode_count or min(
        cfg.get("EVAL_EPISODE_COUNT", cfg.EVAL.EPISODE_COUNT),
        env.number_of_episodes(),
    )
    time_thres = p.time_thres_for_pol_switch

    key = jax.random.PRNGKey(cfg.SEED)
    stats_episodes = {}
    eval_metrics_dump = {}

    obs_host = _one_env_batch(env.reset())
    hidden_nav = jnp.zeros((1, hidden_size))
    hidden_qi = jnp.zeros((1, hidden_size))
    masks = jnp.zeros((1, 1))
    prev_mem_masked = jnp.zeros((1, 512, 32, 1))

    video_option = list(cfg.get("VIDEO_OPTION", []) or [])
    tb_writer = None
    if "tensorboard" in video_option:
        from move2hear_tpu.utils.tb import TensorboardWriter

        tb_writer = TensorboardWriter(cfg.TENSORBOARD_DIR)

    for ep_idx in range(n_episodes):
        episode = env.current_episode
        ep_steps = 0
        ep_metrics = {"mono_l2": [], "mem_l2": [], "bin_l2": [], "quality": []}
        frames = [] if video_option else None
        done = False
        while not done:
            use_nav = switch and ep_steps < time_thres
            params = params_nav if (not switch or use_nav) else params_qi
            bstats = stats_nav if (not switch or use_nav) else stats_qi
            hidden = hidden_nav if (not switch or use_nav) else hidden_qi

            key, sub = jax.random.split(key)
            obs, pred_mono, pred_mem, act, (bin_l2, mono_l2, mem_l2), extras = (
                step(params, bstats, bank, obs_host, hidden, masks,
                     prev_mem_masked, sub)
            )
            if not switch or use_nav:
                hidden_nav = act.hidden
            else:
                hidden_qi = act.hidden

            ep_metrics["bin_l2"].append(float(bin_l2[0, 0]))
            ep_metrics["mono_l2"].append(float(mono_l2[0, 0]))
            ep_metrics["mem_l2"].append(float(mem_l2[0, 0]))

            if cfg.COMPUTE_EVAL_METRICS:
                gm = np.asarray(obs["gt_mono_comps"])
                spects = {
                    "mixed_bin_audio_mag": np.asarray(extras["mixed_mag_lin"]),
                    "mixed_bin_audio_phase": np.asarray(extras["mixed_phase"]),
                    "gt_mono_mag": gm[..., 0:1],
                    "gt_mono_phase": gm[..., 1:2],
                    "pred_mono": np.asarray(pred_mono),
                    "pred_monoFromMem": np.asarray(pred_mem),
                }
                ep_metrics["quality"].append(
                    compute_waveform_quality(
                        spects, cfg.EVAL_METRICS_TO_COMPUTE
                    )
                )

            if frames is not None and "rgb" in obs_host:
                frames.append(obs_host["rgb"][0].astype(np.uint8))

            action = int(np.asarray(act.action)[0, 0])
            next_obs, reward, done, info = env.step(action)
            ep_steps += 1
            masks = jnp.asarray([[0.0 if done else 1.0]])
            prev_mem_masked = pred_mem * masks[:, :, None, None]
            obs_host = _one_env_batch(next_obs)

        stats_episodes[(episode.scene_id, episode.episode_id)] = {
            "mono_l2_last": ep_metrics["mono_l2"][-1],
            "mono_l2_all": float(np.mean(ep_metrics["mono_l2"])),
            "mem_l2_last": ep_metrics["mem_l2"][-1],
            "mem_l2_all": float(np.mean(ep_metrics["mem_l2"])),
            "bin_l2_all": float(np.mean(ep_metrics["bin_l2"])),
            **info,
            **per_goal_distance_columns(
                bundle.scenes[episode.scene_id], episode
            ),
        }
        eval_metrics_dump[(episode.scene_id, episode.episode_id)] = ep_metrics
        if frames:
            if tb_writer is not None:
                tb_writer.add_video_from_np_images(
                    f"episode_{episode.scene_id}_{episode.episode_id}",
                    checkpoint_index, frames, fps=4,
                )
            if "disk" in video_option:
                vid_dir = os.path.join(cfg.MODEL_DIR or ".", "videos")
                os.makedirs(vid_dir, exist_ok=True)
                np.save(
                    os.path.join(
                        vid_dir,
                        f"ep_{episode.scene_id}_{episode.episode_id}.npy",
                    ),
                    np.stack(frames),
                )
        hidden_nav = jnp.zeros((1, hidden_size))
        hidden_qi = jnp.zeros((1, hidden_size))

    # aggregate + dump (ppo_trainer.py:1484-1518)
    agg = {}
    for k in next(iter(stats_episodes.values())):
        vals = [v[k] for v in stats_episodes.values() if np.isscalar(v[k])]
        if vals:
            agg[k] = {"mean": float(np.mean(vals)), "std": float(np.std(vals))}
    out_dir = cfg.MODEL_DIR or "."
    os.makedirs(out_dir, exist_ok=True)
    split = cfg.EVAL.SPLIT
    with open(
        os.path.join(out_dir, f"{split}_stats_ckpt_{checkpoint_index}_{cfg.SEED}.json"),
        "w",
    ) as f:
        json.dump(agg, f, indent=2)
    with open(os.path.join(out_dir, f"eval_metrics_ckpt_{checkpoint_index}.pkl"), "wb") as f:
        pickle.dump(
            {str(k): v for k, v in eval_metrics_dump.items()}, f
        )
    logger.info(
        "eval ckpt %s: mono L2 last %.4f±%.4f | monoFromMem L2 last %.4f±%.4f",
        checkpoint_index,
        agg["mono_l2_last"]["mean"], agg["mono_l2_last"]["std"],
        agg["mem_l2_last"]["mean"], agg["mem_l2_last"]["std"],
    )
    return agg


def _one_env_batch(obs) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in obs.items():
        arr = np.asarray(v)[None]
        out[k] = arr.astype(np.int32 if arr.dtype.kind in "iu" else np.float32)
    return out


def merge_switch_policy_checkpoint(
    nav_ckpt_path: str, qual_improv_ckpt_path: str, out_path: str
):
    """CLI replacement for the ckpt-merge notebook
    (scripts/farTarget_eval/copy_individualCkptsNCfgs_switchPolicyEval.ipynb):
    bundle nav + quality-improvement policies into one switch-eval ckpt."""
    from move2hear_tpu.utils.checkpoint import save_checkpoint

    nav = load_checkpoint(nav_ckpt_path)
    qi = load_checkpoint(qual_improv_ckpt_path)
    save_checkpoint(
        out_path,
        {
            "params_nav": nav["params"],
            "batch_stats_nav": nav.get("batch_stats") or {},
            "params_qualImprov": qi["params"],
            "batch_stats_qualImprov": qi.get("batch_stats") or {},
            "config": {
                "config_nav": nav.get("config"),
                "config_qualImprov": qi.get("config"),
            },
        },
    )
    return out_path
