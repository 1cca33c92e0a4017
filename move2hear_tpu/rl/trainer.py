"""The PPO/DDPPO trainer (``audio_separation/rl/ppo/ppo_trainer.py``),
redesigned for TPU.

Host/device split (SURVEY.md §7 "hard parts"): the host only walks the graph
and gathers RIR bytes; ONE fused jitted call per rollout step does audio
rendering (RIR conv + STFT), the full separator chain, the acoustic memory,
the policy act, per-step STFT-L2 logging stats, and the separation-reward
utility. The reference instead pays host FFTs in 14 worker processes plus two
extra no_grad forwards per step (ppo_trainer.py:294-374); here the "next
step" forward IS the next iteration's forward (the memory-chain carry makes
them identical, see _collect note below), halving separator compute.

Reward override semantics (env_utils.py:690-714, ppo_trainer.py:383-405):
  quality_improvement: r_t = q(mem_{t+1}, gt_{t+1}) - q(mem_t, gt_t) with
  q(m, g) = -MSE(m, g) / mean(g^2); 0 for done envs; a x10 extra bonus of
  q(mem_{t+1}, gt_{t+1}) at episode step MAX-2. Rewards are therefore
  finalized one iteration late, then written into the rollout.

Cyclic schedule (ppo_trainer.py:730-994): num_updates_per_cycle x
(collect num_steps + update_pol), then num_updates_per_cycle x update_sep
over the accumulated long separator buffer.

Multi-chip: rollout buffers shard their env axis over the data mesh; params
replicate. XLA then inserts gradient/stat collectives in the jitted updates —
DDP allreduce and distributed_mean_and_var fall out of sharding propagation
(SURVEY.md §2.9). Preemptive rollout sync is host-side (parallel/ddppo.py).
"""

import logging
import os
import time
from collections import deque
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from move2hear_tpu.env.micro_scene import MicroSceneBundle, build_micro_scene
from move2hear_tpu.env.vector_env import construct_envs
from move2hear_tpu.eval.metrics import stft_l2_distance
from move2hear_tpu.models.policy import ActOutput, Move2HearPolicy
from move2hear_tpu.ops.frontend import render_binaural_mixture
from move2hear_tpu.parallel.ddppo import RolloutSyncState, get_distrib_info
from move2hear_tpu.parallel.mesh import (
    collective_any,
    fetch_to_host,
    make_mesh,
    replicate,
    shard_env_batch,
    shard_rollouts,
)
from move2hear_tpu.rl.base_trainer import BaseRLTrainer
from move2hear_tpu.rl.gae import compute_returns
from move2hear_tpu.rl.ppo import (
    PPOConfig,
    create_agent_state,
    load_pretrained_passive_separators,
    make_update_pol,
    make_update_sep,
)
from move2hear_tpu.rl.rollout import (
    after_update_pol,
    after_update_sep,
    create_rollout_pol,
    create_rollout_sep,
    insert_pol,
    insert_sep,
)
from move2hear_tpu.utils.checkpoint import (
    load_checkpoint,
    load_checkpoint_if_compatible,
    save_checkpoint,
    tree_shapes_match as _tree_shapes_match,
)
from move2hear_tpu.utils.misc import linear_decay
from move2hear_tpu.utils.registry import registry

logger = logging.getLogger(__name__)


@registry.register_trainer(name="ppo")
class PPOTrainer(BaseRLTrainer):
    def __init__(self, config, bundle: Optional[MicroSceneBundle] = None):
        super().__init__(config)
        self._bundle = bundle
        self._obs_shapes = None
        self.actor_critic: Optional[Move2HearPolicy] = None

    def _dtype(self):
        import jax.numpy as _jnp

        return (
            _jnp.bfloat16
            if self.config.TPU.COMPUTE_DTYPE == "bfloat16"
            else _jnp.float32
        )

    # ------------------------------------------------------------------
    def _ppo_config(self) -> PPOConfig:
        p = self.config.RL.PPO
        return PPOConfig(
            clip_param=p.clip_param,
            ppo_epoch=p.ppo_epoch,
            num_mini_batch=p.num_mini_batch,
            value_loss_coef=p.value_loss_coef,
            entropy_coef=p.entropy_coef,
            lr_pol=p.lr_pol,
            lr_sep=p.lr_sep,
            eps=p.eps,
            max_grad_norm=p.max_grad_norm,
            use_gae=p.use_gae,
            gamma=p.gamma,
            tau=p.tau,
        )

    def _make_bundle(self) -> MicroSceneBundle:
        if self._bundle is not None:
            return self._bundle
        cfg = self.config
        from move2hear_tpu.env.bundle import (
            bundle_from_config,
            has_file_backed_data,
        )

        if has_file_backed_data(cfg.TASK_CONFIG):
            # EPS_SCENES restricts the TRAIN scene set (env_utils.py:552-553);
            # eval-side scene filtering happens in the evaluators
            scenes = (
                list(cfg.EPS_SCENES)
                if cfg.EPS_SCENES
                and cfg.TASK_CONFIG.DATASET.SPLIT[:5] == "train"
                else None
            )
            self._bundle = bundle_from_config(
                cfg.TASK_CONFIG, scenes=scenes,
                max_rir_length=cfg.TPU.MAX_RIR_LENGTH,
            )
            return self._bundle
        # Without external data, fall back to the synthetic micro-scene.
        logger.warning("no scene bundle provided; using synthetic micro-scene")
        near = cfg.RL.PPO.sep_reward_weight == 1.0
        self._bundle = build_micro_scene(
            rows=4, cols=4, num_episodes=64, near_target=near,
            rir_length=cfg.TPU.MAX_RIR_LENGTH,
        )
        return self._bundle

    def _make_envs(self, world_rank: int, world_size: int):
        bundle = self._make_bundle()
        cfg = self.config
        n = cfg.NUM_PROCESSES
        near = cfg.RL.PPO.sep_reward_weight == 1.0 and cfg.RL.PPO.nav_reward_weight == 0.0

        # episode assignment per env: multi-scene bundles split SCENES
        # round-robin over the global env set (env_utils.py:556-567, incl.
        # the scenes >= processes assert and the train-split shuffle);
        # single-scene bundles split episodes instead (the micro-scene has
        # one scene but plenty of episodes).
        scene_names = list(bundle.scenes)
        total_envs = world_size * n
        if len(scene_names) > 1:
            from move2hear_tpu.env.bundle import split_scenes_round_robin

            scene_splits = split_scenes_round_robin(
                scene_names, total_envs,
                shuffle=cfg.TASK_CONFIG.DATASET.SPLIT[:5] == "train",
                seed=cfg.SEED,
            )
            per_env_episodes = [
                bundle.episodes.filter_by_scenes(
                    scene_splits[world_rank * n + i]
                )
                for i in range(n)
            ]
        else:
            per_env_episodes = [
                bundle.episodes.split_for_rank(
                    (world_rank * n + i) % max(1, len(bundle.episodes)),
                    max(1, min(total_envs, len(bundle.episodes))),
                )
                if len(bundle.episodes) >= total_envs
                else bundle.episodes
                for i in range(n)
            ]

        env_fns = []
        for i in range(n):
            # per-rank, per-env seeds (ppo_trainer.py:605-613)
            seed = cfg.SEED + world_rank * n + i
            env_fns.append(
                bundle.make_env_fn(
                    max_episode_steps=cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS,
                    with_distance_reward=cfg.RL.WITH_DISTANCE_REWARD and not near,
                    distance_reward_scale=cfg.RL.DISTANCE_REWARD_SCALE,
                    gt_mono_mag_norm=cfg.TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM,
                    possible_actions=tuple(cfg.TASK_CONFIG.TASK.POSSIBLE_ACTIONS),
                    seed=seed,
                    episodes=per_env_episodes[i],
                )
            )
        self._wav_bank = bundle.audio_db.mono_bank()
        # env_utils.py:608-616 dispatch; the reference's ThreadedVectorEnv
        # debug fallback maps to the sync implementation here
        use_sync = cfg.USE_SYNC_VECENV or not cfg.USE_VECENV
        return construct_envs(env_fns, use_sync=use_sync), bundle

    # ------------------------------------------------------------------
    def _build_rollout_step(self, policy: Move2HearPolicy, gt_mono_mag_norm: float):
        """One fused device program per env step."""

        @jax.jit
        def rollout_step(params, batch_stats, bank, host, hidden, masks,
                         prev_mem_masked, rng):
            variables = {"params": params}
            if batch_stats:
                variables = {"params": params, "batch_stats": batch_stats}

            rendered = render_binaural_mixture(
                bank[host["sound_ids"]], host["rirs"],
                gt_mono_mag_norm=gt_mono_mag_norm,
                # the training loop consumes phases only via the same-phase
                # stft_l2_distance, which is phase-independent — zero phases
                # DCE the atan2 work (ops/frontend._bin_and_mix)
                mags_only=True,
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

            pred_masks = policy.apply(
                variables, obs, method=Move2HearPolicy.get_binSepMasks
            )
            pred_mono = policy.apply(
                variables, pred_masks, obs["mixed_bin_audio_mag"],
                method=Move2HearPolicy.convert_bin2mono,
            )
            pred_mem = policy.apply(
                variables, pred_mono, prev_mem_masked,
                method=Move2HearPolicy.get_monoFromMem,
            )
            act: ActOutput = policy.apply(
                variables, obs, hidden, masks, pred_masks, pred_mono, pred_mem,
                rng, False, method=Move2HearPolicy.act,
            )

            gt_mono_mag = obs["gt_mono_comps"][..., 0::2][..., :1]
            # separation-reward utility q = -MSE/mean(gt^2) (env_utils.py:709-714)
            mse = jnp.mean(
                jnp.square(pred_mem - gt_mono_mag), axis=(1, 2, 3)
            )
            gt_pow = jnp.mean(jnp.square(gt_mono_mag), axis=(1, 2, 3))
            q = -mse / jnp.maximum(gt_pow, 1e-12)

            bin_l2, mono_l2 = stft_l2_distance(
                obs["mixed_bin_audio_mag"], pred_masks, obs["gt_bin_comps"],
                pred_mono, obs["gt_mono_comps"],
            )
            _, mem_l2 = stft_l2_distance(
                obs["mixed_bin_audio_mag"], pred_masks, obs["gt_bin_comps"],
                pred_mem, obs["gt_mono_comps"],
            )

            stats = {
                "q": q, "bin_l2": bin_l2, "mono_l2": mono_l2, "mem_l2": mem_l2,
            }
            return obs, pred_masks, pred_mono, pred_mem, act, stats

        return rollout_step

    def _host_batch(self, observations) -> Dict[str, np.ndarray]:
        keys = observations[0].keys()
        out = {}
        for k in keys:
            arr = np.stack([np.asarray(o[k]) for o in observations])
            if arr.dtype == np.uint8:
                out[k] = arr  # rgb ships uint8; cast to float on device
            elif arr.dtype.kind in "iu":
                out[k] = arr.astype(np.int32)
            else:
                out[k] = arr.astype(np.float32)
        return out

    # ------------------------------------------------------------------
    def train(self) -> None:
        """Dispatch: gymnax-style fully-on-device rollouts (default) or the
        host-process VectorEnv loop (file-backed scenes / parity runs)."""
        forced = str(self.config.TPU.get("RIR_MODE", "auto"))
        if forced not in ("auto", "dense", "sub", "host"):
            raise ValueError(f"TPU.RIR_MODE must be auto|dense|sub|host, "
                             f"got {forced!r}")
        if forced == "host":
            self._train_host()
            self._clear_interrupted_state()
            return
        if self.config.TPU.get("DEVICE_ENV", True):
            bundle = self._make_bundle()
            from move2hear_tpu.env.device_env import estimate_bank_bytes
            from move2hear_tpu.env.sub_bank import estimate_sub_bank_bytes

            if forced in ("dense", "sub"):
                # explicit override: skip the HBM honesty gate (bench and
                # A/B tooling; an over-budget bank OOMs loudly, not silently)
                self._train_device(rir_mode=forced)
                self._clear_interrupted_state()
                return
            est = estimate_bank_bytes(bundle)
            budget = int(self.config.TPU.MAX_DEVICE_BANK_BYTES)
            if est <= budget:
                self._train_device()
            else:
                # the dense RIR bank is V^2 per scene — real scenes don't fit
                # HBM. Episode-keyed sub-banks (env/sub_bank.py) are V-linear:
                # try those before demoting to the host path.
                p = self.config.RL.PPO
                sub_dtype_bytes = (
                    2
                    if self.config.TPU.get("SUB_BANK_DTYPE", "float32")
                    == "bfloat16"
                    else 4
                )
                sub_est = estimate_sub_bank_bytes(
                    bundle,
                    self.config.NUM_PROCESSES * get_distrib_info()[2],
                    self.config.NUM_SOUNDS_IN_MIX,
                    p.num_steps,
                    self.config.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS,
                    dtype_bytes=sub_dtype_bytes,
                )
                if (
                    sub_est <= budget
                    and not bool(self.config.TPU.get("FUSED_CYCLE", False))
                    and not bool(
                        self.config.TPU.get("PAIRWISE_FUSION", False)
                    )
                ):
                    logger.info(
                        "dense device banks would need ~%.2f GiB; using "
                        "episode-keyed RIR sub-banks (~%.2f GiB)",
                        est / 2**30, sub_est / 2**30,
                    )
                    self._train_device(rir_mode="sub")
                else:
                    logger.warning(
                        "device banks would need ~%.2f GiB dense / ~%.2f GiB "
                        "sub-banked (> TPU.MAX_DEVICE_BANK_BYTES=%.2f GiB); "
                        "using the host env path",
                        est / 2**30, sub_est / 2**30, budget / 2**30,
                    )
                    self._train_host()
        else:
            self._train_host()
        # a finished run's snapshot must not hijack the next run of this
        # experiment (preempted runs skip this: EXIT is still set)
        self._clear_interrupted_state()

    def _train_host(self) -> None:
        cfg = self.config
        ppo_cfg = self._ppo_config()
        p = cfg.RL.PPO
        local_rank, world_rank, world_size = get_distrib_info()
        self._rir_mode = "host"  # introspection for tests/bench

        envs, bundle = self._make_envs(world_rank, world_size)
        n_envs = envs.num_envs
        t_steps = p.num_steps
        cycle = p.num_updates_per_cycle
        max_ep_steps = cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS
        sep_rewards = (
            p.sep_reward_weight == 1.0 and p.nav_reward_weight == 0.0
        )

        mesh = make_mesh(
            None if cfg.TPU.MESH_SHAPE[0] == -1 else cfg.TPU.MESH_SHAPE[0],
            cfg.TPU.AXIS_NAME,
        )

        possible_actions = tuple(cfg.TASK_CONFIG.TASK.POSSIBLE_ACTIONS)
        policy = Move2HearPolicy(
            num_actions=len(possible_actions),
            hidden_size=p.hidden_size,
            extra_rgb=cfg.EXTRA_RGB,
            extra_depth=cfg.EXTRA_DEPTH,
            use_ddppo=p.use_ddppo,
            dtype=self._dtype(),
        )
        self.actor_critic = policy

        # --- init params -------------------------------------------------
        obs0_host = self._host_batch(envs.reset())
        gt_norm = cfg.TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM
        rollout_step = self._build_rollout_step(policy, gt_norm)

        init_obs = {
            "mixed_bin_audio_mag": jnp.zeros((n_envs, 512, 32, 2)),
            "gt_bin_comps": jnp.zeros((n_envs, 512, 32, 4 * cfg.NUM_SOUNDS_IN_MIX)),
            "gt_mono_comps": jnp.zeros((n_envs, 512, 32, 2 * cfg.NUM_SOUNDS_IN_MIX)),
            "target_class": jnp.zeros((n_envs, 1), jnp.int32),
        }
        if "rgb" in obs0_host:
            init_obs["rgb"] = jnp.zeros((n_envs, 128, 128, 3), jnp.uint8)
        if "depth" in obs0_host:
            init_obs["depth"] = jnp.zeros((n_envs, 128, 128, 1))
        key = jax.random.PRNGKey(cfg.SEED + world_rank)
        variables = policy.init(
            key, init_obs, jnp.zeros((n_envs, p.hidden_size)), jnp.ones((n_envs, 1))
        )
        state = create_agent_state(ppo_cfg, variables)

        # pretrained passive separators: load + freeze (ppo_trainer.py:543-577)
        if p.pretrained_passive_separators_ckpt:
            ckpt = load_checkpoint(p.pretrained_passive_separators_ckpt)
            params = load_pretrained_passive_separators(
                state.params, ckpt["params"]
            )
            batch_stats = dict(state.batch_stats or {})
            for k, v in (ckpt.get("batch_stats") or {}).items():
                batch_stats[k] = v
            state = state.replace(params=params, batch_stats=batch_stats)
            logger.info("loaded pretrained passive separators")

        # auto-resume a preemption snapshot (mirrors the device path; a
        # requeued host-path job must not restart from scratch)
        resume_count = 0
        from move2hear_tpu.parallel.ddppo import interrupted_state_path

        cand = interrupted_state_path(cfg.JOB_ID, self._interrupt_scope())
        if os.path.exists(cand):
            ckpt = load_checkpoint_if_compatible(
                cand,
                targets={
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state_pol": state.opt_state_pol,
                    "opt_state_sep": state.opt_state_sep,
                },
            )
            if ckpt is not None:
                state = state.replace(
                    params=ckpt["params"],
                    batch_stats=ckpt.get("batch_stats") or {},
                    opt_state_pol=ckpt["opt_state_pol"],
                    opt_state_sep=ckpt["opt_state_sep"],
                )
                resume_count = int(
                    (ckpt.get("extra_state") or {}).get("update_count", 0)
                )
                logger.info(
                    "resumed full train state from %s at update %d",
                    cand, resume_count,
                )
            else:
                logger.warning(
                    "ignoring interrupted state %s: parameter tree does not "
                    "match this config", cand,
                )

        state = replicate(mesh, state)
        wav_bank = replicate(mesh, jnp.asarray(self._wav_bank))

        # When the preemptive rollout sync can fire (ppo_trainer.py:769-782),
        # rollouts may truncate at any step >= threshold*T: the updates then
        # take a traced t_valid / row-validity input so ONE compiled program
        # serves every truncation length (recompiling per length would stall
        # the trainer for minutes on each new cut).
        sync_possible = (
            p.use_ddppo and world_size > 1 and p.short_rollout_threshold < 1.0
        )
        update_pol = jax.jit(
            make_update_pol(policy, ppo_cfg, n_envs, with_validity=sync_possible)
        )
        update_sep = jax.jit(
            make_update_sep(
                policy, ppo_cfg, n_envs, gt_mono_mag_norm=gt_norm,
                with_validity=sync_possible,
            )
        )

        # --- rollout storages -------------------------------------------
        # policy storage keeps only what evaluate_actions consumes (the
        # reference stores every sensor in both storages — GBs of GT specs the
        # PPO update never reads, rollout_storage.py:25-30)
        pol_sensors = [
            k for k in ("mixed_bin_audio_mag", "rgb", "depth", "target_class")
            if k in init_obs
        ]
        obs_shapes = {k: tuple(init_obs[k].shape[1:]) for k in pol_sensors}
        rollouts_pol = create_rollout_pol(t_steps, n_envs, obs_shapes, p.hidden_size)
        rollouts_sep = create_rollout_sep(
            t_steps * cycle, n_envs,
            num_sources=cfg.NUM_SOUNDS_IN_MIX,
            rir_length=bundle.audio_db.rir_length,
        )
        if len(mesh.devices.flat) > 1 and n_envs % len(mesh.devices.flat) == 0:
            # DDPPO over ICI: env axis sharded, params replicated; XLA inserts
            # the gradient/stat collectives in the jitted updates.
            rollouts_pol = shard_rollouts(mesh, rollouts_pol, cfg.TPU.AXIS_NAME)
            rollouts_sep = shard_rollouts(mesh, rollouts_sep, cfg.TPU.AXIS_NAME)
        elif len(mesh.devices.flat) > 1:
            logger.warning(
                "NUM_PROCESSES=%d not divisible by %d devices; host-path "
                "rollouts stay unsharded", n_envs, len(mesh.devices.flat),
            )

        sync = self._make_rollout_sync(t_steps)

        # --- initial forward --------------------------------------------
        masks_now = jnp.ones((n_envs, 1))
        hidden_now = jnp.zeros((n_envs, p.hidden_size))
        prev_mem_masked = jnp.zeros((n_envs, 512, 32, 1))
        key, sub = jax.random.split(key)
        cur_obs, cur_masks_pred, cur_mono, cur_mem, cur_act, cur_stats = (
            rollout_step(
                state.params, state.batch_stats, wav_bank, obs0_host,
                hidden_now, masks_now, prev_mem_masked, sub,
            )
        )
        # seed slot 0 of both storages with the initial observation
        rollouts_pol = rollouts_pol.replace(
            observations={
                k: rollouts_pol.observations[k].at[0].set(cur_obs[k])
                for k in rollouts_pol.observations
            }
        )
        rollouts_sep = rollouts_sep.replace(
            sound_ids=rollouts_sep.sound_ids.at[0].set(
                jnp.asarray(obs0_host["sound_ids"])
            ),
            rirs=rollouts_sep.rirs.at[0].set(jnp.asarray(obs0_host["rirs"])),
            target_class=rollouts_sep.target_class.at[0].set(
                jnp.asarray(obs0_host["target_class"])
            ),
        )

        # --- episode stat windows (ppo_trainer.py:693-703) ---------------
        win = p.reward_window_size
        windows = {
            k: deque(maxlen=win)
            for k in (
                "reward", "steps", "mono_l2_last", "mono_l2_all",
                "mem_l2_last", "mem_l2_all", "bin_l2_all", "ndg", "dg", "count",
            )
        }
        cur_ep = {
            k: np.zeros((n_envs, 1))
            for k in ("reward", "step", "bin", "mono", "mem")
        }
        probs_win = deque(maxlen=win)

        from move2hear_tpu.utils.tb import TensorboardWriter

        tb = TensorboardWriter(
            cfg.TENSORBOARD_DIR if world_rank == 0 else "", flush_secs=30
        )

        env_time = 0.0
        pth_time = 0.0
        t_start = time.time()
        update_count = resume_count
        num_cycles = max(1, (cfg.NUM_UPDATES - resume_count) // cycle)
        # steady-state fps: measured from the end of the first full cycle
        # (excludes jit compilation of the rollout step and both updates)
        self._steady_t0 = None
        self._steady_steps0 = 0
        self.steady_fps = 0.0
        total_env_steps = 0

        os.makedirs(cfg.CHECKPOINT_FOLDER, exist_ok=True)

        # one fused on-device reward, shared with the device path (see
        # device_rollout.sep_reward for the reference-aliasing semantics)
        extra_mult_const = float(p.extra_reward_multiplier)
        from move2hear_tpu.rl.device_rollout import sep_reward

        @jax.jit
        def reward_fn(q_now, q_next, not_done, is_bonus):
            return sep_reward(
                q_now, q_next, not_done, is_bonus, extra_mult_const
            )[:, None]

        host_actions = np.asarray(cur_act.action).ravel()

        for cycle_idx in range(num_cycles):
            sep_step = 0
            for sub_update in range(cycle):
                sync.new_rollout()
                # ---- collect one rollout of t_steps ----------------------
                for step_t in range(t_steps):
                    t0 = time.time()
                    outputs = envs.step([int(a) for a in host_actions])
                    env_time += time.time() - t0

                    t1 = time.time()
                    obs_list, env_rewards, dones, infos = [
                        list(x) for x in zip(*outputs)
                    ]
                    host = self._host_batch(obs_list)
                    masks_next = jnp.asarray(
                        [[0.0] if d else [1.0] for d in dones], jnp.float32
                    )
                    prev_mem_masked = cur_mem * masks_next[:, :, None, None]

                    key, sub = jax.random.split(key)
                    (
                        next_obs, next_masks_pred, next_mono, next_mem,
                        next_act, next_stats,
                    ) = rollout_step(
                        state.params, state.batch_stats, wav_bank, host,
                        cur_act.hidden, masks_next, prev_mem_masked, sub,
                    )

                    # ---- rewards for THIS step (one-late finalize), on device
                    if sep_rewards:
                        # bonus keyed on env 0's step, like the reference's
                        # current_episode_step[0] check (ppo_trainer.py:395)
                        is_bonus = (
                            int(cur_ep["step"][0, 0]) == max_ep_steps - 2
                        )
                        rewards_dev = reward_fn(
                            cur_stats["q"], next_stats["q"], masks_next[:, 0],
                            jnp.asarray(is_bonus),
                        )
                    else:
                        rewards_dev = jnp.asarray(
                            np.asarray(env_rewards, np.float32)
                        )[:, None]

                    # ---- ONE host fetch per step: next action + step stats
                    (
                        host_actions_arr, rewards_h, bin_h, mono_h, mem_h,
                        probs_h,
                    ) = jax.device_get(
                        (
                            next_act.action, rewards_dev, cur_stats["bin_l2"],
                            cur_stats["mono_l2"], cur_stats["mem_l2"],
                            next_act.probs,
                        )
                    )
                    host_actions = np.asarray(host_actions_arr).ravel()
                    probs_win.append(np.asarray(probs_h).mean(axis=0))

                    # ---- episode stats (ppo_trainer.py:426-455) ----------
                    d = np.asarray(dones).astype(np.float64)[:, None]
                    cur_ep["reward"] += np.asarray(rewards_h)
                    cur_ep["step"] += 1
                    cur_ep["bin"] += np.asarray(bin_h)
                    cur_ep["mono"] += np.asarray(mono_h)
                    cur_ep["mem"] += np.asarray(mem_h)
                    if d.any():
                        idx = d[:, 0] > 0
                        steps_i = cur_ep["step"][idx]
                        windows["reward"].extend(cur_ep["reward"][idx, 0])
                        windows["steps"].extend(steps_i[:, 0])
                        windows["bin_l2_all"].extend(
                            (cur_ep["bin"][idx] / steps_i)[:, 0]
                        )
                        windows["mono_l2_all"].extend(
                            (cur_ep["mono"][idx] / steps_i)[:, 0]
                        )
                        windows["mem_l2_all"].extend(
                            (cur_ep["mem"][idx] / steps_i)[:, 0]
                        )
                        windows["mono_l2_last"].extend(np.asarray(mono_h)[idx, 0])
                        windows["mem_l2_last"].extend(np.asarray(mem_h)[idx, 0])
                        windows["ndg"].extend(
                            np.asarray(
                                [
                                    i["normalized_geo_distance_to_target_audio_source"]
                                    for i in infos
                                ]
                            )[idx]
                        )
                        windows["dg"].extend(
                            np.asarray(
                                [
                                    i["geo_distance_to_target_audio_source"]
                                    for i in infos
                                ]
                            )[idx]
                        )
                        for k in cur_ep:
                            cur_ep[k][idx] = 0.0

                    # ---- inserts ----------------------------------------
                    next_obs_pol = {k: next_obs[k] for k in pol_sensors}
                    rollouts_pol = insert_pol(
                        rollouts_pol, jnp.asarray(step_t), next_obs_pol,
                        cur_act.hidden,
                        cur_act.action.astype(jnp.int32),
                        cur_act.action_log_probs, cur_act.value, rewards_dev,
                        masks_next, cur_masks_pred, cur_mono, cur_mem,
                    )
                    rollouts_sep = insert_sep(
                        rollouts_sep, jnp.asarray(sep_step),
                        jnp.asarray(host["sound_ids"]),
                        jnp.asarray(host["rirs"]),
                        jnp.asarray(host["target_class"]),
                        masks_next, cur_mem,
                    )
                    sep_step += 1
                    pth_time += time.time() - t1

                    (
                        cur_obs, cur_masks_pred, cur_mono, cur_mem, cur_act,
                        cur_stats,
                    ) = (
                        next_obs, next_masks_pred, next_mono, next_mem,
                        next_act, next_stats,
                    )

                    total_env_steps += n_envs
                    t_col = step_t + 1
                    stop = sync.should_stop_early(t_col)
                    if (
                        sync_possible and jax.process_count() > 1
                        and t_col >= p.short_rollout_threshold * t_steps
                    ):
                        # t_col feeds the masked global update programs as a
                        # replicated scalar: every process of this jax world
                        # must cut at the SAME step even when their local
                        # store reads race — agree via one tiny mesh reduce.
                        # Gated on the config-deterministic threshold (below
                        # it should_stop_early is False on every process), so
                        # trip counts stay aligned without paying a global
                        # device round trip on the early steps.
                        stop = collective_any(mesh, stop, cfg.TPU.AXIS_NAME)
                    if stop:
                        break
                sync.mark_done()

                # ---- policy update ----------------------------------------
                t2 = time.time()
                next_value = cur_act.value  # value of obs_T with hidden_T
                if sync_possible:
                    # bootstrap goes into slot t_col (== T when untruncated);
                    # steps >= t_col carry zero weight through GAE and the
                    # losses — equal to updating on the truncated buffer
                    tv = jnp.int32(t_col)
                    vp = jax.lax.dynamic_update_index_in_dim(
                        rollouts_pol.value_preds,
                        next_value.astype(rollouts_pol.value_preds.dtype),
                        tv, axis=0,
                    )
                    returns = compute_returns(
                        rollouts_pol.rewards, vp, rollouts_pol.masks,
                        ppo_cfg.gamma, ppo_cfg.tau, ppo_cfg.use_gae,
                        t_valid=tv,
                    )
                    rollouts_pol = rollouts_pol.replace(
                        returns=returns, value_preds=vp
                    )
                    key, sub = jax.random.split(key)
                    state, (value_loss, action_loss, entropy) = update_pol(
                        state, rollouts_pol.as_dict(), sub, 1.0, 1.0, tv
                    )
                    rollouts_pol = after_update_pol(rollouts_pol, tv)
                else:
                    returns = compute_returns(
                        rollouts_pol.rewards,
                        rollouts_pol.value_preds.at[-1].set(next_value),
                        rollouts_pol.masks,
                        ppo_cfg.gamma, ppo_cfg.tau, ppo_cfg.use_gae,
                    )
                    rollouts_pol = rollouts_pol.replace(
                        returns=returns,
                        value_preds=rollouts_pol.value_preds.at[-1].set(
                            next_value
                        ),
                    )
                    key, sub = jax.random.split(key)
                    state, (value_loss, action_loss, entropy) = update_pol(
                        state, rollouts_pol.as_dict(), sub
                    )
                    rollouts_pol = after_update_pol(rollouts_pol)
                pth_time += time.time() - t2
                update_count += 1

                if update_count % cfg.LOG_INTERVAL == 0 and world_rank == 0:
                    self._write_tb_scalars(
                        tb, windows, probs_win,
                        (value_loss, action_loss, entropy), None,
                        ppo_cfg.lr_pol, update_count * t_steps * n_envs,
                    )
                    fps = (update_count * t_steps * n_envs) / max(
                        1e-9, time.time() - t_start
                    )
                    logger.info(
                        "update %d | fps %.1f | env t %.1f | dev t %.1f | "
                        "value %.4f action %.4f entropy %.3f | "
                        "win reward %.4f | win mem-L2(last) %.4f",
                        update_count, fps, env_time, pth_time,
                        float(value_loss), float(action_loss), float(entropy),
                        float(np.mean(windows["reward"])) if windows["reward"] else 0.0,
                        float(np.mean(windows["mem_l2_last"])) if windows["mem_l2_last"] else 0.0,
                    )

            # ---- separator refit phase (ppo_trainer.py:979-994) ----------
            t3 = time.time()
            self._last_sep_fill = sep_step
            if sync_possible:
                # rows beyond the last slot filled this cycle are stale
                # (truncated rollouts insert fewer steps) -> zero weight;
                # strict < excludes the boundary row the truncated-buffer
                # [:-1] semantics drop (it rolls to slot 0 and trains next
                # cycle), matching the device path's sep_fill mask
                row_w = (
                    jnp.arange(rollouts_sep.masks.shape[0] - 1) < sep_step
                ).astype(jnp.float32)
                for _ in range(cycle):
                    key, sub = jax.random.split(key)
                    state, (bin_loss, mono_loss, mem_loss) = update_sep(
                        state, rollouts_sep.as_dict(), wav_bank, sub,
                        1.0, row_w,
                    )
                rollouts_sep = after_update_sep(
                    rollouts_sep, jnp.int32(sep_step)
                )
            else:
                for _ in range(cycle):
                    key, sub = jax.random.split(key)
                    state, (bin_loss, mono_loss, mem_loss) = update_sep(
                        state, rollouts_sep.as_dict(), wav_bank, sub
                    )
                rollouts_sep = after_update_sep(rollouts_sep)
            pth_time += time.time() - t3
            if world_rank == 0:
                step_now = update_count * t_steps * n_envs
                tb.add_scalar("Separator/Bin_Loss", float(bin_loss), step_now)
                tb.add_scalar("Separator/Mono_Loss", float(mono_loss), step_now)
                tb.add_scalar(
                    "Separator/MonoFromMem_Loss", float(mem_loss), step_now
                )
                logger.info(
                    "cycle %d sep losses: bin %.4f mono %.4f mem %.4f",
                    cycle_idx, float(bin_loss), float(mono_loss), float(mem_loss),
                )

            if self._steady_t0 is None:
                jax.block_until_ready(state.params)
                self._steady_t0 = time.time()
                self._steady_steps0 = total_env_steps
            elif total_env_steps > self._steady_steps0:
                self.steady_fps = (total_env_steps - self._steady_steps0) / (
                    time.time() - self._steady_t0
                )

            if (
                world_rank == 0
                and cycle_idx % max(1, cfg.CHECKPOINT_INTERVAL // cycle) == 0
            ):
                self._save(state, update_count, cycle_idx)

            if self._check_preemption(state, update_count):
                break

        tb.close()
        if world_rank == 0:
            self._save(state, update_count, num_cycles)
        self._final_state = state
        self._windows = windows
        envs.close()

    def _make_rollout_sync(self, t_steps) -> RolloutSyncState:
        """Preemptive rollout sync (ppo_trainer.py:769-782): the num-done
        store picked from world topology. Tests monkeypatch this to inject a
        pre-loaded store."""
        from move2hear_tpu.parallel.ddppo import make_num_done_store

        p = self.config.RL.PPO
        _, world_rank, world_size = get_distrib_info()
        return RolloutSyncState(
            sync_frac=p.sync_frac,
            short_rollout_threshold=p.short_rollout_threshold,
            num_steps=t_steps,
            world_size=world_size,
            store=make_num_done_store(
                world_rank, world_size, p.master_addr, p.master_port
            ),
        )

    def _check_preemption(self, state, update_count) -> bool:
        """On a preemption signal, save the full interrupted train state and
        requeue (ddppo_utils.py:26-110 semantics; the reference defined but
        never wired this — here it is live in both train loops)."""
        from move2hear_tpu.parallel.ddppo import (
            EXIT, requeue_job, save_interrupted_state,
        )

        if not EXIT.is_set():
            return False
        _, world_rank, _ = get_distrib_info()
        if world_rank == 0:
            save_interrupted_state(
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state_pol": state.opt_state_pol,
                    "opt_state_sep": state.opt_state_sep,
                    "extra_state": {"update_count": update_count},
                    "config": self.config.to_dict(),
                },
                self.config.JOB_ID,
                scope=self._interrupt_scope(),
            )
            requeue_job()
        return True

    # ------------------------------------------------------------------
    def _train_device(self, rir_mode: str = "dense") -> None:
        """The TPU-native training loop: one jitted program per rollout
        (scan over T env+policy steps), one per policy update, one per
        separator refit. Host work per rollout: 1 dispatch + 1 stats fetch.

        rir_mode="sub": real-scene-scale mode — the V^2 dense RIR bank is
        replaced by an episode-keyed V-linear slab refreshed per rollout
        (env/sub_bank.py); chosen automatically by train() when the dense
        bank exceeds TPU.MAX_DEVICE_BANK_BYTES but the slab fits."""
        import move2hear_tpu.env.device_env as de
        from move2hear_tpu.env.sim import Action
        from move2hear_tpu.rl.device_rollout import (
            RolloutSepIdx,
            make_collect,
            write_sep_slab,
        )

        cfg = self.config
        ppo_cfg = self._ppo_config()
        p = cfg.RL.PPO
        _, world_rank, world_size = get_distrib_info()
        self._rir_mode = rir_mode  # introspection for tests/bench

        bundle = self._make_bundle()
        n_envs = cfg.NUM_PROCESSES
        t_steps = p.num_steps
        cycle = p.num_updates_per_cycle
        max_ep_steps = cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS
        sep_rewards = p.sep_reward_weight == 1.0 and p.nav_reward_weight == 0.0
        gt_norm = cfg.TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM
        possible_actions = tuple(cfg.TASK_CONFIG.TASK.POSSIBLE_ACTIONS)
        action_codes = tuple(int(Action[a]) for a in possible_actions)

        mesh = make_mesh(
            None if cfg.TPU.MESH_SHAPE[0] == -1 else cfg.TPU.MESH_SHAPE[0],
            cfg.TPU.AXIS_NAME,
        )

        policy = Move2HearPolicy(
            num_actions=len(possible_actions),
            hidden_size=p.hidden_size,
            extra_rgb=cfg.EXTRA_RGB,
            extra_depth=cfg.EXTRA_DEPTH,
            use_ddppo=p.use_ddppo,
            dtype=self._dtype(),
        )
        self.actor_critic = policy

        # Multi-process DDPPO: n_envs is the PER-RANK env count (the
        # reference's NUM_PROCESSES per GPU rank); the global batch is
        # world_size * n_envs envs sharded over the global device mesh.
        # Episode order is drawn GLOBALLY (one table over all ranks' envs,
        # seeded by cfg.SEED alone) and each rank contributes its row slice —
        # the same global-split-then-slice scheme _make_envs uses for scenes.
        #
        # Two "world" sizes exist on purpose: `world_size` is the DDPPO
        # rendezvous world (SLURM/env-derived, drives the num-done store,
        # episode split and aggregate step accounting), while the env-row
        # count the jitted programs and the mesh actually SEE is
        # n_envs * jax.process_count() (`n_prog`). They coincide in real
        # runs; tests may mock a larger store world on one jax process
        # (ppo_trainer.py:769-782 semantics need world > 1).
        n_global = n_envs * world_size
        n_prog = n_envs * jax.process_count()

        # RIR-rfft precompute (default on, +10% measured): dense mode only,
        # and only when dense + rfft banks BOTH fit the HBM honesty gate —
        # never demote to sub/host just to afford the cache
        rfft_on = bool(cfg.TPU.get("PRECOMPUTE_RIR_RFFT", False))
        if rfft_on and rir_mode == "dense":
            rfft_extra = de.estimate_rir_rfft_bytes(bundle)
            if de.estimate_bank_bytes(bundle) + rfft_extra > int(
                cfg.TPU.MAX_DEVICE_BANK_BYTES
            ):
                logger.info(
                    "PRECOMPUTE_RIR_RFFT: +%.2f GiB rfft bank exceeds the "
                    "HBM gate; computing RIR FFTs per step instead",
                    rfft_extra / 2**30,
                )
                rfft_on = False
        dev = de.build_device_bundle(
            bundle,
            precompute_rir_rfft=rfft_on,
            rir_mode=rir_mode,
        )
        order_global = de.make_order_table(
            n_global, len(bundle.episodes), cfg.SEED
        )
        order = order_global[world_rank * n_envs : (world_rank + 1) * n_envs]
        env_state = de.env_reset_all(dev.scene, dev.episodes, jnp.asarray(order))

        init_obs = {
            "mixed_bin_audio_mag": jnp.zeros((n_envs, 512, 32, 2)),
            "gt_bin_comps": jnp.zeros((n_envs, 512, 32, 4 * cfg.NUM_SOUNDS_IN_MIX)),
            "gt_mono_comps": jnp.zeros((n_envs, 512, 32, 2 * cfg.NUM_SOUNDS_IN_MIX)),
            "target_class": jnp.zeros((n_envs, 1), jnp.int32),
        }
        pol_sensors = ["mixed_bin_audio_mag", "target_class"]
        if dev.rgb_bank is not None:
            init_obs["rgb"] = jnp.zeros((n_envs, 128, 128, 3), jnp.uint8)
            pol_sensors.append("rgb")
        if dev.depth_bank is not None:
            init_obs["depth"] = jnp.zeros((n_envs, 128, 128, 1))
            pol_sensors.append("depth")

        # Rank-INDEPENDENT seed: params must be bit-identical across ranks
        # (they are replicated over the global mesh — the analog of DDP's
        # rank-0 broadcast at wrap time), and the per-cycle keys feed one
        # GLOBAL jitted program, so every rank must pass the same key.
        # Per-env randomness still diverges inside the program: threefry
        # derives bits from each element's global array position.
        key = jax.random.PRNGKey(cfg.SEED)
        variables = policy.init(
            key, init_obs, jnp.zeros((n_envs, p.hidden_size)), jnp.ones((n_envs, 1))
        )
        state = create_agent_state(ppo_cfg, variables)
        resume_count = 0
        resume_path = cfg.get("RESUME_CKPT", "")
        auto_resume = False
        ckpt = None
        if not resume_path:
            # auto-resume from an interrupted state for this JOB_ID
            # (ppo_trainer.py:52-55 semantics, now actually wired)
            from move2hear_tpu.parallel.ddppo import interrupted_state_path

            cand = interrupted_state_path(cfg.JOB_ID, self._interrupt_scope())
            if os.path.exists(cand):
                resume_path = cand
                auto_resume = True
        if resume_path and os.path.exists(resume_path):
            targets = {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state_pol": state.opt_state_pol,
                "opt_state_sep": state.opt_state_sep,
            }
            if auto_resume:
                # a stale snapshot from a different model config must be
                # skipped, not crash the trainer (an explicit RESUME_CKPT
                # mismatch should still fail loudly below)
                ckpt = load_checkpoint_if_compatible(resume_path, targets)
                if ckpt is None:
                    logger.warning(
                        "ignoring interrupted state %s: parameter tree does "
                        "not match this config", resume_path,
                    )
            else:
                ckpt = load_checkpoint(resume_path, targets=targets)
        if resume_path and ckpt is not None:
            state = state.replace(
                params=ckpt["params"],
                batch_stats=ckpt.get("batch_stats") or {},
                opt_state_pol=ckpt["opt_state_pol"],
                opt_state_sep=ckpt["opt_state_sep"],
            )
            resume_count = int(
                (ckpt.get("extra_state") or {}).get("update_count", 0)
            )
            logger.info(
                "resumed full train state from %s at update %d",
                resume_path, resume_count,
            )
        elif p.pretrained_passive_separators_ckpt:
            ckpt = load_checkpoint(p.pretrained_passive_separators_ckpt)
            state = state.replace(
                params=load_pretrained_passive_separators(
                    state.params, ckpt["params"]
                ),
                batch_stats={
                    **(state.batch_stats or {}),
                    **(ckpt.get("batch_stats") or {}),
                },
            )
            logger.info("loaded pretrained passive separators")
        state = replicate(mesh, state)

        from move2hear_tpu.rl.device_rollout import make_train_cycle

        fused = bool(cfg.TPU.get("FUSED_CYCLE", False))
        pairwise = bool(cfg.TPU.get("PAIRWISE_FUSION", False))
        # Pose-indexed rollout observations: whenever the collect scan's
        # per-rollout visual-feature bank is active (every frame is one of
        # S*V*4 distinct poses), the rollouts store the integer pose per step
        # instead of the frames, and each policy-update epoch runs the visual
        # conv stack once over the distinct poses + a gather — instead of
        # over all T*N stored frames (the reference's evaluate_actions cost,
        # policy.py:47-118). Also skips writing the (T, N, 128, 128, 4)
        # frame slabs to HBM every rollout. Exact same math (see
        # make_update_pol docstring).
        _fb = dev.rgb_bank if dev.rgb_bank is not None else dev.depth_bank
        pose_obs = self._pose_obs = (
            not fused and not pairwise
            and _fb is not None
            and _fb.shape[0] * _fb.shape[1] * 4 <= n_prog * t_steps
            and any(k in pol_sensors for k in ("rgb", "depth"))
        )
        # lax.scan unroll factor for the collect's time loop: >1 trades
        # compile time + code size for fewer while-loop iterations (the
        # T-step kernel chain is latency-bound, not FLOPs-bound, at bench
        # shapes). Must divide into the rollout cleanly only for perf, not
        # correctness — lax.scan handles remainders.
        collect_unroll = int(cfg.TPU.get("COLLECT_UNROLL", 1))

        def mk_collect(steps, unroll=None):
            return make_collect(
                policy, ppo_cfg, steps, max_ep_steps, gt_norm,
                sep_rewards, p.extra_reward_multiplier,
                cfg.RL.DISTANCE_REWARD_SCALE
                if cfg.RL.WITH_DISTANCE_REWARD else 0.0,
                action_codes, tuple(pol_sensors),
                scan_unroll=collect_unroll if unroll is None else unroll,
                pose_obs=pose_obs,
            )

        collect_fn = mk_collect(t_steps)
        update_pol_fn = make_update_pol(policy, ppo_cfg, n_prog, pose_bank=pose_obs)
        # Preemptive rollout sync on the device path (ppo_trainer.py:769-782):
        # a mid-rollout host decision is impossible inside one jitted scan, so
        # the rollout is dispatched as a prefix of ceil(threshold*T) steps and
        # a tail; the num-done store is checked once between them (per-rollout
        # granularity instead of the reference's per-step — the earliest
        # possible stop, threshold*T, is identical). Published yamls disable
        # this (short_rollout_threshold: 1.0).
        sync_dev = None
        s0 = t_steps
        if (
            p.use_ddppo and world_size > 1
            and p.short_rollout_threshold < 1.0 and not fused and not pairwise
        ):
            s0 = max(1, int(np.ceil(p.short_rollout_threshold * t_steps)))
            if s0 < t_steps:
                sync_dev = self._make_rollout_sync(t_steps)
        # all cycle sep refits in one program, consuming the slab-cached
        # frozen-separator outputs (no re-render, no U-Net forwards — see
        # make_update_sep_from_slabs)
        from move2hear_tpu.rl.device_rollout import make_update_sep_from_slabs

        refit_dtype_name = cfg.TPU.get("SEP_REFIT_DTYPE", "")
        if refit_dtype_name not in ("", "bfloat16", "float32"):
            # a typo'd value must not silently disable the optimization
            raise ValueError(
                f"TPU.SEP_REFIT_DTYPE={refit_dtype_name!r}: expected "
                "'bfloat16', 'float32', or '' (policy dtype)"
            )
        refit_dtype = jnp.bfloat16 if refit_dtype_name == "bfloat16" else None
        update_sep_fn_cycle = make_update_sep_from_slabs(
            policy, ppo_cfg, n_prog, cycle,
            with_validity=sync_dev is not None,
            refit_dtype=refit_dtype,
        )
        if fused:
            # the whole cycle — 6x(collect+pol update) + cached sep refit —
            # as ONE jitted program (one dispatch + one fetch per cycle);
            # separator slabs are scan outputs, not a carried buffer
            train_cycle = jax.jit(
                make_train_cycle(
                    policy, ppo_cfg, collect_fn, update_pol_fn,
                    update_sep_fn_cycle,
                    cycle, t_steps, max(1, cfg.NUM_UPDATES),
                    p.use_linear_lr_decay, p.use_linear_clip_decay,
                ),
                donate_argnums=(1,),
            )
        else:
            if pairwise:
                from move2hear_tpu.rl.device_rollout import (
                    make_collect_and_update,
                )

                collect_update = jax.jit(
                    make_collect_and_update(collect_fn, update_pol_fn),
                    donate_argnums=(1,),
                )
            else:
                # separate programs measured fastest on the tunneled v5e:
                # dispatches pipeline asynchronously, only the per-cycle stats
                # fetch synchronizes, and smaller programs schedule better
                collect = jax.jit(collect_fn)
                # donate the train state: params + both Adam states alias
                # input->output buffers (frozen separator subtrees are
                # pass-through), saving ~0.5 GB of HBM copies per update
                update_pol = jax.jit(update_pol_fn, donate_argnums=(0,))
            update_sep_cached = jax.jit(
                update_sep_fn_cycle, donate_argnums=(0,)
            )
            if sync_dev is not None:
                from move2hear_tpu.rl.device_rollout import (
                    concat_collect_outputs,
                )

                collect_prefix = jax.jit(mk_collect(s0))
                collect_tail = jax.jit(mk_collect(t_steps - s0))
                concat_segments = jax.jit(
                    lambda a, b: concat_collect_outputs(a, b, ppo_cfg)
                )
        sep_buf = RolloutSepIdx.create(
            t_steps * cycle, n_envs, cfg.NUM_SOUNDS_IN_MIX,
            slab_dtype=jnp.bfloat16
            if cfg.TPU.get("SEP_SLAB_DTYPE", "float32") == "bfloat16"
            else jnp.float32,
        )

        hidden = jnp.zeros((n_envs, p.hidden_size))
        masks = jnp.ones((n_envs, 1))
        prev_mem = jnp.zeros((n_envs, 512, 32, 1))

        # DDPPO over ICI (SURVEY §2.9): per-env state and both rollout buffers
        # shard their env axis over the data mesh; params and banks replicate.
        # XLA propagates the sharding through the collect scan and inserts the
        # gradient/stat collectives inside the jitted updates — the allreduce
        # semantics of the reference's DDP path (rl/ppo/ppo.py:286-319).
        n_dev = len(mesh.devices.flat)
        self._mesh = mesh
        self._env_sharded = False
        multiproc = jax.process_count() > 1
        if multiproc and n_prog % n_dev != 0:
            raise ValueError(
                f"multi-process run needs the global env count "
                f"({n_prog} = {jax.process_count()} processes x "
                f"NUM_PROCESSES={n_envs}) divisible by the {n_dev}-device mesh"
            )
        if n_dev > 1:
            # the bundle is now a jit ARGUMENT (see make_collect): replicate
            # its banks over the mesh explicitly (closure constants used to
            # get this placement implicitly). In multi-process runs the
            # _put helper assembles globals from each rank's local slice
            # (env-sharded leaves) / full copy (replicated leaves).
            dev = replicate(mesh, dev)
            if n_prog % n_dev == 0:
                axis = cfg.TPU.AXIS_NAME
                env_state = shard_env_batch(mesh, env_state, axis)
                hidden = shard_env_batch(mesh, hidden, axis)
                masks = shard_env_batch(mesh, masks, axis)
                prev_mem = shard_env_batch(mesh, prev_mem, axis)
                sep_buf = shard_rollouts(mesh, sep_buf, axis)
                self._env_sharded = True
            else:
                logger.warning(
                    "NUM_PROCESSES=%d not divisible by %d devices; "
                    "device-env path runs replicated", n_envs, n_dev,
                )

        # built AFTER dev's mesh replication so the banks the update gathers
        # from carry the same (replicated) sharding as the collect's inputs
        pol_banks = (
            {"rgb": dev.rgb_bank, "depth": dev.depth_bank} if pose_obs else None
        )

        sub_bank = self._sub_bank = None
        if rir_mode == "sub":
            if fused or pairwise:
                raise ValueError(
                    "sub-bank mode refreshes the RIR slab per rollout; "
                    "TPU.FUSED_CYCLE / PAIRWISE_FUSION fuse whole cycles "
                    "into one program and cannot host the refresh"
                )
            from move2hear_tpu.env.sub_bank import RirSubBank

            # the manager tracks the env rows the jitted PROGRAM runs: the
            # first n_prog rows of the global order table (world_rank ==
            # process_index in real multi-process runs, so the concatenation
            # of per-rank slices IS that prefix). Every process assembles
            # identical (replicated) slabs from the same global occupancy.
            # A mocked store world (world_size > process_count, see the
            # two-worlds note above) or a nonstandard rank mapping would make
            # the occupancy mirror track the WRONG env rows — fail loudly
            # instead of silently gathering stale slot-0 RIRs.
            if world_rank != jax.process_index() or n_global != n_prog:
                raise ValueError(
                    "sub-bank mode requires the DDPPO store world to equal "
                    f"the jax process world (world_rank={world_rank} vs "
                    f"process_index={jax.process_index()}, n_global="
                    f"{n_global} vs n_prog={n_prog}): the host occupancy "
                    "mirror tracks order_global[:n_prog]"
                )
            sub_dtype = (
                jnp.bfloat16
                if cfg.TPU.get("SUB_BANK_DTYPE", "float32") == "bfloat16"
                else jnp.float32
            )
            sub_rows = int(cfg.TPU.get("SUB_BANK_ROWS", 0)) or None
            if sub_rows is None:
                # grow the slab into spare HBM budget: every extra resident
                # row turns a future conflict re-upload into a hit, and
                # host->device RIR traffic is the sub path's wall on slow
                # links (docs/ROUND5_NOTES.md sub-mode analysis)
                from move2hear_tpu.env.sub_bank import (
                    _count_unique_keys,
                    fixed_bank_bytes,
                    max_capacity_for_budget,
                    sub_bank_capacity,
                )

                row_bytes = (
                    4 * int(dev.scene.positions.shape[1])
                    * int(bundle.audio_db.rir_length) * 2
                    * (2 if sub_dtype == jnp.bfloat16 else 4)
                )
                n_keys = _count_unique_keys(bundle)
                min_cap = sub_bank_capacity(
                    n_prog, int(cfg.NUM_SOUNDS_IN_MIX), t_steps,
                    max_ep_steps, n_keys,
                )
                spare = (
                    int(cfg.TPU.MAX_DEVICE_BANK_BYTES)
                    - fixed_bank_bytes(bundle)
                )
                sub_rows = max_capacity_for_budget(
                    spare, row_bytes, min_cap, n_keys
                )
            sub_bank = self._sub_bank = RirSubBank(
                bundle.scenes,
                bundle.audio_db,
                np.asarray(dev.episodes.scene_idx),
                np.asarray(dev.episodes.sources),
                order_global[:n_prog],
                max_ep_steps,
                t_steps,
                v_pad=int(dev.scene.positions.shape[1]),
                capacity=sub_rows,
                dtype=sub_dtype,
                put=(lambda x: replicate(mesh, x)) if n_dev > 1 else None,
            )
            logger.info(
                "RIR sub-bank: %d rows x (4, %d, %d, 2) %s = %.2f GiB slab",
                sub_bank.capacity, dev.scene.positions.shape[1],
                bundle.audio_db.rir_length, np.dtype(sub_dtype).name
                if sub_dtype == jnp.float32 else "bfloat16",
                sub_bank.capacity * 4 * dev.scene.positions.shape[1]
                * bundle.audio_db.rir_length * 2
                * (2 if sub_dtype == jnp.bfloat16 else 4) / 2**30,
            )

        self.mfu_info = None
        if cfg.TPU.get("REPORT_MFU", False):
            if n_dev != 1 or fused or pairwise:
                logger.warning(
                    "REPORT_MFU: probe supports single-device separate-"
                    "program runs only; skipping"
                )
            else:
                self.mfu_info = self._probe_flops(
                    mk_collect, policy, ppo_cfg, n_prog, cycle, t_steps,
                    dev, state, env_state, hidden, masks, prev_mem, sep_buf,
                    refit_dtype, sub_bank,
                )

        win = p.reward_window_size
        windows = {
            k: deque(maxlen=win)
            for k in (
                "reward", "steps", "mono_l2_last", "mono_l2_all",
                "mem_l2_last", "mem_l2_all", "bin_l2_all", "ndg", "dg",
            )
        }
        cur_ep = {
            k: np.zeros((n_prog,))
            for k in ("reward", "step", "bin", "mono", "mem")
        }
        probs_win = deque(maxlen=win)

        t_start = time.time()
        update_count = resume_count
        total_env_steps = 0
        self._steady_t0 = None
        self._steady_steps0 = 0
        self.steady_fps = 0.0
        # per-cycle (pol, sep) loss stacks in update order; global means, so
        # topology-independent up to reduction order (multi-host test oracle)
        self._loss_log = []
        self._stats_log = []
        num_cycles = max(1, (cfg.NUM_UPDATES - resume_count) // cycle)
        os.makedirs(cfg.CHECKPOINT_FOLDER, exist_ok=True)

        from move2hear_tpu.utils.tb import TensorboardWriter

        tb = TensorboardWriter(
            cfg.TENSORBOARD_DIR if world_rank == 0 else "", flush_secs=30
        )

        from move2hear_tpu.parallel.ddppo import EXIT
        from move2hear_tpu.rl.device_rollout import unpack_stats

        # Deferred stats fetch: each cycle queues its (device-resident) packed
        # stats + losses; ONE host fetch per STATS_FETCH_INTERVAL cycles. On
        # tunneled runtimes every fetch is a full round trip that stalls the
        # async dispatch pipeline — deferring it lets the device run several
        # cycles ahead.
        stats_interval = max(1, int(cfg.TPU.get("STATS_FETCH_INTERVAL", 1)))
        pending = []  # (env_steps_after, update_count_after, packed, pol, sep)

        profile_dir = cfg.get("PROFILE_DIR", "")
        from move2hear_tpu.parallel.ddppo import coordination_barrier

        for cycle_idx in range(num_cycles):
            if profile_dir and cycle_idx == 2:
                jax.profiler.start_trace(profile_dir)
            if multiproc and cycle_idx < 3:
                # first cycles trigger the big compiles; align ranks so the
                # gloo context init sees both executions within its window
                coordination_barrier(f"cycle{cycle_idx}")
            key, cycle_key = jax.random.split(key)
            if fused:
                (
                    state, env_state, hidden, masks, prev_mem,
                    pol_losses, sep_losses, stats,
                ) = train_cycle(
                    dev, state, env_state, hidden, masks, prev_mem,
                    cycle_key, jnp.int32(update_count),
                )
                packed, pol_dev, sep_dev = stats, pol_losses, sep_losses
            else:
                stats_list, pol_l = [], []
                sep_fill = 0  # rows of sep_buf filled this cycle
                for sub in range(cycle):
                    rng_c = jax.random.fold_in(cycle_key, 2 * sub)
                    rng_u = jax.random.fold_in(cycle_key, 2 * sub + 1)
                    idx = update_count + sub
                    lr_scale = (
                        jnp.float32(linear_decay(idx, cfg.NUM_UPDATES))
                        if p.use_linear_lr_decay else 1.0
                    )
                    clip_scale = (
                        jnp.float32(linear_decay(idx, cfg.NUM_UPDATES))
                        if p.use_linear_clip_decay else 1.0
                    )
                    if pairwise:
                        (
                            state, env_state, hidden, masks, prev_mem,
                            sep_slab, losses, stats,
                        ) = collect_update(
                            dev, state, env_state, hidden, masks, prev_mem,
                            rng_c, rng_u, lr_scale, clip_scale,
                        )
                    else:
                        if sub_bank is not None:
                            # refresh the episode-keyed RIR slab for the
                            # coming window (host assembly + async upload
                            # overlap the still-running previous dispatches)
                            slab, ep_row = sub_bank.rollout_inputs()
                            dev = dev._replace(
                                rir_sub_bank=slab, ep_src_row=ep_row
                            )
                        if sync_dev is not None:
                            sync_dev.new_rollout()
                            out = collect_prefix(
                                dev, state.params, state.batch_stats,
                                env_state, hidden, masks, prev_mem, rng_c,
                            )
                            # the stop decision must observe the store AFTER
                            # our prefix actually ran (other ranks mark done
                            # as they finish) — one sync point per rollout,
                            # vs. the reference's per-step store read
                            jax.block_until_ready(out.stats)
                            executed = s0
                            stop = sync_dev.should_stop_early(s0)
                            if multiproc:
                                # a store read can differ across this jax
                                # world's processes by pure timing; a
                                # divergent decision would dispatch different
                                # global programs and deadlock the mesh
                                # collectives — agree via one tiny reduce
                                stop = collective_any(
                                    mesh, stop, cfg.TPU.AXIS_NAME
                                )
                            if not stop:
                                out_t = collect_tail(
                                    dev, state.params, state.batch_stats,
                                    out.env_state, out.hidden, out.masks,
                                    out.prev_mem_masked,
                                    jax.random.fold_in(rng_c, 1),
                                )
                                out = concat_segments(out, out_t)
                                executed = t_steps
                            sync_dev.mark_done()
                            if sub_bank is not None:
                                sub_bank.advance(executed)
                        else:
                            out = collect(
                                dev, state.params, state.batch_stats,
                                env_state, hidden, masks, prev_mem, rng_c,
                            )
                            if sub_bank is not None:
                                sub_bank.advance(t_steps)
                        env_state, hidden, masks, prev_mem = (
                            out.env_state, out.hidden, out.masks,
                            out.prev_mem_masked,
                        )
                        sep_slab, stats = out.sep_slab, out.stats
                        if multiproc and cycle_idx == 0 and sub == 0:
                            # first collective-bearing compile (grad psum)
                            coordination_barrier("first_pol_update")
                        state, losses_t = update_pol(
                            state, out.rollouts_pol, rng_u, lr_scale,
                            clip_scale, banks=pol_banks,
                        )
                        losses = jnp.stack(losses_t)
                    sep_buf = write_sep_slab(sep_buf, sep_slab, sep_fill)
                    sep_fill += int(sep_slab["masks"].shape[0])
                    pol_l.append(losses)
                    stats_list.append(stats)
                    if sub_bank is not None and bool(
                        cfg.TPU.get("SUB_PREFETCH", True)
                    ):
                        # assemble + upload the NEXT window's missing RIR
                        # rows while the device chews on this window's
                        # collect/update: the scatters execute after the
                        # in-flight programs (per-device enqueue order), so
                        # the rows they read are untouched
                        sub_bank.prefetch()
                self._last_sep_fill = sep_fill
                sep_lrs = (
                    jnp.asarray(
                        [
                            linear_decay(update_count + i, cfg.NUM_UPDATES)
                            for i in range(cycle)
                        ],
                        jnp.float32,
                    )
                    if p.use_linear_lr_decay
                    else jnp.ones((cycle,), jnp.float32)
                )
                if sync_dev is not None:
                    row_w = (
                        jnp.arange(sep_buf.masks.shape[0]) < sep_fill
                    ).astype(jnp.float32)
                    state, sep_losses = update_sep_cached(
                        state, sep_buf,
                        jax.random.fold_in(cycle_key, 999), sep_lrs, row_w,
                    )
                    # truncated rollouts have per-sub stat slabs of differing
                    # lengths: concatenate on the step axis (one transfer)
                    packed = jnp.concatenate(stats_list, axis=0)[None]
                else:
                    if multiproc and cycle_idx == 0:
                        coordination_barrier("first_sep_update")
                    state, sep_losses = update_sep_cached(
                        state, sep_buf,
                        jax.random.fold_in(cycle_key, 999), sep_lrs,
                    )
                    # stack the cycle's packed stats on device -> ONE transfer
                    packed = jnp.stack(stats_list)
                pol_dev, sep_dev = jnp.stack(pol_l), sep_losses

            update_count += cycle
            if not fused and sync_dev is not None:
                total_env_steps += sep_fill * n_global
            else:
                total_env_steps += cycle * t_steps * n_global
            pending.append(
                (total_env_steps, update_count, packed, pol_dev, sep_dev)
            )

            flush = (
                len(pending) >= stats_interval
                or cycle_idx == num_cycles - 1
                or EXIT.is_set()
                or bool(profile_dir and cycle_idx in (2, 3))
            )
            if flush:
                # multi-process: env-sharded stat slabs are all-gathered to
                # replicated before the host fetch (fetch_to_host compiles a
                # collective identity — every rank flushes on the same cycle,
                # so the collective is entered together)
                if multiproc and cycle_idx < 3:
                    coordination_barrier(f"flush{cycle_idx}")
                fetched = fetch_to_host(mesh, [e[2:] for e in pending])
                for (steps_at, upd_at, *_), (st_packed, pol_h, sep_h) in zip(
                    pending, fetched
                ):
                    st = unpack_stats(np.asarray(st_packed))
                    st_flat = {
                        k: v.reshape((-1,) + v.shape[2:]) for k, v in st.items()
                    }
                    self._absorb_stats(st_flat, windows, cur_ep, t_steps)
                    probs_win.append(st_flat["probs"].mean(axis=(0, 1)))
                    pol_h, sep_h = np.asarray(pol_h), np.asarray(sep_h)
                    self._loss_log.append((pol_h, sep_h))
                    if len(self._stats_log) < 2 or bool(
                        cfg.TPU.get("KEEP_STATS_HISTORY", False)
                    ):
                        # tests keep the full per-cycle stats trajectory to
                        # assert learning dynamics (tests/test_learning.py);
                        # production keeps 2 cycles for the parity oracles
                        self._stats_log.append(st_flat)
                    value_loss, action_loss, entropy = pol_h[-1]
                    bin_loss, mono_loss, mem_loss = sep_h[-1]
                    if world_rank == 0:
                        lr_now = p.lr_pol * (
                            linear_decay(upd_at, cfg.NUM_UPDATES)
                            if p.use_linear_lr_decay else 1.0
                        )
                        self._write_tb_scalars(
                            tb, windows, probs_win, pol_h[-1], sep_h[-1],
                            lr_now, steps_at,
                        )
                pending.clear()

                if (
                    world_rank == 0
                    and (update_count // cycle)
                    % max(1, cfg.LOG_INTERVAL // cycle) == 0
                ):
                    fps = total_env_steps / max(1e-9, time.time() - t_start)
                    logger.info(
                        "update %d | fps %.1f (steady %.1f) | value %.4f "
                        "action %.4f entropy %.3f | sep bin %.4f mono %.4f "
                        "mem %.4f | win reward %.4f | win mem-L2(last) %.4f",
                        update_count, fps, self.steady_fps, float(value_loss),
                        float(action_loss), float(entropy), float(bin_loss),
                        float(mono_loss), float(mem_loss),
                        float(np.mean(windows["reward"])) if windows["reward"] else 0.0,
                        float(np.mean(windows["mem_l2_last"])) if windows["mem_l2_last"] else 0.0,
                    )

                # steady-state fps, measured flush-to-flush: device_get above
                # synchronizes through the flushed cycles, so the clock only
                # covers completed device work (first flush excludes compiles)
                if self._steady_t0 is None:
                    self._steady_t0 = time.time()
                    self._steady_steps0 = total_env_steps
                elif total_env_steps > self._steady_steps0:
                    self.steady_fps = (
                        total_env_steps - self._steady_steps0
                    ) / (time.time() - self._steady_t0)

            if profile_dir and cycle_idx == 3:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()

            if (
                world_rank == 0
                and cycle_idx % max(1, cfg.CHECKPOINT_INTERVAL // cycle) == 0
            ):
                self._save(state, update_count, cycle_idx)

            if self._check_preemption(state, update_count):
                break

        tb.close()
        if world_rank == 0:
            self._save(state, update_count, num_cycles)
        self._final_state = state
        self._windows = windows

    def _probe_flops(
        self, mk_collect, policy, ppo_cfg, n_prog, cycle, t_steps,
        dev, state, env_state, hidden, masks, prev_mem, sep_buf,
        refit_dtype, sub_bank,
    ):
        """Exact per-cycle FLOPs for the MFU report (VERDICT r3 next-5).

        XLA cost_analysis counts a rolled ``lax.scan`` body ONCE regardless
        of trip count (docs/ROUND3_NOTES.md), so each of the three production
        programs is probed via two fully-UNROLLED tiny-trip-count variants —
        whose counts are exact — and the production trip count is
        reconstructed linearly (fixed + trips x body). Inner scans (the GRU
        time scan inside the policy update) stay rolled: their bodies are
        ~0.5% of an update's FLOPs. Probes only compile, never execute."""
        import dataclasses

        from move2hear_tpu.rl.device_rollout import make_update_sep_from_slabs

        def flops(fn, *args):
            comp = jax.jit(fn).lower(*args).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))

        try:
            if sub_bank is not None:
                slab, table = sub_bank.rollout_inputs()
                dev = dev._replace(rir_sub_bank=slab, ep_src_row=table)
            rng = jax.random.PRNGKey(0)
            cargs = (
                dev, state.params, state.batch_stats, env_state, hidden,
                masks, prev_mem, rng,
            )
            f_c1 = flops(mk_collect(1, unroll=True), *cargs)
            f_c2 = flops(mk_collect(2, unroll=True), *cargs)
            f_collect = f_c1 + (t_steps - 1) * (f_c2 - f_c1)

            rp = jax.eval_shape(mk_collect(t_steps), *cargs).rollouts_pol
            one = jnp.float32(1.0)
            pose = "pose" in rp["observations"]
            banks = (
                {"rgb": dev.rgb_bank, "depth": dev.depth_bank} if pose else None
            )

            def mkp(e):
                upd = make_update_pol(
                    policy, dataclasses.replace(ppo_cfg, ppo_epoch=e),
                    n_prog, scan_unroll=True, pose_bank=pose,
                )
                return lambda s, r, k: upd(s, r, k, one, one, banks=banks)

            pargs = (state, rp, rng)
            f_p1 = flops(mkp(1), *pargs)
            f_p2 = flops(mkp(2), *pargs)
            f_pol = f_p1 + (ppo_cfg.ppo_epoch - 1) * (f_p2 - f_p1)

            def mks(c):
                return make_update_sep_from_slabs(
                    policy, ppo_cfg, n_prog, c, with_validity=False,
                    refit_dtype=refit_dtype, scan_unroll=True,
                )

            f_s1 = flops(mks(1), state, sep_buf, rng, jnp.ones((1,)))
            f_s2 = flops(mks(2), state, sep_buf, rng, jnp.ones((2,)))
            f_sep = f_s1 + (cycle - 1) * (f_s2 - f_s1)
        except Exception as exc:  # cost_analysis availability varies by PJRT
            logger.warning("REPORT_MFU probe failed: %s", exc)
            return None

        per_cycle = cycle * (f_collect + f_pol) + f_sep
        steps_per_cycle = cycle * t_steps * n_prog
        info = {
            "flops_per_rollout_collect": f_collect,
            "flops_per_update_pol": f_pol,
            "flops_per_cycle_sep_refit": f_sep,
            "flops_per_cycle_total": per_cycle,
            "env_steps_per_cycle": steps_per_cycle,
            "flops_per_env_step": per_cycle / steps_per_cycle,
            "method": (
                "XLA cost_analysis over fully-unrolled 1/2-trip program "
                "variants, linear reconstruction to production trip counts"
            ),
        }
        logger.info(
            "MFU probe: %.3f GFLOPs/env-step (collect %.1f + pol %.1f + "
            "refit %.1f GF/cycle)",
            info["flops_per_env_step"] / 1e9, cycle * f_collect / 1e9,
            cycle * f_pol / 1e9, f_sep / 1e9,
        )
        return info

    def _write_tb_scalars(
        self, tb, windows, probs_win, pol_losses, sep_losses, lr_now, step
    ):
        """The reference's per-update training scalars (ppo_trainer.py:905-957):
        windowed episode stats, 4 STFT-L2 channels, per-action probs,
        PPO losses, LR — plus the separator refit losses."""
        wmean = lambda k: float(np.mean(windows[k])) if len(windows[k]) else 0.0
        tb.add_scalar("Environment/Reward", wmean("reward"), step)
        tb.add_scalar("Environment/Episode_length", wmean("steps"), step)
        if probs_win:
            probs = np.mean(np.stack(list(probs_win)), axis=0)
            for i, v in enumerate(probs):
                tb.add_scalar(f"Policy/Action_prob_{i}", float(v), step)
        tb.add_scalar(
            "Environment/STFT_L2_loss/mono_lastStep", wmean("mono_l2_last"), step
        )
        tb.add_scalar(
            "Environment/STFT_L2_loss/mono_avgAllSteps", wmean("mono_l2_all"), step
        )
        tb.add_scalar(
            "Environment/STFT_L2_loss/monoFromMem_lastStep",
            wmean("mem_l2_last"), step,
        )
        tb.add_scalar(
            "Environment/STFT_L2_loss/monoFromMem_avgAllSteps",
            wmean("mem_l2_all"), step,
        )
        tb.add_scalar(
            "Environment/Normalized_geo_distance_to_target_audio_source",
            wmean("ndg"), step,
        )
        tb.add_scalar(
            "Environment/Geo_distance_to_target_audio_source", wmean("dg"), step
        )
        value_loss, action_loss, entropy = pol_losses
        tb.add_scalar("Policy/Value_Loss", float(value_loss), step)
        tb.add_scalar("Policy/Action_Loss", float(action_loss), step)
        tb.add_scalar("Policy/Entropy", float(entropy), step)
        tb.add_scalar("Policy/Learning_Rate", float(lr_now), step)
        if sep_losses is not None:
            bin_loss, mono_loss, mem_loss = sep_losses
            tb.add_scalar("Separator/Bin_Loss", float(bin_loss), step)
            tb.add_scalar("Separator/Mono_Loss", float(mono_loss), step)
            tb.add_scalar("Separator/MonoFromMem_Loss", float(mem_loss), step)

    def _absorb_stats(self, st, windows, cur_ep, t_steps):
        """Fold the unpacked (T_total, N) stat stacks into the reference's
        windowed episode statistics (ppo_trainer.py:426-455)."""
        for t in range(st["q"].shape[0]):
            done = st["done"][t].astype(bool)
            cur_ep["reward"] += st["reward"][t]
            cur_ep["step"] += 1
            cur_ep["bin"] += st["bin_l2"][t]
            cur_ep["mono"] += st["mono_l2"][t]
            cur_ep["mem"] += st["mem_l2"][t]
            if done.any():
                steps_i = np.maximum(cur_ep["step"][done], 1)
                windows["reward"].extend(cur_ep["reward"][done])
                windows["steps"].extend(steps_i)
                windows["bin_l2_all"].extend(cur_ep["bin"][done] / steps_i)
                windows["mono_l2_all"].extend(cur_ep["mono"][done] / steps_i)
                windows["mem_l2_all"].extend(cur_ep["mem"][done] / steps_i)
                windows["mono_l2_last"].extend(st["mono_l2"][t, done])
                windows["mem_l2_last"].extend(st["mem_l2"][t, done])
                windows["ndg"].extend(st["ndg"][t, done])
                windows["dg"].extend(st["geo"][t, done])
                for k in cur_ep:
                    cur_ep[k][done] = 0.0

    # ------------------------------------------------------------------
    def _save(self, state, update_count, ckpt_idx):
        save_checkpoint(
            os.path.join(self.config.CHECKPOINT_FOLDER, f"ckpt.{ckpt_idx}.pth"),
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state_pol": state.opt_state_pol,
                "opt_state_sep": state.opt_state_sep,
                "extra_state": {"update_count": update_count},
                "config": self.config.to_dict(),
            },
        )

    def load_checkpoint(self, checkpoint_path: str):
        return load_checkpoint(checkpoint_path)

    def _eval_checkpoint(self, checkpoint_path: str, checkpoint_index: int = 0):
        """Merge the checkpoint's saved config per EVAL.USE_CKPT_CONFIG
        (base_trainer.py:104-140; switch-policy eval reads the nav policy's
        saved config, ppo_trainer.py:1036-1049), then route: the batched
        device evaluator for large episode counts, the reference-shaped 1-env
        host evaluator otherwise."""
        cfg = self.config
        saved = (load_checkpoint(checkpoint_path).get("config") or {})
        if cfg.RL.PPO.switch_policy:
            nav_cfg = saved.get("config_nav") if isinstance(saved, dict) else None
            config = self._setup_eval_config(nav_cfg, cfg) if nav_cfg else cfg
        elif cfg.EVAL.USE_CKPT_CONFIG and saved:
            config = self._setup_eval_config(saved, cfg)
        else:
            config = cfg

        # file-backed data resolves against the MERGED eval config (its
        # DATASET.SPLIT / MONO_DIR may differ from the train config — the
        # Unheard presets repoint both)
        bundle = self._bundle
        if bundle is None:
            from move2hear_tpu.env.bundle import (
                bundle_from_config,
                has_file_backed_data,
            )

            if has_file_backed_data(config.TASK_CONFIG):
                bundle = bundle_from_config(
                    config.TASK_CONFIG,
                    max_rir_length=config.TPU.MAX_RIR_LENGTH,
                )

        n_eps = config.get("EVAL_EPISODE_COUNT", config.EVAL.EPISODE_COUNT)
        use_device = (
            config.TPU.DEVICE_ENV
            and n_eps >= config.TPU.get("DEVICE_EVAL_MIN_EPISODES", 64)
        )
        if use_device and bundle is not None:
            from move2hear_tpu.env.device_env import estimate_bank_bytes

            use_device = estimate_bank_bytes(bundle) <= int(
                config.TPU.MAX_DEVICE_BANK_BYTES
            )
        if use_device:
            from move2hear_tpu.eval.device_evaluator import (
                evaluate_checkpoint_device,
            )

            return evaluate_checkpoint_device(
                config, checkpoint_path, checkpoint_index, bundle=bundle
            )
        from move2hear_tpu.eval.evaluator import evaluate_checkpoint

        return evaluate_checkpoint(
            config, checkpoint_path, checkpoint_index, bundle=bundle
        )

