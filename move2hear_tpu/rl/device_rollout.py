"""Fully on-device rollout collection.

One jitted program collects an entire T-step rollout: ``lax.scan`` over
{render from banks -> separator chain -> acoustic memory -> policy act ->
device env step}, followed by a single extra forward on the final observation
(for the reward baseline q_T and the bootstrap value). Zero host round-trips
during collection — the reference instead crosses the host/device boundary
4+ times per step (ppo_trainer.py:253-478).

Reward semantics match the reference exactly (env_utils.py:690-714 applied
at ppo_trainer.py:385-405):
  r_t = not_done_t * (q_{t+1} - q_t)            at ordinary steps,
  r_t = not_done_t * 2 * extra_mult * q_{t+1}   at episode step MAX-2,
  q = -MSE(memPred, gt_mono)/mean(gt_mono^2).
The bonus-step form reproduces the reference's list aliasing: the "extra"
override_rewards call MUTATES the same rewards list it returns, so
``np.array(rewards) + np.array(rewards_extra)`` doubles extra_mult*q_next
and the quality-improvement delta is discarded (ppo_trainer.py:395-405).
tests/test_rl_core.py::test_reward_override_matches_reference_aliasing
replays the reference's call sequence to pin this. Nav path: r_t =
geodesic delta * scale.

The separator-refit buffer stores only *bank indices* per step
(RolloutSepIdx); update_sep_device re-renders from the banks inside the loss.
"""

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from move2hear_tpu.env.device_env import (
    DeviceBundle,
    DeviceEnvState,
    env_step,
    gather_sensors,
    observe,
)
from move2hear_tpu.eval.metrics import stft_l2_distance
from move2hear_tpu.models.policy import ActOutput, Move2HearPolicy
from move2hear_tpu.ops.frontend import (
    render_binaural_mixture,
    render_binaural_mixture_pre,
)
from move2hear_tpu.rl.gae import compute_returns
from move2hear_tpu.rl.ppo import (
    AgentState,
    PPOConfig,
    SEP_TRAIN_KEYS,
    _epoch_perms,
    _split,
    make_optimizers,
)


class RolloutSepIdx(flax.struct.PyTreeNode):
    """(T_sep, N, ...) separator-refit buffer.

    Stores bank indices (enough to re-render everything) PLUS the
    frozen-separator outputs the memory refit actually consumes —
    ``pred_mono`` / ``gt_mono`` — which the collect scan computes anyway with
    the SAME (frozen) separator params, so caching them is bit-exact and the
    refit skips re-rendering + both U-Net forwards over the whole buffer
    entirely (measured 0.63 s -> ms per cycle at bench shapes). ``bin_l1`` /
    ``mono_l1`` are the per-step logging losses (also invariant under the
    frozen separators). Still far below the reference's storage of every
    rendered sensor for 120 steps (rollout_storage.py:315-471)."""

    sound_ids: jnp.ndarray     # (T, N, S)
    az_idx: jnp.ndarray        # (T, N)
    scene_idx: jnp.ndarray     # (T, N) scene index into the device banks
    node: jnp.ndarray          # (T, N)
    sources: jnp.ndarray       # (T, N, S)
    target_class: jnp.ndarray  # (T, N, 1)
    prev_mem: jnp.ndarray      # (T, N, F, Tt, 1) memory entering the step
    masks: jnp.ndarray         # (T, N, 1) not-done mask entering the step
    pred_mono: jnp.ndarray     # (T, N, F, Tt, 1) frozen bin2mono output
    gt_mono: jnp.ndarray       # (T, N, F, Tt, 1) GT mono magnitude
    bin_l1: jnp.ndarray        # (T, N) logging L1(bin)
    mono_l1: jnp.ndarray       # (T, N) logging L1(mono)

    @classmethod
    def create(cls, t_total, n, s, f=512, tt=32, slab_dtype=jnp.float32):
        """`slab_dtype` (TPU.SEP_SLAB_DTYPE) sets the storage dtype of the
        three big spectrogram slabs; bfloat16 halves write+refit HBM traffic
        (write_sep_slab casts on write; the refit promotes back to the
        compute dtype inside the loss)."""
        z = jnp.zeros
        return cls(
            sound_ids=z((t_total, n, s), jnp.int32),
            az_idx=z((t_total, n), jnp.int32),
            scene_idx=z((t_total, n), jnp.int32),
            node=z((t_total, n), jnp.int32),
            sources=z((t_total, n, s), jnp.int32),
            target_class=z((t_total, n, 1), jnp.int32),
            prev_mem=z((t_total, n, f, tt, 1), slab_dtype),
            masks=jnp.ones((t_total, n, 1)),
            pred_mono=z((t_total, n, f, tt, 1), slab_dtype),
            gt_mono=z((t_total, n, f, tt, 1), slab_dtype),
            bin_l1=z((t_total, n)),
            mono_l1=z((t_total, n)),
        )


# packed stats layout (last axis): q, bin_l2, mono_l2, mem_l2, done, geo,
# ndg, reward, then the action-probability vector
STAT_FIELDS = ("q", "bin_l2", "mono_l2", "mem_l2", "done", "geo", "ndg",
               "reward")


def unpack_stats(packed) -> Dict[str, Any]:
    """(... , N, K) packed stats -> dict of (..., N) arrays + 'probs'."""
    out = {name: packed[..., i] for i, name in enumerate(STAT_FIELDS)}
    out["probs"] = packed[..., len(STAT_FIELDS):]
    return out


def sep_reward(q_now, q_next, not_done, at_bonus, extra_reward_multiplier):
    """Effective per-step separation reward, matching the reference's
    observed semantics (env_utils.py:690-714 as invoked at
    ppo_trainer.py:385-405):

      r = not_done * (q_next - q_now)                 ordinary steps
      r = not_done * 2 * extra_mult * q_next          at episode step MAX-2

    The bonus-step form reproduces the reference's list aliasing — the
    "extra" ``override_rewards`` call mutates the same rewards list it
    returns, so ``np.array(rewards) + np.array(rewards_extra)`` doubles
    ``extra_mult * q_next`` and discards the quality-improvement delta.
    Golden-pinned by tests/test_rl_core.py::
    test_sep_reward_matches_reference_aliasing. Shapes broadcast; all
    arguments are float arrays except ``at_bonus`` (bool or float)."""
    bonus = jnp.asarray(at_bonus).astype(jnp.float32)
    return not_done * (
        (1.0 - bonus) * (q_next - q_now)
        + bonus * 2.0 * extra_reward_multiplier * q_next
    )


class CollectOutput(NamedTuple):
    env_state: DeviceEnvState
    hidden: jnp.ndarray
    masks: jnp.ndarray            # (N, 1) entering the next step
    prev_mem_masked: jnp.ndarray  # (N, F, T, 1)
    rollouts_pol: Dict[str, Any]  # ready for make_update_pol
    sep_slab: Dict[str, Any]      # (T, ...) slices for the sep buffer
    stats: jnp.ndarray            # (T, N, K) packed logging stats


def _forward(policy, variables, obs, prev_mem_masked):
    pred_masks = policy.apply(variables, obs, method=Move2HearPolicy.get_binSepMasks)
    pred_mono = policy.apply(
        variables, pred_masks, obs["mixed_bin_audio_mag"],
        method=Move2HearPolicy.convert_bin2mono,
    )
    pred_mem = policy.apply(
        variables, pred_mono, prev_mem_masked,
        method=Move2HearPolicy.get_monoFromMem,
    )
    return pred_masks, pred_mono, pred_mem


def _obs_from_sensors(sensors, gt_norm):
    # mags_only: the collect scan consumes phases only through
    # stft_l2_distance, whose same-phase-both-sides form is phase-independent
    # (cos^2+sin^2 == 1), so the angle/atan2 work is dead — zero phases let
    # XLA DCE every transcendental in the render (ops/frontend._bin_and_mix)
    if "mono_rfft" in sensors:
        # precomputed-bank path: per-sound forward FFTs + GT mono specs are
        # static (and optionally the RIR rffts too), leaving only inverse
        # FFTs + binaural/mixture STFTs per step
        rendered = render_binaural_mixture_pre(
            sensors["mono_rfft"], sensors.get("rirs"),
            sensors["gt_mono_raw"], sensors["mono_len"],
            gt_mono_mag_norm=gt_norm,
            rir_rfft=sensors.get("rir_rfft"),
            rir_len=sensors.get("rir_len", 0),
            mags_only=True,
        )
    else:
        rendered = render_binaural_mixture(
            sensors["mono"], sensors["rirs"], gt_mono_mag_norm=gt_norm,
            mags_only=True,
        )
    obs = {
        "mixed_bin_audio_mag": rendered.mixed_bin_audio_mag,
        "gt_bin_comps": rendered.gt_bin_comps,
        "gt_mono_comps": rendered.gt_mono_comps,
        "target_class": sensors["target_class"],
    }
    if "rgb" in sensors:
        obs["rgb"] = sensors["rgb"]
    if "depth" in sensors:
        obs["depth"] = sensors["depth"]
    return obs


def make_collect(
    policy: Move2HearPolicy,
    cfg: PPOConfig,
    t_steps: int,
    max_episode_steps: int,
    gt_mono_mag_norm: float,
    sep_rewards: bool,
    extra_reward_multiplier: float,
    nav_reward_scale: float,
    action_codes: Tuple[int, ...],
    pol_sensors: Tuple[str, ...],
    scan_unroll: int = 1,
    pose_obs: bool = False,
):
    """Build the jitted full-rollout collector.

    scan_unroll: lax.scan unroll factor — production keeps 1; the MFU probe
    compiles fully-unrolled tiny-T variants because XLA cost_analysis counts
    a rolled scan body once regardless of trip count.

    pose_obs: store an integer "pose" index in the rollout observations
    instead of the rgb/depth frames themselves (requires the per-rollout
    visual-feature bank to be active — the trainer passes the matching
    pose_bank flag to make_update_pol). Skips writing ~(T, N, 128, 128, 4)
    of frame slabs to HBM per rollout, and lets the policy update run the
    visual conv stack per distinct pose instead of per step.

    The DeviceBundle is a runtime ARGUMENT of the returned function, not a
    closure capture: closed-over dense device arrays lower into the HLO as
    literal constants, which ships the multi-hundred-MB banks inside every
    compile request (remote-compile runtimes cap the request size — the
    rfft'd RIR bank made the collect program exceed it) and bloats compile
    time everywhere."""
    codes = jnp.asarray(action_codes, jnp.int32)

    def q_util(pred_mem, gt_mono_mag):
        mse = jnp.mean(jnp.square(pred_mem - gt_mono_mag), axis=(1, 2, 3))
        pw = jnp.mean(jnp.square(gt_mono_mag), axis=(1, 2, 3))
        return -mse / jnp.maximum(pw, 1e-12)

    def collect(
        dev: DeviceBundle,
        params,
        batch_stats,
        env_state: DeviceEnvState,
        hidden,
        masks,
        prev_mem_masked,
        rng,
    ) -> CollectOutput:
        variables = {"params": params}
        if batch_stats:
            variables = {"params": params, "batch_stats": batch_stats}
        hidden0 = hidden  # hidden entering step 0 -> rollout slot 0

        # Per-rollout visual-feature bank: params are frozen across the T
        # collected steps, so the pol-net conv stack over the S*V*4 distinct
        # poses can run ONCE as a single batch, and the scan gathers a
        # (N, hidden) row per step. Only when the pose count does not exceed
        # the N*T per-step evaluations it replaces (static shapes decide).
        vis_bank = None
        frame_bank = dev.rgb_bank if dev.rgb_bank is not None else dev.depth_bank
        if frame_bank is not None:
            n_envs = masks.shape[0]
            s, v = frame_bank.shape[0], frame_bank.shape[1]
            if s * v * 4 <= n_envs * t_steps:
                flat = lambda b: (
                    None if b is None
                    else b.reshape((-1,) + b.shape[3:])
                )
                vis_bank = policy.apply(
                    variables, flat(dev.rgb_bank), flat(dev.depth_bank),
                    method=Move2HearPolicy.visual_features,
                )
        if pose_obs and vis_bank is None:
            raise ValueError(
                "make_collect(pose_obs=True) requires the per-rollout "
                "visual-feature bank (a frame bank with S*V*4 <= N*T)"
            )

        def pose_of(obs_idx):
            v = frame_bank.shape[1]
            return (obs_idx.scene_idx * v + obs_idx.node) * 4 + obs_idx.rot_idx

        def with_vis(obs, obs_idx):
            if vis_bank is None:
                return obs
            return {**obs, "visual_feats": vis_bank[pose_of(obs_idx)]}

        def step_fn(carry, rng_t):
            env_state, hidden, masks, prev_mem_masked = carry
            obs_idx = observe(dev.episodes, env_state)
            sensors = gather_sensors(dev, obs_idx)
            obs = _obs_from_sensors(sensors, gt_mono_mag_norm)

            pred_masks, pred_mono, pred_mem = _forward(
                policy, variables, obs, prev_mem_masked
            )
            act: ActOutput = policy.apply(
                variables, with_vis(obs, obs_idx), hidden, masks,
                pred_masks, pred_mono, pred_mem,
                rng_t, False, method=Move2HearPolicy.act,
            )

            gt_mono_mag = obs["gt_mono_comps"][..., 0::2][..., :1]
            q = q_util(pred_mem, gt_mono_mag)
            # per-step logging L1 losses for the sep refit (frozen separators
            # make them invariant, so compute once here; ppo.py:236-238)
            gt_bin_mag = obs["gt_bin_comps"][..., 0::2][..., :2]
            bin_l1 = jnp.abs(
                jnp.expm1(obs["mixed_bin_audio_mag"]) * pred_masks - gt_bin_mag
            ).mean(axis=(1, 2, 3))
            mono_l1 = jnp.abs(pred_mono - gt_mono_mag).mean(axis=(1, 2, 3))
            bin_l2, mono_l2 = stft_l2_distance(
                obs["mixed_bin_audio_mag"], pred_masks, obs["gt_bin_comps"],
                pred_mono, obs["gt_mono_comps"],
            )
            _, mem_l2 = stft_l2_distance(
                obs["mixed_bin_audio_mag"], pred_masks, obs["gt_bin_comps"],
                pred_mem, obs["gt_mono_comps"],
            )

            # bonus flag BEFORE stepping: completed steps == MAX-2
            # (ppo_trainer.py:395)
            at_bonus = env_state.step_count == max_episode_steps - 2

            new_env_state, info = env_step(
                dev.scene, dev.episodes, env_state,
                codes[act.action[:, 0]], max_episode_steps,
            )
            masks_next = 1.0 - info["done"].astype(jnp.float32)[:, None]
            prev_mem_next = pred_mem * masks_next[:, :, None, None]

            if pose_obs:
                stored_obs = {
                    k: obs[k] for k in pol_sensors if k not in ("rgb", "depth")
                }
                stored_obs["pose"] = pose_of(obs_idx)
            else:
                stored_obs = {k: obs[k] for k in pol_sensors}
            out = {
                "obs": stored_obs,
                "pred_masks": pred_masks,
                "pred_mono": pred_mono,
                "pred_mem": pred_mem,
                "value": act.value,
                "action": act.action.astype(jnp.int32),
                "log_prob": act.action_log_probs,
                "hidden": act.hidden,
                "masks_in": masks,
                "masks_next": masks_next,
                "prev_mem_in": prev_mem_masked,
                "q": q,
                "bin_l2": bin_l2,
                "mono_l2": mono_l2,
                "mem_l2": mem_l2,
                "at_bonus": at_bonus,
                "done": info["done"],
                "nav_reward": info["nav_reward"],
                "geo": info["geo"],
                "ndg": info["ndg"],
                "probs": act.probs,
                "sep_idx": {
                    "sound_ids": obs_idx.sound_ids,
                    "az_idx": obs_idx.azimuth_idx,
                    "scene_idx": obs_idx.scene_idx,
                    "node": obs_idx.node,
                    "sources": obs_idx.sources,
                    "target_class": obs_idx.target_class,
                    "pred_mono": pred_mono,
                    "gt_mono": gt_mono_mag,
                    "bin_l1": bin_l1,
                    "mono_l1": mono_l1,
                },
            }
            return (new_env_state, act.hidden, masks_next, prev_mem_next), out

        (env_state, hidden, masks, prev_mem_masked), outs = jax.lax.scan(
            step_fn,
            (env_state, hidden, masks, prev_mem_masked),
            jax.random.split(rng, t_steps),
            unroll=scan_unroll,
        )

        # final forward on obs_T: bootstrap value + q_T for the last reward
        obs_idx_T = observe(dev.episodes, env_state)
        sensors_T = gather_sensors(dev, obs_idx_T)
        obs_T = _obs_from_sensors(sensors_T, gt_mono_mag_norm)
        pm_T, mono_T, mem_T = _forward(policy, variables, obs_T, prev_mem_masked)
        value_T = policy.apply(
            variables, with_vis(obs_T, obs_idx_T), hidden, masks,
            pm_T, mono_T, mem_T,
            method=Move2HearPolicy.get_value,
        )
        gt_T = obs_T["gt_mono_comps"][..., 0::2][..., :1]
        q_T = q_util(mem_T, gt_T)

        # rewards (one-step-ahead q): q series length T+1
        q_full = jnp.concatenate([outs["q"], q_T[None]], axis=0)  # (T+1, N)
        if sep_rewards:
            not_done = 1.0 - outs["done"].astype(jnp.float32)
            rewards = sep_reward(
                q_full[:-1], q_full[1:], not_done, outs["at_bonus"],
                extra_reward_multiplier,
            )
        else:
            rewards = outs["nav_reward"] * nav_reward_scale
        rewards = rewards[:, :, None]  # (T, N, 1)

        # assemble the (T+1)-slot views make_update_pol expects
        masks_full = jnp.concatenate(
            [outs["masks_in"][:1], outs["masks_next"]], axis=0
        )
        value_preds = jnp.concatenate([outs["value"], value_T[None]], axis=0)
        returns = compute_returns(
            rewards, value_preds, masks_full, cfg.gamma, cfg.tau, cfg.use_gae
        )
        rollouts_pol = {
            "observations": {
                k: jnp.concatenate([v, v[-1:]], axis=0)
                for k, v in outs["obs"].items()
            },
            "hidden": jnp.concatenate([hidden0[None], outs["hidden"]], axis=0),
            "pred_binSepMasks": outs["pred_masks"],
            "pred_mono": outs["pred_mono"],
            "prev_pred_monoFromMem": jnp.concatenate(
                [outs["prev_mem_in"][:1], outs["pred_mem"]], axis=0
            ),
            "rewards": rewards,
            "value_preds": value_preds,
            "returns": returns,
            "action_log_probs": outs["log_prob"],
            "actions": outs["action"],
            "masks": masks_full,
        }
        sep_slab = {
            **outs["sep_idx"],
            "prev_mem": outs["prev_mem_in"],
            "masks": outs["masks_in"],
        }
        # pack ALL logging stats into ONE (T, N, K) array: a single
        # host fetch instead of ~15 per-leaf transfers (each pays a full
        # round trip on tunneled runtimes)
        stats = jnp.concatenate(
            [
                outs["q"][..., None],
                outs["bin_l2"],
                outs["mono_l2"],
                outs["mem_l2"],
                outs["done"][..., None].astype(jnp.float32),
                outs["geo"][..., None],
                outs["ndg"][..., None],
                rewards,
                outs["probs"],
            ],
            axis=-1,
        )
        return CollectOutput(
            env_state=env_state,
            hidden=hidden,
            masks=masks,
            prev_mem_masked=prev_mem_masked,
            rollouts_pol=rollouts_pol,
            sep_slab=sep_slab,
            stats=stats,
        )

    return collect


def concat_collect_outputs(
    prefix: CollectOutput, tail: CollectOutput, cfg: PPOConfig
) -> CollectOutput:
    """Join two consecutive collect segments (the DDPPO preemptive-sync
    split: a prefix of ceil(short_rollout_threshold * T) steps dispatched
    first, then — if no early stop — the remaining tail) back into one
    full-length rollout, recomputing GAE/returns over the joined horizon.

    Segment boundaries are exact: the prefix's final forward and the tail's
    step-0 forward see the same observation and params, so the prefix's last
    reward (which used its final-forward q) and the tail's step-0 value are
    the values the unsegmented program would have produced."""
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    p, t = prefix.rollouts_pol, tail.rollouts_pol

    rewards = cat(p["rewards"], t["rewards"])
    value_preds = cat(p["value_preds"][:-1], t["value_preds"])
    masks = cat(p["masks"][:-1], t["masks"])
    returns = compute_returns(
        rewards, value_preds, masks, cfg.gamma, cfg.tau, cfg.use_gae
    )
    rollouts_pol = {
        "observations": {
            k: cat(p["observations"][k][:-1], t["observations"][k])
            for k in p["observations"]
        },
        "hidden": cat(p["hidden"], t["hidden"][1:]),
        "pred_binSepMasks": cat(p["pred_binSepMasks"], t["pred_binSepMasks"]),
        "pred_mono": cat(p["pred_mono"], t["pred_mono"]),
        "prev_pred_monoFromMem": cat(
            p["prev_pred_monoFromMem"], t["prev_pred_monoFromMem"][1:]
        ),
        "rewards": rewards,
        "value_preds": value_preds,
        "returns": returns,
        "action_log_probs": cat(
            p["action_log_probs"], t["action_log_probs"]
        ),
        "actions": cat(p["actions"], t["actions"]),
        "masks": masks,
    }
    return CollectOutput(
        env_state=tail.env_state,
        hidden=tail.hidden,
        masks=tail.masks,
        prev_mem_masked=tail.prev_mem_masked,
        rollouts_pol=rollouts_pol,
        sep_slab={
            k: cat(prefix.sep_slab[k], tail.sep_slab[k])
            for k in prefix.sep_slab
        },
        stats=cat(prefix.stats, tail.stats),
    )


def make_collect_and_update(collect_fn, update_pol_fn):
    """Fuse one rollout collection with its policy update into a single
    program: the ~1 GB rollout tensors never surface as program outputs, and
    one dispatch replaces two (each costs a full RTT on tunneled runtimes)."""

    def step(dev, state, env_state, hidden, masks, prev_mem, rng_c, rng_u,
             lr_scale=1.0, clip_scale=1.0):
        out = collect_fn(
            dev, state.params, state.batch_stats, env_state, hidden, masks,
            prev_mem, rng_c,
        )
        state, losses = update_pol_fn(
            state, out.rollouts_pol, rng_u, lr_scale, clip_scale
        )
        return (
            state, out.env_state, out.hidden, out.masks, out.prev_mem_masked,
            out.sep_slab, jnp.stack(losses), out.stats,
        )

    return step


def make_update_sep_n(update_sep_fn, n_updates: int):
    """Run n separator refits as one scanned program. The index buffer is a
    read-only input (no in-scan aliasing hazard, unlike the full fused
    cycle)."""

    def run(state, sep_buf, banks, rng, lr_scales):
        def body(state, inp):
            i, lr = inp
            state, sl = update_sep_fn(
                state, sep_buf, banks, jax.random.fold_in(rng, i), lr
            )
            return state, jnp.stack(sl)

        state, losses = jax.lax.scan(
            body, state, (jnp.arange(n_updates), lr_scales)
        )
        return state, losses

    return run


def make_update_sep_cached(
    policy: Move2HearPolicy,
    cfg: PPOConfig,
    num_envs: int,
    gt_mono_mag_norm: float,
    n_updates: int,
):
    """All `n_updates` separator refits of a cycle in one program, with the
    frozen-separator forward pass HOISTED: rendering + binSep + bin2mono over
    the whole buffer run ONCE, then n_updates x ppo_epoch x num_mini_batch
    memory-only grad steps train on the cached tensors.

    Mathematically identical to the reference (ppo.py:179-246): the passive
    separators are frozen (no_grad) and BatchNorm uses running stats, so
    their outputs cannot change between epochs — the reference just
    recomputes them every minibatch anyway. Measured on v5e this turns the
    dominant cycle cost (6 x 1.28 s) into one ~0.35 s pass + millisecond
    memory steps."""

    def precompute(params, batch_stats, banks, buf: RolloutSepIdx):
        variables = {"params": params}
        if batch_stats:
            variables = {"params": params, "batch_stats": batch_stats}
        wav_bank, rir_bank = banks
        t, n = buf.masks.shape[0], buf.masks.shape[1]
        flat = lambda v: v.reshape((t * n,) + v.shape[2:])

        mono = wav_bank[flat(buf.sound_ids)]
        rirs = rir_bank[
            flat(buf.scene_idx)[:, None], flat(buf.az_idx)[:, None],
            flat(buf.node)[:, None], flat(buf.sources)
        ]
        rendered = render_binaural_mixture(
            mono, rirs, gt_mono_mag_norm=gt_mono_mag_norm, mags_only=True
        )
        mix = rendered.mixed_bin_audio_mag
        obs_flat = {
            "mixed_bin_audio_mag": mix,
            "target_class": flat(buf.target_class),
        }
        pred_masks = policy.apply(
            variables, obs_flat, method=Move2HearPolicy.get_binSepMasks
        )
        pred_mono = policy.apply(
            variables, pred_masks, mix, method=Move2HearPolicy.convert_bin2mono
        )
        gt_mono_mag = rendered.gt_mono_comps[..., 0::2][..., :1]
        gt_bin_mag = rendered.gt_bin_comps[..., 0::2][..., :2]
        bin_loss = jnp.abs(jnp.expm1(mix) * pred_masks - gt_bin_mag).mean()
        mono_loss = jnp.abs(pred_mono - gt_mono_mag).mean()
        return (
            pred_mono.reshape(t, n, *pred_mono.shape[1:]),
            gt_mono_mag.reshape(t, n, *gt_mono_mag.shape[1:]),
            bin_loss,
            mono_loss,
        )

    def update(state: AgentState, buf: RolloutSepIdx, banks, rng, lr_scales):
        pred_mono, gt_mono, bin_loss, mono_loss = precompute(
            state.params, state.batch_stats, banks, buf
        )
        from move2hear_tpu.ops.spec import slice16

        # hoisted layout permutation, once per refit (not per grad step)
        mono_s = slice16(pred_mono.astype(jnp.float32))
        gt_s = slice16(gt_mono.astype(jnp.float32))
        prev_s = slice16(buf.prev_mem.astype(jnp.float32))
        state, mem_losses = _mem_refit_scan(
            policy, cfg, n_updates, False, None,
            state, mono_s, gt_s, prev_s, buf.masks, rng, lr_scales, None,
        )
        per_update = jnp.stack(
            [
                jnp.broadcast_to(bin_loss, (n_updates,)),
                jnp.broadcast_to(mono_loss, (n_updates,)),
                mem_losses,
            ],
            axis=1,
        )  # (n_updates, 3) matching the per-update loss logging
        return state, per_update

    return update


def make_train_cycle(
    policy: Move2HearPolicy,
    cfg: PPOConfig,
    collect_fn,
    update_pol_fn,
    update_sep_cached_fn,
    cycle: int,
    t_steps: int,
    num_updates_total: int,
    use_lr_decay: bool,
    use_clip_decay: bool,
):
    """Fuse one FULL training cycle — `cycle` x (collect rollout + policy
    update), then the cached separator refit over the cycle's index slabs
    (the reference's ppo_trainer.py:730-994 schedule) — into a single jitted
    program: ONE dispatch + one stats fetch per cycle.

    The separator slabs are `lax.scan` OUTPUTS (written in place by the scan
    machinery) rather than a dynamically-updated carry buffer — the first
    fused attempt carried the 1.4 GB buffer and XLA copied it per
    sub-update."""

    def cycle_fn(
        dev: DeviceBundle,
        state: AgentState,
        env_state,
        hidden,
        masks,
        prev_mem,
        rng,
        update_idx0,
    ):
        def decay(idx):
            return 1.0 - idx.astype(jnp.float32) / num_updates_total

        def body(carry, sub):
            state, env_state, hidden, masks, prev_mem = carry
            rng_c = jax.random.fold_in(rng, 2 * sub)
            rng_u = jax.random.fold_in(rng, 2 * sub + 1)
            out = collect_fn(
                dev, state.params, state.batch_stats, env_state, hidden,
                masks, prev_mem, rng_c,
            )
            idx = update_idx0 + sub
            lr_scale = decay(idx) if use_lr_decay else 1.0
            clip_scale = decay(idx) if use_clip_decay else 1.0
            state, losses = update_pol_fn(
                state, out.rollouts_pol, rng_u, lr_scale, clip_scale
            )
            carry = (
                state, out.env_state, out.hidden, out.masks,
                out.prev_mem_masked,
            )
            return carry, (jnp.stack(losses), out.stats, out.sep_slab)

        (state, env_state, hidden, masks, prev_mem), (
            pol_losses, stats, sep_slabs,
        ) = jax.lax.scan(
            body,
            (state, env_state, hidden, masks, prev_mem),
            jnp.arange(cycle),
        )

        # (cycle, T, N, ...) slabs -> a (cycle*T, N, ...) index buffer
        def flat(v):
            return v.reshape((cycle * t_steps,) + v.shape[2:])

        sep_buf = RolloutSepIdx(
            sound_ids=flat(sep_slabs["sound_ids"]),
            az_idx=flat(sep_slabs["az_idx"]),
            scene_idx=flat(sep_slabs["scene_idx"]),
            node=flat(sep_slabs["node"]),
            sources=flat(sep_slabs["sources"]),
            target_class=flat(sep_slabs["target_class"]),
            prev_mem=flat(sep_slabs["prev_mem"]),
            masks=flat(sep_slabs["masks"]),
            pred_mono=flat(sep_slabs["pred_mono"]),
            gt_mono=flat(sep_slabs["gt_mono"]),
            bin_l1=flat(sep_slabs["bin_l1"]),
            mono_l1=flat(sep_slabs["mono_l1"]),
        )
        lr_scales = (
            jax.vmap(decay)(update_idx0 + jnp.arange(cycle))
            if use_lr_decay
            else jnp.ones((cycle,), jnp.float32)
        )
        state, sep_losses = update_sep_cached_fn(
            state, sep_buf, jax.random.fold_in(rng, 999), lr_scales
        )
        return (
            state, env_state, hidden, masks, prev_mem,
            pol_losses, sep_losses, stats,
        )

    return cycle_fn


@partial(jax.jit, donate_argnums=(0,))
def write_sep_slab(
    buf: RolloutSepIdx, slab: Dict[str, jnp.ndarray], offset
) -> RolloutSepIdx:
    upd = lambda b, v: jax.lax.dynamic_update_slice_in_dim(
        b, v.astype(b.dtype), offset, axis=0
    )
    return buf.replace(
        sound_ids=upd(buf.sound_ids, slab["sound_ids"]),
        az_idx=upd(buf.az_idx, slab["az_idx"]),
        scene_idx=upd(buf.scene_idx, slab["scene_idx"]),
        node=upd(buf.node, slab["node"]),
        sources=upd(buf.sources, slab["sources"]),
        target_class=upd(buf.target_class, slab["target_class"]),
        prev_mem=upd(buf.prev_mem, slab["prev_mem"]),
        masks=upd(buf.masks, slab["masks"]),
        pred_mono=upd(buf.pred_mono, slab["pred_mono"]),
        gt_mono=upd(buf.gt_mono, slab["gt_mono"]),
        bin_l1=upd(buf.bin_l1, slab["bin_l1"]),
        mono_l1=upd(buf.mono_l1, slab["mono_l1"]),
    )


def _mem_refit_scan(
    policy: Move2HearPolicy,
    cfg: PPOConfig,
    n_updates: int,
    with_validity: bool,
    refit_dtype,
    state: AgentState,
    mono_s,
    gt_s,
    prev_s,
    masks,
    rng,
    lr_scales,
    row_weights,
    scan_unroll: int = 1,
):
    """Shared grad-step scan of the cached separator refits.

    Every loop-invariant input transform — masking the carried memory, the
    channel concat, row flattening, validity-weight broadcast — is hoisted
    OUT of the scan (measured ~40 ms/cycle of re-materialized 100MB-scale
    intermediates at the bench shapes when done per step). The loss applies
    the standalone AcousticMem on the same 'acoustic_mem' parameter subtree
    the policy owns, so the update math matches routing through
    Move2HearPolicy exactly (ppo.py:179-246 semantics).

    refit_dtype: conv compute dtype for the refit only (params, optimizer
    state and the L1 loss stay float32); defaults to the policy dtype."""
    from move2hear_tpu.models.memory import AcousticMem

    _, tx_sep = make_optimizers(cfg)
    sg = jax.lax.stop_gradient
    sep_params, frozen = _split(state.params, SEP_TRAIN_KEYS)
    num_envs = masks.shape[1]
    t, n = masks.shape[0], masks.shape[1]
    x_cat = jnp.concatenate(
        [mono_s, prev_s * masks.reshape(t, n, 1, 1, 1)], axis=-1
    )
    steps_per_update = cfg.ppo_epoch * cfg.num_mini_batch
    perms = (
        jnp.arange(n_updates * steps_per_update)
        if cfg.num_mini_batch == 1
        else jnp.concatenate(
            [
                _epoch_perms(
                    jax.random.fold_in(rng, u), cfg.ppo_epoch, num_envs,
                    cfg.num_mini_batch,
                )
                for u in range(n_updates)
            ]
        )
    )
    lrs = jnp.repeat(lr_scales, steps_per_update) * cfg.lr_sep
    full_batch = cfg.num_mini_batch == 1

    mem_mod = AcousticMem(
        use_ddppo=policy.use_ddppo,
        dtype=refit_dtype if refit_dtype is not None else policy.dtype,
    )
    bn_stats = (state.batch_stats or {}).get("acoustic_mem")

    def flat(v):
        return v.reshape((v.shape[0] * v.shape[1],) + v.shape[2:])

    if full_batch:
        x_full, g_full = flat(x_cat), flat(gt_s)
    w_full = None
    if with_validity:
        assert row_weights is not None
        w_full = jnp.broadcast_to(row_weights[:, None], (t, n)).reshape(t * n)

    def mem_loss(sep_params, x, g, w):
        variables = {"params": sep_params["acoustic_mem"]}
        if bn_stats:
            variables["batch_stats"] = bn_stats
        pred = mem_mod.apply(variables, sg(x), sliced=True)
        err = jnp.abs(pred.astype(jnp.float32) - sg(g))
        if w is not None:
            per = err.mean(axis=(1, 2, 3))
            return (per * w).sum() / jnp.maximum(w.sum(), 1.0)
        return err.mean()

    def scan_body(carry, inp):
        sep_params, opt_state = carry
        idx, lr = inp
        if full_batch:
            x, g, w = x_full, g_full, w_full
        else:
            x, g = flat(x_cat[:, idx]), flat(gt_s[:, idx])
            w = (
                jnp.broadcast_to(
                    row_weights[:, None], (t, idx.shape[0])
                ).reshape(-1)
                if with_validity
                else None
            )
        loss, grads = jax.value_and_grad(mem_loss)(sep_params, x, g, w)
        updates, opt_state = tx_sep.update(grads, opt_state, sep_params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        sep_params = optax.apply_updates(sep_params, updates)
        return (sep_params, opt_state), loss

    (sep_params, opt_state), losses = jax.lax.scan(
        scan_body, (sep_params, state.opt_state_sep), (perms, lrs),
        unroll=scan_unroll,
    )
    mem_losses = losses.reshape(n_updates, steps_per_update).mean(axis=1)
    new_state = state.replace(
        params={**frozen, **sep_params}, opt_state_sep=opt_state
    )
    return new_state, mem_losses


def make_update_sep_from_slabs(
    policy: Move2HearPolicy,
    cfg: PPOConfig,
    num_envs: int,
    n_updates: int,
    with_validity: bool = False,
    refit_dtype=None,
    scan_unroll: int = 1,
):
    """All `n_updates` separator refits of a cycle in one program, consuming
    the frozen-separator outputs CACHED BY THE COLLECT SCAN (pred_mono /
    gt_mono / logging L1s in RolloutSepIdx): no re-rendering, no U-Net
    forwards at all — just n_updates x ppo_epoch x num_mini_batch
    acoustic-memory grad steps.

    Bit-identical to make_update_sep_cached (and to the reference's
    recompute-every-minibatch loop, ppo.py:179-246): the passive separators
    are frozen and BatchNorm uses running stats, so their outputs over the
    buffer cannot differ from what the rollout computed. Measured: replaces
    the 0.63 s/cycle hoisted forward with millisecond memory steps.

    With `with_validity=True` the fn takes an extra `row_weights` ((T_total,)
    float): rows left stale by preemptive-sync truncation
    (ppo_trainer.py:769-782) get zero weight in the loss and logging means."""

    def update(
        state: AgentState, buf: RolloutSepIdx, rng, lr_scales,
        row_weights=None,
    ):
        from move2hear_tpu.ops.spec import slice16

        # hoisted layout transform (see _mem_refit_scan); promote bf16 slabs
        # back to f32 here, once
        mono_s = slice16(buf.pred_mono.astype(jnp.float32))
        gt_s = slice16(buf.gt_mono.astype(jnp.float32))
        prev_s = slice16(buf.prev_mem.astype(jnp.float32))
        state, mem_losses = _mem_refit_scan(
            policy, cfg, n_updates, with_validity, refit_dtype,
            state, mono_s, gt_s, prev_s, buf.masks, rng, lr_scales,
            row_weights, scan_unroll=scan_unroll,
        )
        if with_validity:
            wsum = jnp.maximum(row_weights.sum(), 1.0)
            bin_loss = (buf.bin_l1.mean(axis=1) * row_weights).sum() / wsum
            mono_loss = (buf.mono_l1.mean(axis=1) * row_weights).sum() / wsum
        else:
            bin_loss = buf.bin_l1.mean()
            mono_loss = buf.mono_l1.mean()
        per_update = jnp.stack(
            [
                jnp.broadcast_to(bin_loss, (n_updates,)),
                jnp.broadcast_to(mono_loss, (n_updates,)),
                mem_losses,
            ],
            axis=1,
        )
        return state, per_update

    return update


def make_update_sep_device(
    policy: Move2HearPolicy,
    cfg: PPOConfig,
    num_envs: int,
    gt_mono_mag_norm: float,
):
    """Separator refit over the index buffer: re-render from banks inside the
    loss (ppo.py:179-246 semantics, acoustic-memory-only gradients)."""
    _, tx_sep = make_optimizers(cfg)
    sg = jax.lax.stop_gradient

    def minibatch_loss(sep_params, frozen, batch_stats, banks, mb):
        params = {**frozen, **sep_params}
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        wav_bank, rir_bank = banks

        t, n = mb["masks"].shape[0], mb["masks"].shape[1]
        flat = lambda v: v.reshape((t * n,) + v.shape[2:])

        sound_ids = flat(mb["sound_ids"])
        mono = wav_bank[sound_ids]
        rirs = rir_bank[
            flat(mb["scene_idx"])[:, None], flat(mb["az_idx"])[:, None],
            flat(mb["node"])[:, None], flat(mb["sources"]),
        ]
        rendered = render_binaural_mixture(
            mono, rirs, gt_mono_mag_norm=gt_mono_mag_norm, mags_only=True
        )
        mix = sg(rendered.mixed_bin_audio_mag)
        obs_flat = {
            "mixed_bin_audio_mag": mix,
            "target_class": flat(mb["target_class"]),
        }

        pred_masks = sg(
            policy.apply(variables, obs_flat, method=Move2HearPolicy.get_binSepMasks)
        )
        pred_mono = sg(
            policy.apply(
                variables, pred_masks, mix, method=Move2HearPolicy.convert_bin2mono
            )
        )
        prev_mem = flat(mb["prev_mem"])
        masks = flat(mb["masks"]).reshape(t * n, 1, 1, 1)
        pred_mem = policy.apply(
            variables, pred_mono, prev_mem * masks,
            method=Move2HearPolicy.get_monoFromMem,
        )

        gt_mono_mag = sg(rendered.gt_mono_comps[..., 0::2][..., :1])
        mem_loss = jnp.abs(pred_mem - gt_mono_mag).mean()
        mono_loss = jnp.abs(pred_mono - gt_mono_mag).mean()
        gt_bin_mag = sg(rendered.gt_bin_comps[..., 0::2][..., :2])
        bin_loss = jnp.abs(jnp.expm1(mix) * pred_masks - gt_bin_mag).mean()
        return mem_loss, (bin_loss, mono_loss, mem_loss)

    def update(state: AgentState, buf: RolloutSepIdx, banks, rng, lr_scale=1.0):
        lr = cfg.lr_sep * lr_scale
        sep_params, frozen = _split(state.params, SEP_TRAIN_KEYS)
        full_batch = cfg.num_mini_batch == 1
        perms = (
            jnp.arange(cfg.ppo_epoch)
            if full_batch
            else _epoch_perms(rng, cfg.ppo_epoch, num_envs, cfg.num_mini_batch)
        )
        fields = (
            "sound_ids", "az_idx", "scene_idx", "node", "sources",
            "target_class", "prev_mem", "masks",
        )

        def scan_body(carry, idx):
            sep_params, opt_state = carry
            if full_batch:
                mb = {k: getattr(buf, k) for k in fields}
            else:
                mb = {k: getattr(buf, k)[:, idx] for k in fields}
            grads, aux = jax.grad(minibatch_loss, has_aux=True)(
                sep_params, frozen, state.batch_stats, banks, mb
            )
            updates, opt_state = tx_sep.update(grads, opt_state, sep_params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            sep_params = optax.apply_updates(sep_params, updates)
            return (sep_params, opt_state), jnp.stack(aux)

        (sep_params, opt_state), aux = jax.lax.scan(
            scan_body, (sep_params, state.opt_state_sep), perms
        )
        bin_loss, mono_loss, mem_loss = aux.mean(axis=0)
        return (
            state.replace(
                params={**frozen, **sep_params}, opt_state_sep=opt_state
            ),
            (bin_loss, mono_loss, mem_loss),
        )

    return update
