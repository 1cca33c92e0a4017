"""PPO for Move2Hear, TPU-native (``audio_separation/rl/ppo/ppo.py``).

Two independent optimizers over disjoint parameter islands
(ppo.py:48-55):
  - optimizer_pol: pol_net + action_dist + critic, clipped-surrogate PPO with
    clipped value loss, normalized advantages, entropy bonus.
  - optimizer_sep: the separator stack. As in the reference, gradients only
    reach the acoustic memory — passive separators run frozen (no_grad,
    ppo.py:195-204) — so here optimizer_sep covers acoustic_mem exactly.

Each update (ppo_epoch x num_mini_batch minibatches over permuted envs,
rollout_storage.py:182-298) is one ``lax.scan`` inside a single jit: no
per-minibatch dispatch, no host sync. Under data parallelism the gradient
pmean and the distributed advantage mean/var (ddppo_utils.py:168-190) ride
the `axis_name` collectives — the DDPPO equivalent over ICI.
"""

from dataclasses import dataclass
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from move2hear_tpu.models.policy import Move2HearPolicy

EPS_PPO = 1e-5

POL_KEYS = ("pol_net", "action_dist", "critic")
SEP_TRAIN_KEYS = ("acoustic_mem",)
PASSIVE_KEYS = ("binSep_enc", "binSep_dec", "bin2mono_enc", "bin2mono_dec")


@dataclass(frozen=True)
class PPOConfig:
    clip_param: float = 0.1
    ppo_epoch: int = 4
    num_mini_batch: int = 1
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.2
    lr_pol: float = 1e-4
    lr_sep: float = 5e-4
    eps: float = 1e-5
    max_grad_norm: float = 0.5
    use_clipped_value_loss: bool = True
    use_normalized_advantage: bool = True
    use_gae: bool = True
    gamma: float = 0.99
    tau: float = 0.95


class AgentState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state_pol: Any
    opt_state_sep: Any


def _split(params, keys):
    train = {k: params[k] for k in keys}
    frozen = {k: v for k, v in params.items() if k not in keys}
    return train, frozen


def make_optimizers(cfg: PPOConfig):
    """Grad clip + adam direction; the learning rate is applied as an explicit
    multiply in the update so linear LR decay (utils.linear_decay, wired as
    the reference's LambdaLR at ppo_trainer.py:711-717) is a traced scalar —
    no recompile per decay step."""
    tx = lambda: optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.scale_by_adam(eps=cfg.eps),
        optax.scale(-1.0),
    )
    return tx(), tx()


def create_agent_state(cfg: PPOConfig, variables) -> AgentState:
    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables.get("batch_stats", {}))
    tx_pol, tx_sep = make_optimizers(cfg)
    pol_params, _ = _split(params, POL_KEYS)
    sep_params, _ = _split(params, SEP_TRAIN_KEYS)
    return AgentState(
        params=params,
        batch_stats=batch_stats,
        opt_state_pol=tx_pol.init(pol_params),
        opt_state_sep=tx_sep.init(sep_params),
    )


def load_pretrained_passive_separators(params, passive_params):
    """Copy the four passive-separator subtrees by name
    (ppo.py:59-70); shapes must match exactly."""
    params = dict(params)
    for key in PASSIVE_KEYS:
        src = passive_params[key]
        dst = params[key]
        jax.tree.map(
            lambda a, b: None
            if a.shape == b.shape
            else (_ for _ in ()).throw(
                ValueError(f"shape mismatch in {key}: {a.shape} vs {b.shape}")
            ),
            dst,
            src,
        )
        params[key] = jax.tree.map(lambda _, s: s, dst, src)
    return params


def _normalized_advantages(advantages, use_normalized, axis_name):
    if not use_normalized:
        return advantages
    if axis_name is None:
        mean = advantages.mean()
        std = advantages.std(ddof=1)
        return (advantages - mean) / (std + EPS_PPO)
    # distributed mean/var over the data axis (ddppo_utils.py:168-190)
    mean = jax.lax.pmean(advantages.mean(), axis_name)
    var = jax.lax.pmean(jnp.mean(jnp.square(advantages - mean)), axis_name)
    n = advantages.size * jax.lax.psum(1, axis_name)
    var = var * n / (n - 1)  # unbiased, matching torch .std()
    return (advantages - mean) / (jnp.sqrt(var) + EPS_PPO)


def _epoch_perms(rng, ppo_epoch, num_envs, num_mini_batch):
    """(ppo_epoch * num_mini_batch, envs_per_batch) env-index table: each epoch
    permutes envs and splits them into minibatches (rollout_storage.py:195-197)."""
    assert num_envs >= num_mini_batch, (
        f"need num_envs ({num_envs}) >= num_mini_batch ({num_mini_batch})"
    )
    envs_per = num_envs // num_mini_batch
    perms = jax.vmap(lambda k: jax.random.permutation(k, num_envs))(
        jax.random.split(rng, ppo_epoch)
    )
    return perms[:, : envs_per * num_mini_batch].reshape(-1, envs_per)


def _weighted_normalized_advantages(advantages, w, use_norm, axis_name):
    """Validity-weighted advantage normalization: mean/var over the `w`-masked
    elements only — equal to _normalized_advantages on the physically
    truncated buffer (unbiased n-1 variance, matching torch .std())."""
    if not use_norm:
        return advantages
    w = jnp.broadcast_to(w, advantages.shape)
    wsum = w.sum()
    ssum = (advantages * w).sum()
    if axis_name is not None:
        wsum = jax.lax.psum(wsum, axis_name)
        ssum = jax.lax.psum(ssum, axis_name)
    mean = ssum / jnp.maximum(wsum, 1.0)
    vsum = (jnp.square(advantages - mean) * w).sum()
    if axis_name is not None:
        vsum = jax.lax.psum(vsum, axis_name)
    var = vsum / jnp.maximum(wsum - 1.0, 1.0)
    return (advantages - mean) / (jnp.sqrt(var) + EPS_PPO)


def make_update_pol(
    policy: Move2HearPolicy,
    cfg: PPOConfig,
    num_envs: int,
    axis_name: Optional[str] = None,
    with_validity: bool = False,
    scan_unroll: int = 1,
    pose_bank: bool = False,
) -> Callable:
    """Build the jitted policy-update function.

    The returned fn takes (state, rollouts_pol, rng) where rollouts_pol is the
    device-resident rollout pytree (see rl/rollout.py) with `returns` already
    computed, and returns (state, (value_loss, action_loss, dist_entropy))
    averaged over all minibatches.

    With `with_validity=True` the fn takes an extra traced `t_valid` scalar:
    steps >= t_valid (uncollected under the DDPPO preemptive rollout sync,
    ppo_trainer.py:769-782) get zero weight in every loss/normalization term,
    so one compiled program serves any truncation length — equal to running
    the plain update on the physically truncated buffer.

    With `pose_bank=True` the rollout observations carry an integer "pose"
    index instead of rgb/depth frames (see make_collect's pose_obs), and the
    fn takes a `banks` kwarg with the device frame banks. Each epoch runs the
    visual conv stack ONCE over the S*V*4 distinct poses and gathers a
    (T, N, H) feature row per step — the reference recomputes the conv stack
    over all T*N stored frames every epoch (policy.py:47-118 via
    evaluate_actions). Same math: the per-pose forward is identical, and the
    pose-gather scatter-adds the per-step cotangents before one conv
    backward instead of summing per-step conv backwards.
    """
    tx_pol, _ = make_optimizers(cfg)

    def minibatch_loss(pol_params, frozen, batch_stats, mb, clip_param, banks):
        params = {**frozen, **pol_params}
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        obs = mb["obs"]
        if pose_bank:
            flat = lambda b: (
                None if b is None else b.reshape((-1,) + b.shape[3:])
            )
            vis = policy.apply(
                variables, flat(banks.get("rgb")), flat(banks.get("depth")),
                method=Move2HearPolicy.visual_features,
            )
            obs = {k: v for k, v in obs.items() if k != "pose"}
            obs["visual_feats"] = vis[mb["obs"]["pose"]]
        values, log_probs, entropy, _ = policy.apply(
            variables,
            obs,
            mb["hidden0"],
            mb["masks"],
            mb["actions"],
            mb["pred_binSepMasks"],
            mb["pred_mono"],
            mb["pred_monoFromMem"],
            method=Move2HearPolicy.evaluate_actions,
            per_step_entropy=with_validity,
        )
        ratio = jnp.exp(log_probs - mb["old_log_probs"])
        surr1 = ratio * mb["adv"]
        surr2 = (
            jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param) * mb["adv"]
        )

        if cfg.use_clipped_value_loss:
            clipped = mb["value_preds"] + jnp.clip(
                values - mb["value_preds"], -clip_param, clip_param
            )
            vl = jnp.square(values - mb["returns"])
            vl_c = jnp.square(clipped - mb["returns"])
            value_sq = jnp.maximum(vl, vl_c)
        else:
            value_sq = jnp.square(mb["returns"] - values)

        if with_validity:
            w = jnp.broadcast_to(mb["w"], surr1.shape)
            wsum = jnp.maximum(w.sum(), 1.0)
            action_loss = -(jnp.minimum(surr1, surr2) * w).sum() / wsum
            value_loss = 0.5 * (value_sq * w).sum() / wsum
            entropy = (entropy * w[..., 0]).sum() / wsum
        else:
            action_loss = -jnp.minimum(surr1, surr2).mean()
            value_loss = 0.5 * value_sq.mean()

        total = (
            value_loss * cfg.value_loss_coef
            + action_loss
            - entropy * cfg.entropy_coef
        )
        return total, (value_loss, action_loss, entropy)

    def update(
        state: AgentState, rollouts, rng, lr_scale=1.0, clip_scale=1.0,
        t_valid=None, banks=None,
    ):
        clip_param = cfg.clip_param * clip_scale
        lr = cfg.lr_pol * lr_scale
        adv_all = rollouts["returns"][:-1] - rollouts["value_preds"][:-1]
        if with_validity:
            assert t_valid is not None
            w_steps = (
                jnp.arange(adv_all.shape[0])[:, None, None] < t_valid
            ).astype(adv_all.dtype)  # (T, 1, 1)
            adv_all = _weighted_normalized_advantages(
                adv_all, w_steps, cfg.use_normalized_advantage, axis_name
            )
        else:
            adv_all = _normalized_advantages(
                adv_all, cfg.use_normalized_advantage, axis_name
            )

        pol_params, frozen = _split(state.params, POL_KEYS)
        # num_mini_batch == 1 (the published config): each "minibatch" is ALL
        # envs permuted — and batch-mean gradients are permutation-invariant,
        # so the full-batch path skips the permuted gather of the entire
        # rollout per epoch (the reference pays that shuffle + index_select
        # every epoch, rollout_storage.py:195-227). Same math, different
        # float summation order only.
        full_batch = cfg.num_mini_batch == 1
        perms = (
            jnp.arange(cfg.ppo_epoch)
            if full_batch
            else _epoch_perms(rng, cfg.ppo_epoch, num_envs, cfg.num_mini_batch)
        )

        def scan_body(carry, idx):
            pol_params, opt_state = carry
            if full_batch:
                mb = {
                    "obs": {
                        k: v[:-1] for k, v in rollouts["observations"].items()
                    },
                    "hidden0": rollouts["hidden"][0],
                    "masks": rollouts["masks"][:-1],
                    "actions": rollouts["actions"],
                    "pred_binSepMasks": rollouts["pred_binSepMasks"],
                    "pred_mono": rollouts["pred_mono"],
                    "pred_monoFromMem": rollouts["prev_pred_monoFromMem"][1:],
                    "value_preds": rollouts["value_preds"][:-1],
                    "returns": rollouts["returns"][:-1],
                    "adv": adv_all,
                    "old_log_probs": rollouts["action_log_probs"],
                }
            else:
                mb = {
                    "obs": {
                        k: v[:-1, idx]
                        for k, v in rollouts["observations"].items()
                    },
                    "hidden0": rollouts["hidden"][0, idx],
                    "masks": rollouts["masks"][:-1, idx],
                    "actions": rollouts["actions"][:, idx],
                    "pred_binSepMasks": rollouts["pred_binSepMasks"][:, idx],
                    "pred_mono": rollouts["pred_mono"][:, idx],
                    "pred_monoFromMem": rollouts["prev_pred_monoFromMem"][1:, idx],
                    "value_preds": rollouts["value_preds"][:-1, idx],
                    "returns": rollouts["returns"][:-1, idx],
                    "adv": adv_all[:, idx],
                    "old_log_probs": rollouts["action_log_probs"][:, idx],
                }
            if with_validity:
                mb["w"] = w_steps
            grads, aux = jax.grad(minibatch_loss, has_aux=True)(
                pol_params, frozen, state.batch_stats, mb, clip_param, banks
            )
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, opt_state = tx_pol.update(grads, opt_state, pol_params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            pol_params = optax.apply_updates(pol_params, updates)
            return (pol_params, opt_state), jnp.stack(aux)

        (pol_params, opt_state), aux = jax.lax.scan(
            scan_body, (pol_params, state.opt_state_pol), perms,
            unroll=scan_unroll,
        )
        value_loss, action_loss, entropy = aux.mean(axis=0)
        new_params = {**frozen, **pol_params}
        return (
            state.replace(params=new_params, opt_state_pol=opt_state),
            (value_loss, action_loss, entropy),
        )

    return update


def make_update_sep(
    policy: Move2HearPolicy,
    cfg: PPOConfig,
    num_envs: int,
    gt_mono_mag_norm: float = 0.0,
    axis_name: Optional[str] = None,
    with_validity: bool = False,
) -> Callable:
    """Build the jitted separator-refit function (``ppo.py:179-246``): passive
    separators run frozen; backward touches only the acoustic memory via the
    L1 monoFromMem loss. Bin/mono L1 losses are returned for logging.

    Spectrograms are re-rendered on device from the stored (sound id, RIR)
    keys (see rl/rollout.py RolloutSep) — identical values to the rollout-time
    render, for a fraction of the HBM.

    With `with_validity=True` the fn takes an extra `row_weights` ((T_total,)
    float) marking which buffer rows hold steps collected this cycle — rows
    left stale by preemptive-sync truncation (ppo_trainer.py:769-782) get
    zero weight in the loss and the logging means."""
    from move2hear_tpu.ops.frontend import render_binaural_mixture

    _, tx_sep = make_optimizers(cfg)
    sg = jax.lax.stop_gradient

    def _wmean(x, w_flat):
        """Weighted mean over samples of per-sample means (equal sample sizes
        make this equal to the plain mean over valid elements)."""
        per = jnp.abs(x).mean(axis=tuple(range(1, x.ndim)))
        return (per * w_flat).sum() / jnp.maximum(w_flat.sum(), 1.0)

    def minibatch_loss(sep_params, frozen, batch_stats, bank, mb):
        params = {**frozen, **sep_params}
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        t, n = mb["masks"].shape[0], mb["masks"].shape[1]

        def flat(v):
            return v.reshape((t * n,) + v.shape[2:])

        rendered = render_binaural_mixture(
            bank[flat(mb["sound_ids"])], flat(mb["rirs"]),
            gt_mono_mag_norm=gt_mono_mag_norm,
            # only magnitudes feed the refit losses; zero phases let XLA
            # DCE the angle computation (see ops/frontend._bin_and_mix)
            mags_only=True,
        )
        mix = sg(rendered.mixed_bin_audio_mag)
        obs_flat = {
            "mixed_bin_audio_mag": mix,
            "target_class": flat(mb["target_class"]),
        }

        pred_binSepMasks = sg(
            policy.apply(
                variables, obs_flat, method=Move2HearPolicy.get_binSepMasks
            )
        )
        pred_mono = sg(
            policy.apply(
                variables,
                pred_binSepMasks,
                mix,
                method=Move2HearPolicy.convert_bin2mono,
            )
        )

        prev_mem = flat(mb["prev_pred_monoFromMem"])
        masks = flat(mb["masks"]).reshape(t * n, 1, 1, 1)
        prev_mem_masked = prev_mem * masks
        pred_monoFromMem = policy.apply(
            variables,
            pred_mono,
            prev_mem_masked,
            method=Move2HearPolicy.get_monoFromMem,
        )

        gt_mono_mag = sg(rendered.gt_mono_comps[..., 0::2][..., :1])
        if with_validity:
            t_rows, n_cols = mb["masks"].shape[0], mb["masks"].shape[1]
            w_flat = jnp.broadcast_to(
                mb["row_w"][:, None], (t_rows, n_cols)
            ).reshape(t_rows * n_cols)
            monoFromMem_loss = _wmean(pred_monoFromMem - gt_mono_mag, w_flat)
            mono_loss = _wmean(pred_mono - gt_mono_mag, w_flat)
            gt_bin_mag = sg(rendered.gt_bin_comps[..., 0::2][..., :2])
            pred_bin = jnp.expm1(mix) * pred_binSepMasks
            bin_loss = _wmean(pred_bin - gt_bin_mag, w_flat)
        else:
            monoFromMem_loss = jnp.abs(pred_monoFromMem - gt_mono_mag).mean()
            mono_loss = jnp.abs(pred_mono - gt_mono_mag).mean()
            gt_bin_mag = sg(rendered.gt_bin_comps[..., 0::2][..., :2])
            pred_bin = jnp.expm1(mix) * pred_binSepMasks
            bin_loss = jnp.abs(pred_bin - gt_bin_mag).mean()

        return monoFromMem_loss, (bin_loss, mono_loss, monoFromMem_loss)

    def update(
        state: AgentState, rollouts, bank, rng, lr_scale=1.0, row_weights=None,
    ):
        lr = cfg.lr_sep * lr_scale
        sep_params, frozen = _split(state.params, SEP_TRAIN_KEYS)
        # full-batch fast path when num_mini_batch == 1 (see make_update_pol)
        full_batch = cfg.num_mini_batch == 1
        perms = (
            jnp.arange(cfg.ppo_epoch)
            if full_batch
            else _epoch_perms(rng, cfg.ppo_epoch, num_envs, cfg.num_mini_batch)
        )

        def scan_body(carry, idx):
            sep_params, opt_state = carry
            if full_batch:
                mb = {
                    k: rollouts[k][:-1]
                    for k in (
                        "sound_ids", "rirs", "target_class",
                        "prev_pred_monoFromMem", "masks",
                    )
                }
            else:
                mb = {
                    k: rollouts[k][:-1, idx]
                    for k in (
                        "sound_ids", "rirs", "target_class",
                        "prev_pred_monoFromMem", "masks",
                    )
                }
            if with_validity:
                assert row_weights is not None
                mb["row_w"] = row_weights
            grads, aux = jax.grad(minibatch_loss, has_aux=True)(
                sep_params, frozen, state.batch_stats, bank, mb
            )
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, opt_state = tx_sep.update(grads, opt_state, sep_params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            sep_params = optax.apply_updates(sep_params, updates)
            return (sep_params, opt_state), jnp.stack(aux)

        (sep_params, opt_state), aux = jax.lax.scan(
            scan_body, (sep_params, state.opt_state_sep), perms
        )
        bin_loss, mono_loss, monoFromMem_loss = aux.mean(axis=0)
        new_params = {**frozen, **sep_params}
        return (
            state.replace(params=new_params, opt_state_sep=opt_state),
            (bin_loss, mono_loss, monoFromMem_loss),
        )

    return update


# Convenience jitted builders -------------------------------------------------

def ppo_update_pol(policy, cfg, num_envs, axis_name=None):
    return jax.jit(make_update_pol(policy, cfg, num_envs, axis_name))


def ppo_update_sep(policy, cfg, num_envs, axis_name=None):
    return jax.jit(make_update_sep(policy, cfg, num_envs, axis_name))
