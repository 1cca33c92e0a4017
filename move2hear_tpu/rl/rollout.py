"""Device-resident rollout storage (``common/rollout_storage.py``).

The reference keeps (T+1, N, ...) circular torch buffers on GPU; here they are
immutable jnp pytrees updated functionally with ``dynamic_update_slice`` under
jit (buffer donation makes this in-place on TPU). Two storages:

  - RolloutPol: T = num_steps, holds everything the PPO update needs
    (observations, GRU hidden, separator predictions, rewards/values/returns/
    log-probs/actions/masks)  [rollout_storage.py:6-312]
  - RolloutSep: T = num_steps * num_updates_per_cycle, holds observations +
    prev_pred_monoFromMem + masks for the separator refit pass
    [rollout_storage.py:315-471]

`insert` takes the *current* step index (host-tracked python int, static per
trace? no — passed as a traced scalar so one compiled insert serves all steps).
`after_update` rolls slot T into slot 0 (rollout_storage.py:150-157).
"""

from functools import partial
from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp


class RolloutPol(flax.struct.PyTreeNode):
    observations: Dict[str, jnp.ndarray]   # each (T+1, N, ...)
    hidden: jnp.ndarray                    # (T+1, N, H)
    pred_binSepMasks: jnp.ndarray          # (T, N, F, Tt, 2)
    pred_mono: jnp.ndarray                 # (T, N, F, Tt, 1)
    prev_pred_monoFromMem: jnp.ndarray     # (T+1, N, F, Tt, 1)
    rewards: jnp.ndarray                   # (T, N, 1)
    value_preds: jnp.ndarray               # (T+1, N, 1)
    returns: jnp.ndarray                   # (T+1, N, 1)
    action_log_probs: jnp.ndarray          # (T, N, 1)
    actions: jnp.ndarray                   # (T, N, 1) int32
    masks: jnp.ndarray                     # (T+1, N, 1)

    def as_dict(self):
        return {
            "observations": self.observations,
            "hidden": self.hidden,
            "pred_binSepMasks": self.pred_binSepMasks,
            "pred_mono": self.pred_mono,
            "prev_pred_monoFromMem": self.prev_pred_monoFromMem,
            "rewards": self.rewards,
            "value_preds": self.value_preds,
            "returns": self.returns,
            "action_log_probs": self.action_log_probs,
            "actions": self.actions,
            "masks": self.masks,
        }


class RolloutSep(flax.struct.PyTreeNode):
    """Separator-refit buffer. Unlike the reference (which stores every
    rendered sensor for 120 steps — multiple GB of spectrograms), this stores
    the *render inputs* (sound ids + RIRs + target class) and the update
    re-renders spectrograms on device inside the loss: rematerialization
    trades a few cheap batched FFTs for an order of magnitude of HBM."""

    sound_ids: jnp.ndarray                 # (T+1, N, S) int32
    rirs: jnp.ndarray                      # (T+1, N, S, R, 2)
    target_class: jnp.ndarray              # (T+1, N, 1) int32
    prev_pred_monoFromMem: jnp.ndarray     # (T+1, N, F, Tt, 1)
    masks: jnp.ndarray                     # (T+1, N, 1)

    def as_dict(self):
        return {
            "sound_ids": self.sound_ids,
            "rirs": self.rirs,
            "target_class": self.target_class,
            "prev_pred_monoFromMem": self.prev_pred_monoFromMem,
            "masks": self.masks,
        }


def _obs_buffers(num_steps, num_envs, obs_shapes, dtype=jnp.float32):
    out = {}
    for sensor, shape in obs_shapes.items():
        if sensor == "target_class":
            dt = jnp.int32
        elif sensor == "rgb":
            dt = jnp.uint8
        else:
            dt = dtype
        out[sensor] = jnp.zeros((num_steps + 1, num_envs) + tuple(shape), dt)
    return out


def create_rollout_pol(
    num_steps: int,
    num_envs: int,
    obs_shapes: Dict[str, tuple],
    hidden_size: int = 512,
    spec_shape=(512, 32),
) -> RolloutPol:
    f, tt = spec_shape
    return RolloutPol(
        observations=_obs_buffers(num_steps, num_envs, obs_shapes),
        hidden=jnp.zeros((num_steps + 1, num_envs, hidden_size)),
        pred_binSepMasks=jnp.zeros((num_steps, num_envs, f, tt, 2)),
        pred_mono=jnp.zeros((num_steps, num_envs, f, tt, 1)),
        prev_pred_monoFromMem=jnp.zeros((num_steps + 1, num_envs, f, tt, 1)),
        rewards=jnp.zeros((num_steps, num_envs, 1)),
        value_preds=jnp.zeros((num_steps + 1, num_envs, 1)),
        returns=jnp.zeros((num_steps + 1, num_envs, 1)),
        action_log_probs=jnp.zeros((num_steps, num_envs, 1)),
        actions=jnp.zeros((num_steps, num_envs, 1), jnp.int32),
        masks=jnp.ones((num_steps + 1, num_envs, 1)),
    )


def create_rollout_sep(
    num_steps: int,
    num_envs: int,
    num_sources: int = 2,
    rir_length: int = 16000,
    spec_shape=(512, 32),
) -> RolloutSep:
    f, tt = spec_shape
    return RolloutSep(
        sound_ids=jnp.zeros((num_steps + 1, num_envs, num_sources), jnp.int32),
        rirs=jnp.zeros((num_steps + 1, num_envs, num_sources, rir_length, 2)),
        target_class=jnp.zeros((num_steps + 1, num_envs, 1), jnp.int32),
        prev_pred_monoFromMem=jnp.zeros((num_steps + 1, num_envs, f, tt, 1)),
        masks=jnp.ones((num_steps + 1, num_envs, 1)),
    )


def _set_at(buf, idx, value):
    return jax.lax.dynamic_update_index_in_dim(
        buf, value.astype(buf.dtype), idx, axis=0
    )


@partial(jax.jit, donate_argnums=(0,))
def insert_pol(
    rollouts: RolloutPol,
    step: jnp.ndarray,
    observations: Dict[str, jnp.ndarray],
    hidden: jnp.ndarray,
    actions: jnp.ndarray,
    action_log_probs: jnp.ndarray,
    values: jnp.ndarray,
    rewards: jnp.ndarray,
    masks: jnp.ndarray,
    pred_binSepMasks: jnp.ndarray,
    pred_mono: jnp.ndarray,
    pred_monoFromMem: jnp.ndarray,
) -> RolloutPol:
    """Mirror of RolloutStoragePol.insert (rollout_storage.py:102-148): the
    *next* observation/hidden/mask/memory go into slot step+1; this step's
    predictions/rewards/actions into slot step."""
    obs = {
        k: _set_at(rollouts.observations[k], step + 1, observations[k])
        for k in rollouts.observations
    }
    return rollouts.replace(
        observations=obs,
        hidden=_set_at(rollouts.hidden, step + 1, hidden),
        pred_binSepMasks=_set_at(rollouts.pred_binSepMasks, step, pred_binSepMasks),
        pred_mono=_set_at(rollouts.pred_mono, step, pred_mono),
        prev_pred_monoFromMem=_set_at(
            rollouts.prev_pred_monoFromMem, step + 1, pred_monoFromMem
        ),
        rewards=_set_at(rollouts.rewards, step, rewards),
        value_preds=_set_at(rollouts.value_preds, step, values),
        action_log_probs=_set_at(rollouts.action_log_probs, step, action_log_probs),
        actions=_set_at(rollouts.actions, step, actions),
        masks=_set_at(rollouts.masks, step + 1, masks),
    )


@partial(jax.jit, donate_argnums=(0,))
def insert_sep(
    rollouts: RolloutSep,
    step: jnp.ndarray,
    sound_ids: jnp.ndarray,
    rirs: jnp.ndarray,
    target_class: jnp.ndarray,
    masks: jnp.ndarray,
    pred_monoFromMem: jnp.ndarray,
) -> RolloutSep:
    return rollouts.replace(
        sound_ids=_set_at(rollouts.sound_ids, step + 1, sound_ids),
        rirs=_set_at(rollouts.rirs, step + 1, rirs),
        target_class=_set_at(rollouts.target_class, step + 1, target_class),
        prev_pred_monoFromMem=_set_at(
            rollouts.prev_pred_monoFromMem, step + 1, pred_monoFromMem
        ),
        masks=_set_at(rollouts.masks, step + 1, masks),
    )


def _get_at(buf, idx):
    if idx is None:
        return buf[-1]
    return jax.lax.dynamic_index_in_dim(buf, idx, axis=0, keepdims=False)


@partial(jax.jit, donate_argnums=(0,))
def after_update_pol(rollouts: RolloutPol, last=None) -> RolloutPol:
    """Roll slot `last` (default: T) -> slot 0 (rollout_storage.py:150-157).
    `last` < T when the rollout was truncated by the preemptive sync — the
    latest observation/hidden/memory then live in slot `last`, not T."""
    obs = {
        k: _set_at(v, 0, _get_at(v, last))
        for k, v in rollouts.observations.items()
    }
    return rollouts.replace(
        observations=obs,
        hidden=_set_at(rollouts.hidden, 0, _get_at(rollouts.hidden, last)),
        prev_pred_monoFromMem=_set_at(
            rollouts.prev_pred_monoFromMem, 0,
            _get_at(rollouts.prev_pred_monoFromMem, last),
        ),
        masks=_set_at(rollouts.masks, 0, _get_at(rollouts.masks, last)),
    )


@partial(jax.jit, donate_argnums=(0,))
def after_update_sep(rollouts: RolloutSep, last=None) -> RolloutSep:
    return rollouts.replace(
        sound_ids=_set_at(
            rollouts.sound_ids, 0, _get_at(rollouts.sound_ids, last)
        ),
        rirs=_set_at(rollouts.rirs, 0, _get_at(rollouts.rirs, last)),
        target_class=_set_at(
            rollouts.target_class, 0, _get_at(rollouts.target_class, last)
        ),
        prev_pred_monoFromMem=_set_at(
            rollouts.prev_pred_monoFromMem, 0,
            _get_at(rollouts.prev_pred_monoFromMem, last),
        ),
        masks=_set_at(rollouts.masks, 0, _get_at(rollouts.masks, last)),
    )
