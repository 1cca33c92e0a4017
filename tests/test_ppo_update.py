"""End-to-end PPO update mechanics on tiny rollouts: gradient isolation
(three islands), frozen passive separators, loss finiteness, and the
pretrained-separator weight copy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from move2hear_tpu.models import Move2HearPolicy, Move2HearPassiveWoMemoryPolicy
from move2hear_tpu.rl import (
    PPOConfig,
    compute_returns,
    create_agent_state,
    load_pretrained_passive_separators,
)
from move2hear_tpu.rl.ppo import make_update_pol, make_update_sep, POL_KEYS, PASSIVE_KEYS
from move2hear_tpu.rl.rollout import (
    create_rollout_pol,
    create_rollout_sep,
    insert_pol,
    insert_sep,
    after_update_pol,
)

F, TT = 512, 32
T, N = 2, 2

OBS_SHAPES = {
    "rgb": (128, 128, 3),
    "depth": (128, 128, 1),
    "mixed_bin_audio_mag": (F, TT, 2),
    "target_class": (1,),
    "gt_mono_comps": (F, TT, 4),
    "gt_bin_comps": (F, TT, 8),
}


@pytest.fixture(scope="module")
def setup():
    policy = Move2HearPolicy(num_actions=4, hidden_size=64, use_ddppo=True)
    rng = np.random.default_rng(0)
    obs = {
        k: jnp.asarray(rng.uniform(0, 1, (N,) + s), jnp.float32)
        if k != "target_class"
        else jnp.zeros((N, 1), jnp.int32)
        for k, s in OBS_SHAPES.items()
    }
    variables = policy.init(
        jax.random.PRNGKey(0), obs, jnp.zeros((N, 64)), jnp.ones((N, 1))
    )
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=1, lr_pol=1e-3, lr_sep=1e-3)
    state = create_agent_state(cfg, variables)
    return policy, cfg, state, obs, rng


def _filled_rollouts(rng, hidden_size=64):
    roll = create_rollout_pol(T, N, OBS_SHAPES, hidden_size=hidden_size)
    for step in range(T):
        obs = {
            k: jnp.asarray(rng.uniform(0, 1, (N,) + s), jnp.float32)
            if k != "target_class"
            else jnp.zeros((N, 1), jnp.int32)
            for k, s in OBS_SHAPES.items()
        }
        roll = insert_pol(
            roll,
            jnp.asarray(step),
            obs,
            jnp.asarray(rng.standard_normal((N, hidden_size)), jnp.float32),
            jnp.ones((N, 1), jnp.int32),
            jnp.full((N, 1), -1.2),
            jnp.asarray(rng.standard_normal((N, 1)), jnp.float32),
            jnp.asarray(rng.standard_normal((N, 1)), jnp.float32),
            jnp.ones((N, 1)),
            jnp.asarray(rng.uniform(0, 1, (N, F, TT, 2)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (N, F, TT, 1)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (N, F, TT, 1)), jnp.float32),
        )
    returns = compute_returns(
        roll.rewards, roll.value_preds, roll.masks, 0.99, 0.95, True
    )
    return roll.replace(returns=returns)


def test_update_pol_only_touches_policy_island(setup):
    policy, cfg, state, _, rng = setup
    roll = _filled_rollouts(rng)
    update = jax.jit(make_update_pol(policy, cfg, N))
    new_state, (value_loss, action_loss, entropy) = update(
        state, roll.as_dict(), jax.random.PRNGKey(1)
    )
    for x in (value_loss, action_loss, entropy):
        assert np.isfinite(float(x))
    # entropy of a fresh 4-action policy ~ log(4)
    assert 0.5 < float(entropy) <= np.log(4) + 1e-3

    for key in state.params:
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state.params[key]),
                jax.tree.leaves(new_state.params[key]),
            )
        )
        if key in POL_KEYS:
            assert changed, f"{key} should have been updated"
        else:
            assert not changed, f"{key} must stay frozen in update_pol"


def test_update_sep_only_touches_acoustic_mem(setup):
    policy, cfg, state, _, rng = setup
    rir_len = 400
    roll_sep = create_rollout_sep(T, N, num_sources=2, rir_length=rir_len)
    bank = jnp.asarray(rng.standard_normal((4, 16000)) * 5000, jnp.float32)
    for step in range(T):
        roll_sep = insert_sep(
            roll_sep,
            jnp.asarray(step),
            jnp.asarray(rng.integers(0, 4, (N, 2)), jnp.int32),
            jnp.asarray(rng.standard_normal((N, 2, rir_len, 2)) * 0.05, jnp.float32),
            jnp.zeros((N, 1), jnp.int32),
            jnp.ones((N, 1)),
            jnp.asarray(rng.uniform(0, 1, (N, F, TT, 1)), jnp.float32),
        )
    update = jax.jit(make_update_sep(policy, cfg, N, gt_mono_mag_norm=1.2))
    new_state, (bin_loss, mono_loss, mem_loss) = update(
        state, roll_sep.as_dict(), bank, jax.random.PRNGKey(2)
    )
    for x in (bin_loss, mono_loss, mem_loss):
        assert np.isfinite(float(x)) and float(x) >= 0

    for key in state.params:
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state.params[key]),
                jax.tree.leaves(new_state.params[key]),
            )
        )
        if key == "acoustic_mem":
            assert changed, "acoustic_mem should have been updated"
        else:
            assert not changed, f"{key} must stay frozen in update_sep"


def test_load_pretrained_passive_separators(setup):
    policy, cfg, state, obs, _ = setup
    passive = Move2HearPassiveWoMemoryPolicy()
    pv = passive.init(
        jax.random.PRNGKey(42),
        {k: obs[k] for k in ("mixed_bin_audio_mag", "target_class")},
    )
    new_params = load_pretrained_passive_separators(state.params, pv["params"])
    for key in PASSIVE_KEYS:
        for a, b in zip(
            jax.tree.leaves(new_params[key]), jax.tree.leaves(pv["params"][key])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # policy island untouched
    for key in POL_KEYS:
        for a, b in zip(
            jax.tree.leaves(new_params[key]), jax.tree.leaves(state.params[key])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rollout_after_update_rolls_last_to_first(setup):
    _, _, _, _, rng = setup
    roll = _filled_rollouts(rng)
    # snapshot before: after_update_pol donates (and thus invalidates) its input
    masks_last = np.asarray(roll.masks[-1])
    mix_last = np.asarray(roll.observations["mixed_bin_audio_mag"][-1])
    rolled = after_update_pol(roll)
    np.testing.assert_array_equal(np.asarray(rolled.masks[0]), masks_last)
    np.testing.assert_array_equal(
        np.asarray(rolled.observations["mixed_bin_audio_mag"][0]), mix_last
    )
