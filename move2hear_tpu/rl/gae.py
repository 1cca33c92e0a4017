"""Return / advantage computation (``common/rollout_storage.py:159-180``).

GAE(gamma, tau) or plain discounted returns, as a reverse ``lax.scan`` over
the rollout time axis — the TPU-idiomatic form of the reference's reversed
python loop.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("use_gae",))
def compute_returns(
    rewards: jnp.ndarray,      # (T, N, 1)
    value_preds: jnp.ndarray,  # (T+1, N, 1) with next_value already in slot T
    masks: jnp.ndarray,        # (T+1, N, 1) not-done masks
    gamma: float,
    tau: float,
    use_gae: bool = True,
    t_valid=None,
) -> jnp.ndarray:
    """Returns (T+1, N, 1); slot T holds next_value (GAE) / next_value
    (discounted) to mirror the reference's buffer layout.

    `t_valid` (optional traced scalar): number of collected steps when the
    rollout was truncated by the DDPPO preemptive sync (ppo_trainer.py:
    769-782). Steps >= t_valid are treated as absent — the bootstrap value
    must then sit in `value_preds[t_valid]` (not slot T), and for valid
    steps the result equals compute_returns on the physically truncated
    buffer; invalid slots hold don't-care values that the validity-weighted
    update ignores."""
    t = rewards.shape[0]
    valid = None
    if t_valid is not None:
        valid = (
            jnp.arange(t)[:, None, None] < t_valid
        ).astype(rewards.dtype)

    if use_gae:
        def step(gae, inp):
            r, v, v_next, m_next = inp
            delta = r + gamma * v_next * m_next - v
            gae = delta + gamma * tau * m_next * gae
            return gae, gae + v

        def step_masked(gae, inp):
            r, v, v_next, m_next, val = inp
            delta = r + gamma * v_next * m_next - v
            # invalid steps zero the carry so A_{t_valid} = 0 at the boundary
            gae = val * (delta + gamma * tau * m_next * gae)
            return gae, gae + v

        xs = (
            rewards[::-1],
            value_preds[:-1][::-1],
            value_preds[1:][::-1],
            masks[1:][::-1],
        )
        if valid is None:
            _, returns_rev = jax.lax.scan(
                step, jnp.zeros_like(rewards[0]), xs
            )
        else:
            _, returns_rev = jax.lax.scan(
                step_masked, jnp.zeros_like(rewards[0]), xs + (valid[::-1],)
            )
        returns = returns_rev[::-1]
        return jnp.concatenate([returns, value_preds[-1:]], axis=0)

    def step(ret_next, inp):
        r, m_next = inp
        ret = ret_next * gamma * m_next + r
        return ret, ret

    def step_masked(ret_next, inp):
        r, m_next, v, val = inp
        # invalid steps reset the carry to V_t, so the first valid step from
        # the back sees ret_next == value_preds[t_valid] (the bootstrap)
        ret = jnp.where(val > 0, ret_next * gamma * m_next + r, v)
        return ret, ret

    if valid is None:
        _, returns_rev = jax.lax.scan(
            step, value_preds[-1], (rewards[::-1], masks[1:][::-1])
        )
    else:
        _, returns_rev = jax.lax.scan(
            step_masked,
            value_preds[-1],
            (
                rewards[::-1], masks[1:][::-1], value_preds[:-1][::-1],
                valid[::-1],
            ),
        )
    returns = returns_rev[::-1]
    return jnp.concatenate([returns, value_preds[-1:]], axis=0)
