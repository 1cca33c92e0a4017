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
) -> jnp.ndarray:
    """Returns (T+1, N, 1); slot T holds next_value (GAE) / next_value
    (discounted) to mirror the reference's buffer layout."""
    t = rewards.shape[0]

    if use_gae:
        def step(gae, inp):
            r, v, v_next, m_next = inp
            delta = r + gamma * v_next * m_next - v
            gae = delta + gamma * tau * m_next * gae
            return gae, gae + v

        _, returns_rev = jax.lax.scan(
            step,
            jnp.zeros_like(rewards[0]),
            (
                rewards[::-1],
                value_preds[:-1][::-1],
                value_preds[1:][::-1],
                masks[1:][::-1],
            ),
        )
        returns = returns_rev[::-1]
        return jnp.concatenate([returns, value_preds[-1:]], axis=0)

    def step(ret_next, inp):
        r, m_next = inp
        ret = ret_next * gamma * m_next + r
        return ret, ret

    _, returns_rev = jax.lax.scan(
        step, value_preds[-1], (rewards[::-1], masks[1:][::-1])
    )
    returns = returns_rev[::-1]
    return jnp.concatenate([returns, value_preds[-1:]], axis=0)
