"""Categorical action distribution utilities
(``audio_separation/common/utils.py:16-50``): CategoricalNet is a single
linear layer (orthogonal init, gain 0.01) producing logits; the distribution
supports sample / log_probs / mode / probs / entropy."""

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Categorical(NamedTuple):
    logits: jnp.ndarray  # (B, A)

    @property
    def log_probs_all(self):
        return jax.nn.log_softmax(self.logits, axis=-1)

    def probs(self):
        return jax.nn.softmax(self.logits, axis=-1)

    def sample(self, rng):
        return jax.random.categorical(rng, self.logits, axis=-1)[..., None]  # (B, 1)

    def mode(self):
        return jnp.argmax(self.logits, axis=-1)[..., None]  # (B, 1)

    def log_probs(self, actions):
        """actions: (B, 1) int -> (B, 1) log-probabilities."""
        lp = self.log_probs_all
        return jnp.take_along_axis(lp, actions.astype(jnp.int32), axis=-1)

    def entropy(self):
        p = self.probs()
        lp = self.log_probs_all
        return -jnp.sum(p * lp, axis=-1)  # (B,)


class CategoricalNet(nn.Module):
    num_actions: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Categorical:
        logits = nn.Dense(
            self.num_actions,
            kernel_init=nn.initializers.orthogonal(scale=0.01),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
        )(x)
        return Categorical(logits=logits.astype(jnp.float32))


class CriticHead(nn.Module):
    """Linear value head, orthogonal init, zero bias (rl/ppo/policy.py:15-23)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            1,
            kernel_init=nn.initializers.orthogonal(),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
        )(x).astype(jnp.float32)
