"""GRU state encoder with mask-aware sequence forward
(``rl/models/rnn_state_encoder.py``).

The reference segments a (T, N) sequence at episode boundaries and re-masks
the hidden state per segment. On TPU the idiomatic equivalent is a
``lax.scan`` that multiplies the carried hidden state by the per-step not-done
mask before every cell application — mathematically identical (within a
segment masks are all ones; at a boundary the hidden state is zeroed), with no
data-dependent control flow, so the whole rollout/update compiles to one fused
loop.

The cell math matches torch.nn.GRU (gate order r, z, n; two bias vectors):
    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h
Orthogonal weight init / zero bias as the reference (rnn_state_encoder.py:36-41).
Params are plain arrays so the scan body is a pure function (no linen scope
inside lax.scan).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRUStateEncoder(nn.Module):
    hidden_size: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hidden, masks):
        """x: (B, D) single step or (T, B, D) sequence.
        hidden: (B, H). masks: (B, 1) or (T, B, 1) not-done flags.
        Returns (outputs, final_hidden); for a single step outputs is (B, H),
        for a sequence (T, B, H).
        """
        h_dim = self.hidden_size
        in_dim = x.shape[-1]
        ortho = nn.initializers.orthogonal()
        w_ih = self.param("weight_ih", ortho, (in_dim, 3 * h_dim))
        w_hh = self.param("weight_hh", ortho, (h_dim, 3 * h_dim))
        b_ih = self.param("bias_ih", nn.initializers.zeros_init(), (3 * h_dim,))
        b_hh = self.param("bias_hh", nn.initializers.zeros_init(), (3 * h_dim,))
        dt = self.dtype

        def cell(h, xt):
            gi = jnp.dot(xt.astype(dt), w_ih.astype(dt)) + b_ih.astype(dt)
            gh = jnp.dot(h.astype(dt), w_hh.astype(dt)) + b_hh.astype(dt)
            i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = nn.sigmoid(i_r + h_r)
            z = nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            return (1.0 - z) * n + z * h

        if x.ndim == 2:
            new_h = cell(hidden * masks, x)
            return new_h, new_h

        # input-side projections are independent of the carried hidden state:
        # one (T*B, D) @ (D, 3H) matmul instead of T tiny (B, D) matmuls
        # inside the scan (B is the env count, far below the MXU tile) —
        # the scan body keeps only the hidden-side matmul + pointwise gates
        t, b = x.shape[0], x.shape[1]
        gi_all = (
            jnp.dot(x.reshape(t * b, -1).astype(dt), w_ih.astype(dt))
            + b_ih.astype(dt)
        ).reshape(t, b, 3 * h_dim)

        def step(h, inp):
            gi, mt = inp
            h = h * mt
            gh = jnp.dot(h.astype(dt), w_hh.astype(dt)) + b_hh.astype(dt)
            i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = nn.sigmoid(i_r + h_r)
            z = nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            new_h = (1.0 - z) * n + z * h
            return new_h, new_h

        final_h, outs = jax.lax.scan(step, hidden, (gi_all, masks))
        return outs, final_h
