"""Acoustic memory refiner (``rl/models/memory_nets.py:5-69``).

A tiny recurrent refiner: concat(sliced pred_mono, sliced masked previous
memory prediction) -> Conv3x3(32) -> [BatchNorm] -> ReLU -> Conv3x3(16),
de-sliced back to (B, 512, 32, 1). BatchNorm is dropped when ``use_ddppo``
(the reference removed BN to avoid BN-under-DDP issues, memory_nets.py:11-23).
"""

import flax.linen as nn
import jax.numpy as jnp

from move2hear_tpu.ops.spec import SLICE_FACTOR, deslice16, slice16
from move2hear_tpu.models.unet import kaiming_relu


class AcousticMem(nn.Module):
    use_ddppo: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pred_mono: jnp.ndarray,
        prev_pred_mono_from_mem_masked: jnp.ndarray = None,
        train: bool = False,
        sliced: bool = False,
    ):
        """sliced=True: inputs are already in 16-slice layout
        (B, F/16, T, 16) and the output stays sliced — lets the separator
        refit hoist the layout transform out of its 24-grad-step scan
        (slice16/deslice16 are pure permutations, so losses over all
        elements are unchanged). With sliced=True and prev None, pred_mono
        is the PRE-CONCATENATED (B, F/16, T, 32) input — the concat too is
        loop-invariant in the refit and hoisted out of the grad scan."""
        if sliced and prev_pred_mono_from_mem_masked is None:
            x = pred_mono
        elif sliced:
            x = jnp.concatenate(
                [pred_mono, prev_pred_mono_from_mem_masked], axis=-1
            )
        else:
            x = jnp.concatenate(
                [slice16(pred_mono), slice16(prev_pred_mono_from_mem_masked)],
                axis=-1,
            )
        x = nn.Conv(
            32, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=kaiming_relu, dtype=self.dtype,
        )(x)
        if not self.use_ddppo:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
            )(x)
        x = nn.relu(x)
        x = nn.Conv(
            SLICE_FACTOR, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=kaiming_relu, dtype=self.dtype,
        )(x)
        return x if sliced else deslice16(x)
