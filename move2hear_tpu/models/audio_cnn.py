"""Audio spectrogram encoder CNN for the policy (``rl/models/audio_cnn.py``).

3 convs (8x8/s4, 4x4/s2, 2x2/s1, VALID padding, channels 32/64/32, ReLU after
each) + Linear -> output_size + ReLU, over 16-sliced spectrograms (32ch,
32x32 spatial -> 7 -> 2 -> 1).

Two input modes (audio_cnn.py:117-128):
  - bin mode: ``log1p(clamp(mask * expm1(mix), 0))``
  - monoNmonoFromMem mode: ``log1p(clamp(concat(pred_mono, pred_monoFromMem), 0))``
"""

import flax.linen as nn
import jax.numpy as jnp

from move2hear_tpu.ops.spec import slice16
from move2hear_tpu.models.unet import kaiming_relu


class AudioCNN(nn.Module):
    output_size: int = 512
    encode_mono_n_mono_from_mem: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        mixed_log_mag: jnp.ndarray | None = None,
        pred_bin_sep_masks: jnp.ndarray | None = None,
        pred_mono_n_mono_from_mem: jnp.ndarray | None = None,
    ):
        if self.encode_mono_n_mono_from_mem:
            assert pred_mono_n_mono_from_mem is not None
            x = jnp.log1p(jnp.clip(pred_mono_n_mono_from_mem, min=0))
            x = slice16(x)
        else:
            assert pred_bin_sep_masks is not None and mixed_log_mag is not None
            # fused mask+log1p+slice16 (Pallas when the runtime supports it)
            from move2hear_tpu.ops.pallas_kernels import masked_mix_slice16

            x = masked_mix_slice16(mixed_log_mag, pred_bin_sep_masks)

        for feats, k, s in ((32, 8, 4), (64, 4, 2), (32, 2, 1)):
            x = nn.Conv(
                feats, (k, k), strides=(s, s), padding="VALID",
                kernel_init=kaiming_relu, dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.output_size, kernel_init=kaiming_relu, dtype=self.dtype)(x)
        return nn.relu(x)
