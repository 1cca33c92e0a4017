"""RGB/depth encoder CNN for the policy (``rl/models/visual_cnn.py``).

3 convs (8x8/s4, 4x4/s2, 3x3/s1, VALID, channels 32/64/32; ReLU after the
first two only — the reference has no activation after conv3,
visual_cnn.py:65-89) + Linear -> output_size + ReLU. RGB is scaled by 1/255;
rgb/depth concatenated on channels. ``extra_rgb`` / ``extra_depth`` exclude a
modality from the encoding (the sensor is still fed to the agent elsewhere).
"""

import flax.linen as nn
import jax.numpy as jnp

from move2hear_tpu.models.unet import kaiming_relu


class VisualCNN(nn.Module):
    output_size: int = 512
    extra_rgb: bool = False
    extra_depth: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def is_blind(self):
        return self.extra_rgb and self.extra_depth

    @nn.compact
    def __call__(self, rgb: jnp.ndarray | None = None, depth: jnp.ndarray | None = None):
        inputs = []
        if rgb is not None and not self.extra_rgb:
            inputs.append(rgb.astype(self.dtype) / 255.0)
        if depth is not None and not self.extra_depth:
            inputs.append(depth.astype(self.dtype))
        assert inputs, "VisualCNN called blind"
        x = jnp.concatenate(inputs, axis=-1)

        x = nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID",
                    kernel_init=kaiming_relu, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID",
                    kernel_init=kaiming_relu, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), strides=(1, 1), padding="VALID",
                    kernel_init=kaiming_relu, dtype=self.dtype)(x)
        # NOTE: no ReLU here, matching visual_cnn.py:80-86
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.output_size, kernel_init=kaiming_relu, dtype=self.dtype)(x)
        return nn.relu(x)
