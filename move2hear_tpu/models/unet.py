"""Passive-separator U-Nets, the core separation models.

Architectural parity with the reference's ``PassiveSepEncCNN`` /
``PassiveSepDecCNN`` (``audio_separation/rl/models/separator_cnn.py``):

  encoder: 5x [Conv 4x4 stride 2 pad 1 (no bias) -> BatchNorm -> LeakyReLU(0.2)]
           with channels in->64->128->256->512->512; input is the 512x32
           spectrogram freq-sliced into 16 chunks stacked on channels (32x32
           spatial), +1 target-class plane for the binaural-extraction variant.
  decoder: 5x [ConvT 4x4 stride 2 pad 1 (no bias) -> BatchNorm -> ReLU]
           with skip concatenation, then a final 1x1 Conv (with bias); output
           de-sliced back to 512x32. (unet_upconv's outermost ConvT->Sigmoid
           branch is dead code in the reference — never passed True,
           separator_cnn.py:127-135 — so it does not exist here.)

TPU-first details: NHWC layout throughout (XLA:TPU's native conv layout),
float32 params with an optional bfloat16 compute dtype for MXU-friendly
matmuls, all shapes static.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from move2hear_tpu.ops.spec import SLICE_FACTOR, deslice16, slice16

# The reference's layer_init (separator_cnn.py:56-68, 139-151) passes
# calculate_gain(...) as the *negative-slope* argument `a` of
# kaiming_normal_, so the effective init std is gain(a)/sqrt(fan) with
# gain(a) = sqrt(2 / (1 + a^2)) — NOT the textbook kaiming std. Reproduced
# exactly:
#   encoder convs:  a = calculate_gain("leaky_relu", 0.2) = sqrt(2/1.04)
#                   -> scale = 2 / (1 + 2/1.04)
#   decoder convs:  a = calculate_gain("relu") = sqrt(2) -> scale = 2/3
_ENC_SCALE = 2.0 / (1.0 + 2.0 / 1.04)
_DEC_SCALE = 2.0 / 3.0
kaiming_leaky = nn.initializers.variance_scaling(_ENC_SCALE, "fan_in", "normal")
kaiming_relu = nn.initializers.variance_scaling(_DEC_SCALE, "fan_in", "normal")
# torch's fan_in for ConvTranspose2d weights (in, out, kh, kw) is computed
# from dim 1 = out_channels * k^2 — flax's "fan_out" for (kh, kw, in, out).
kaiming_relu_convT = nn.initializers.variance_scaling(
    _DEC_SCALE, "fan_out", "normal"
)


class UNetConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (4, 4),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=kaiming_leaky,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32
        )(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class UNetUpConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d(k=4, s=2, p=1) == lax.conv_transpose with
        # per-side padding k-1-p = 2, doubling the spatial dims.
        x = nn.ConvTranspose(
            self.features,
            (4, 4),
            strides=(2, 2),
            padding=((2, 2), (2, 2)),
            use_bias=False,
            kernel_init=kaiming_relu_convT,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32
        )(x)
        return nn.relu(x)


class PassiveSepEncoder(nn.Module):
    """U-Net encoder. Two variants (separator_cnn.py:27-108):

    - binaural extraction (``convert_bin2mono=False``): input is the sliced
      mixture log-mag + a (target_class + 1) plane -> 33 channels.
    - bin2mono (``convert_bin2mono=True``): input is the sliced
      ``log1p(clamp(mask * expm1(mix), 0))`` -> 32 channels.

    Returns (bottleneck flattened (B, 512), skip features deepest-first).
    """

    convert_bin2mono: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        mixed_log_mag: jnp.ndarray,
        target_class: jnp.ndarray | None = None,
        pred_bin_sep_masks: jnp.ndarray | None = None,
        train: bool = False,
    ):
        if self.convert_bin2mono:
            assert pred_bin_sep_masks is not None
            # fused transcendentals + 16-way slice permutation: one Pallas
            # VMEM pass on runtimes whose Mosaic accepts it (eager auto-probe),
            # XLA-fused jnp otherwise
            from move2hear_tpu.ops.pallas_kernels import masked_mix_slice16

            x = masked_mix_slice16(mixed_log_mag, pred_bin_sep_masks)
        else:
            x = slice16(mixed_log_mag)
            assert target_class is not None
            # (B,) or (B, 1) integer class -> +1 plane (separator_cnn.py:92-96)
            tc = target_class.reshape(target_class.shape[0], 1, 1, 1).astype(x.dtype)
            plane = jnp.broadcast_to(tc + 1.0, x.shape[:3] + (1,))
            x = jnp.concatenate([x, plane], axis=-1)

        skips = []
        for feats in (64, 128, 256, 512, 512):
            x = UNetConvBlock(feats, dtype=self.dtype)(x, train=train)
            skips.append(x)
        bottleneck = x.reshape(x.shape[0], -1)
        # first N-1 features, deepest-first (separator_cnn.py:101-108)
        return bottleneck, skips[:-1][::-1]


class PassiveSepDecoder(nn.Module):
    """U-Net decoder with skip concat; every block is ConvT->BN->ReLU (the
    reference never passes outermost=True), then a 1x1 conv with bias and no
    activation — so the binaural "mask" and the mono magnitude are both
    unbounded (separator_cnn.py:111-170). Output layout (B, 512, 32, C)."""

    convert_bin2mono: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        bottleneck: jnp.ndarray,
        skips: Sequence[jnp.ndarray],
        train: bool = False,
    ):
        n_out = SLICE_FACTOR if self.convert_bin2mono else 2 * SLICE_FACTOR
        x = bottleneck.reshape(bottleneck.shape[0], 1, 1, -1)

        for idx, feats in enumerate((512, 256, 128, 64, n_out)):
            if idx > 0:
                x = jnp.concatenate([x, skips[idx - 1]], axis=-1)
            x = UNetUpConvBlock(feats, dtype=self.dtype)(x, train=train)
        # final 1x1 conv, with bias, no activation (separator_cnn.py:134)
        x = nn.Conv(
            n_out, (1, 1), use_bias=True, kernel_init=kaiming_relu, dtype=self.dtype
        )(x)
        return deslice16(x)
