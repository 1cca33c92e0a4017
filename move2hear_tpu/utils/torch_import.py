"""Import reference PyTorch checkpoints into move2hear_tpu parameter trees.

The reference (SAGNIKMJR/move2hear-active-AV-separation) saves torch
``state_dict``s:

  - RL agent ckpts ``ckpt.N.pth``: ``{"state_dict": agent.state_dict(),
    "config"}`` with keys ``actor_critic.<module>...``
    (rl/ppo/ppo_trainer.py:223-238)
  - passive pretrain ckpts ``best_ckpt_*.pth``: same layout over the
    4 separator modules wrapped in ``passive_sep_encoder``/``..._decoder``
    adapters (pretrain/passive/policy.py:7-44)
  - switch-policy ckpts: ``{"state_dict_nav", "config_nav",
    "state_dict_qualImprov", "config_qualImprov"}`` (notebook-merged)

This module maps those key trees onto our flax modules (models/policy.py),
handling the layout differences:

  - Conv2d OIHW -> flax HWIO
  - ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out) with the
    spatial taps flipped (torch's ConvT is the gradient of correlation;
    flax's default ``transpose_kernel=False`` is the transpose of
    correlation — verified numerically)
  - Linear (out, in) -> flax (in, out); when the input is a flattened conv
    map, the input dim is reordered from torch's (C, H, W) to NHWC's
    (H, W, C)
  - torch GRU (3H, D) packs -> our (D, 3H) (same r,z,n gate order)
  - BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var

Everything is pure numpy — torch is only needed by the CLI wrapper
(scripts/import_torch_ckpt.py) to unpickle the .pth file.
"""

from typing import Dict, Tuple

import numpy as np


def _np(x):
    return np.asarray(x, dtype=np.float32)


def _conv_w(w):
    """Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.ascontiguousarray(np.transpose(_np(w), (2, 3, 1, 0)))


def _convT_w(w):
    """ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out), spatially
    flipped (see module docstring)."""
    return np.ascontiguousarray(
        np.transpose(_np(w), (2, 3, 0, 1))[::-1, ::-1]
    )


def _linear_w(w, in_chw=None):
    """Linear (out, in) -> flax (in, out). `in_chw` = (C, H, W) of the
    pre-flatten feature map when the input came from torch's NCHW flatten."""
    w = _np(w)
    if in_chw is not None:
        c, h, wd = in_chw
        w = (
            w.reshape(w.shape[0], c, h, wd)
            .transpose(0, 2, 3, 1)
            .reshape(w.shape[0], -1)
        )
    return np.ascontiguousarray(w.T)


def _bn(sd, prefix):
    params = {"scale": _np(sd[prefix + "weight"]), "bias": _np(sd[prefix + "bias"])}
    stats = {
        "mean": _np(sd[prefix + "running_mean"]),
        "var": _np(sd[prefix + "running_var"]),
    }
    return params, stats


def convert_unet_encoder(sd, prefix) -> Tuple[Dict, Dict]:
    """PassiveSepEncCNN ``cnn.{i}.[0=conv,1=bn]`` -> UNetConvBlock_{i}
    (separator_cnn.py:46-52)."""
    params, stats = {}, {}
    for i in range(5):
        blk = f"UNetConvBlock_{i}"
        bn_p, bn_s = _bn(sd, f"{prefix}cnn.{i}.1.")
        params[blk] = {
            "Conv_0": {"kernel": _conv_w(sd[f"{prefix}cnn.{i}.0.weight"])},
            "BatchNorm_0": bn_p,
        }
        stats[blk] = {"BatchNorm_0": bn_s}
    return params, stats


def convert_unet_decoder(sd, prefix) -> Tuple[Dict, Dict]:
    """PassiveSepDecCNN ``cnn.{i}.[0=convT,1=bn]`` + final ``cnn.5.0`` 1x1
    conv -> UNetUpConvBlock_{i} + Conv_0 (separator_cnn.py:128-135)."""
    params, stats = {}, {}
    for i in range(5):
        blk = f"UNetUpConvBlock_{i}"
        bn_p, bn_s = _bn(sd, f"{prefix}cnn.{i}.1.")
        params[blk] = {
            "ConvTranspose_0": {
                "kernel": _convT_w(sd[f"{prefix}cnn.{i}.0.weight"])
            },
            "BatchNorm_0": bn_p,
        }
        stats[blk] = {"BatchNorm_0": bn_s}
    params["Conv_0"] = {
        "kernel": _conv_w(sd[f"{prefix}cnn.5.0.weight"]),
        "bias": _np(sd[f"{prefix}cnn.5.0.bias"]),
    }
    return params, stats


def convert_acoustic_mem(sd, prefix, use_ddppo) -> Tuple[Dict, Dict]:
    """AcousticMem: Conv/ReLU/Conv (ddppo) or Conv/BN/ReLU/Conv
    (memory_nets.py:11-24)."""
    if use_ddppo:
        params = {
            "Conv_0": {"kernel": _conv_w(sd[f"{prefix}cnn.0.weight"])},
            "Conv_1": {"kernel": _conv_w(sd[f"{prefix}cnn.2.weight"])},
        }
        return params, {}
    bn_p, bn_s = _bn(sd, f"{prefix}cnn.1.")
    params = {
        "Conv_0": {"kernel": _conv_w(sd[f"{prefix}cnn.0.weight"])},
        "BatchNorm_0": bn_p,
        "Conv_1": {"kernel": _conv_w(sd[f"{prefix}cnn.3.weight"])},
    }
    return params, {"BatchNorm_0": bn_s}


def convert_audio_cnn(sd, prefix) -> Dict:
    """AudioCNN ``cnn.[0,2,4]`` convs + ``cnn.7`` linear (audio_cnn.py:50-75).
    The conv output is spatially 1x1, so no flatten reorder is needed."""
    return {
        "Conv_0": {
            "kernel": _conv_w(sd[f"{prefix}cnn.0.weight"]),
            "bias": _np(sd[f"{prefix}cnn.0.bias"]),
        },
        "Conv_1": {
            "kernel": _conv_w(sd[f"{prefix}cnn.2.weight"]),
            "bias": _np(sd[f"{prefix}cnn.2.bias"]),
        },
        "Conv_2": {
            "kernel": _conv_w(sd[f"{prefix}cnn.4.weight"]),
            "bias": _np(sd[f"{prefix}cnn.4.bias"]),
        },
        "Dense_0": {
            "kernel": _linear_w(sd[f"{prefix}cnn.7.weight"], in_chw=(32, 1, 1)),
            "bias": _np(sd[f"{prefix}cnn.7.bias"]),
        },
    }


def convert_visual_cnn(sd, prefix) -> Dict:
    """VisualCNN ``cnn.[0,2,4]`` convs + ``cnn.6`` linear
    (visual_cnn.py:65-89); 128x128 input leaves a 12x12x32 map before the
    flatten, which torch orders (C, H, W)."""
    return {
        "Conv_0": {
            "kernel": _conv_w(sd[f"{prefix}cnn.0.weight"]),
            "bias": _np(sd[f"{prefix}cnn.0.bias"]),
        },
        "Conv_1": {
            "kernel": _conv_w(sd[f"{prefix}cnn.2.weight"]),
            "bias": _np(sd[f"{prefix}cnn.2.bias"]),
        },
        "Conv_2": {
            "kernel": _conv_w(sd[f"{prefix}cnn.4.weight"]),
            "bias": _np(sd[f"{prefix}cnn.4.bias"]),
        },
        "Dense_0": {
            "kernel": _linear_w(
                sd[f"{prefix}cnn.6.weight"], in_chw=(32, 12, 12)
            ),
            "bias": _np(sd[f"{prefix}cnn.6.bias"]),
        },
    }


def convert_gru(sd, prefix) -> Dict:
    """RNNStateEncoder ``rnn.*_l0`` -> our transposed packs
    (rnn_state_encoder.py:5-143; same r,z,n gate order)."""
    return {
        "weight_ih": np.ascontiguousarray(_np(sd[f"{prefix}rnn.weight_ih_l0"]).T),
        "weight_hh": np.ascontiguousarray(_np(sd[f"{prefix}rnn.weight_hh_l0"]).T),
        "bias_ih": _np(sd[f"{prefix}rnn.bias_ih_l0"]),
        "bias_hh": _np(sd[f"{prefix}rnn.bias_hh_l0"]),
    }


def convert_agent_state_dict(sd, use_ddppo=True) -> Tuple[Dict, Dict]:
    """Full RL ``agent.state_dict()`` (keys ``actor_critic.*``) ->
    (params, batch_stats) for Move2HearPolicy."""
    p = "actor_critic."
    params, stats = {}, {}

    params["pol_net"] = {
        "visual_encoder": convert_visual_cnn(sd, p + "pol_net.visual_encoder."),
        "bin_encoder": convert_audio_cnn(sd, p + "pol_net.bin_encoder."),
        "monoNmonoFromMem_encoder": convert_audio_cnn(
            sd, p + "pol_net.monoNmonoFromMem_encoder."
        ),
        "state_encoder": convert_gru(sd, p + "pol_net.state_encoder."),
    }
    params["action_dist"] = {
        "Dense_0": {
            "kernel": _linear_w(sd[p + "action_dist.linear.weight"]),
            "bias": _np(sd[p + "action_dist.linear.bias"]),
        }
    }
    params["critic"] = {
        "Dense_0": {
            "kernel": _linear_w(sd[p + "critic.fc.weight"]),
            "bias": _np(sd[p + "critic.fc.bias"]),
        }
    }
    for name, conv in (
        ("binSep_enc", convert_unet_encoder),
        ("bin2mono_enc", convert_unet_encoder),
        ("binSep_dec", convert_unet_decoder),
        ("bin2mono_dec", convert_unet_decoder),
    ):
        inner = "passive_sep_encoder." if name.endswith("enc") else "passive_sep_decoder."
        params[name], stats[name] = conv(sd, f"{p}{name}.{inner}")
    params["acoustic_mem"], mem_stats = convert_acoustic_mem(
        sd, p + "acoustic_mem.", use_ddppo
    )
    if mem_stats:
        stats["acoustic_mem"] = mem_stats
    return params, stats


def convert_passive_state_dict(sd) -> Tuple[Dict, Dict]:
    """Passive pretrain ``state_dict`` (the ``Passive`` wrapper,
    pretrain/passive/passive.py) -> (params, batch_stats) for
    Move2HearPassiveWoMemoryPolicy / the RL separator subtrees."""
    p = "actor_critic."
    params, stats = {}, {}
    for name, conv in (
        ("binSep_enc", convert_unet_encoder),
        ("bin2mono_enc", convert_unet_encoder),
        ("binSep_dec", convert_unet_decoder),
        ("bin2mono_dec", convert_unet_decoder),
    ):
        inner = "passive_sep_encoder." if name.endswith("enc") else "passive_sep_decoder."
        params[name], stats[name] = conv(sd, f"{p}{name}.{inner}")
    return params, stats
