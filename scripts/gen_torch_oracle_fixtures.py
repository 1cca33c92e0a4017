#!/usr/bin/env python3
"""Generate torch-oracle parity fixtures from the REFERENCE repo's own model
code.

Loads the reference's model files (separator_cnn / memory_nets / audio_cnn /
visual_cnn / rnn_state_encoder) directly via importlib — without importing
the `audio_separation` package (whose __init__ pulls habitat) — loads every
model family with deterministic synthetic weights (see
tests/fixtures/torch_oracle_synth.py: storing the real state_dicts would be
~150 MB of noise; both sides regenerate them from the shape manifest), runs
one forward in eval mode on seeded inputs, and saves
{shape manifest, inputs, outputs} into ``tests/fixtures/torch_oracle.npz``.

tests/test_torch_oracle.py then maps the saved torch weights onto our flax
modules (move2hear_tpu/utils/torch_import.py) and asserts output parity —
the strongest possible parity evidence: the oracle is the reference's own
forward pass, not a re-implementation.

Run where both torch and /root/reference are available:
    python scripts/gen_torch_oracle_fixtures.py [reference_dir]
"""

import importlib.util
import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(_ROOT, "tests", "fixtures", "torch_oracle.npz")
sys.path.insert(0, os.path.join(_ROOT, "tests", "fixtures"))
from torch_oracle_synth import synth_state_dict  # noqa: E402


def _shim_modules():
    """audio_cnn/visual_cnn do `from audio_separation.common.utils import
    Flatten`; register a stub package so the real package __init__ (which
    imports habitat) never runs."""
    pkg = types.ModuleType("audio_separation")
    pkg.__path__ = []
    common = types.ModuleType("audio_separation.common")
    utils = types.ModuleType("audio_separation.common.utils")

    class Flatten(nn.Module):
        # the reference's Flatten uses .view (common/utils.py:11-13);
        # .reshape is numerically identical and tolerant of the
        # non-contiguous layouts this standalone harness produces
        def forward(self, x):
            return x.reshape(x.size(0), -1)

    utils.Flatten = Flatten
    sys.modules["audio_separation"] = pkg
    sys.modules["audio_separation.common"] = common
    sys.modules["audio_separation.common.utils"] = utils


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Space:
    def __init__(self, shape):
        self.shape = shape


class _ObsSpace:
    def __init__(self, spaces):
        self.spaces = spaces


def main():
    _shim_modules()
    sep = _load("ref_separator_cnn", "audio_separation/rl/models/separator_cnn.py")
    mem = _load("ref_memory_nets", "audio_separation/rl/models/memory_nets.py")
    aud = _load("ref_audio_cnn", "audio_separation/rl/models/audio_cnn.py")
    vis = _load("ref_visual_cnn", "audio_separation/rl/models/visual_cnn.py")
    rnn = _load("ref_rnn", "audio_separation/rl/models/rnn_state_encoder.py")

    torch.manual_seed(1234)
    rng = np.random.default_rng(1234)
    B = 2
    out = {}

    def load_synth(modname, module, seed):
        """Replace the module's weights with the deterministic synthetic set
        and record the shape manifest."""
        shapes = {k: tuple(v.shape) for k, v in module.state_dict().items()}
        sd = synth_state_dict(shapes, seed)
        module.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
        for k, shp in shapes.items():
            out[f"shape/{modname}/{k}"] = np.asarray(shp, np.int64)
        out[f"seed/{modname}"] = np.asarray(seed, np.int64)

    def save(modname, module, inputs, outputs):
        for k, v in inputs.items():
            out[f"in/{modname}/{k}"] = v
        for i, o in enumerate(outputs):
            out[f"out/{modname}/{i}"] = o.detach().numpy()

    t = lambda a: torch.as_tensor(np.ascontiguousarray(a), dtype=torch.float32)
    obs_space = _ObsSpace({
        "mixed_bin_audio_mag": _Space((512, 32, 2)),
        "rgb": _Space((128, 128, 3)),
        "depth": _Space((128, 128, 1)),
    })

    mix = rng.uniform(0, 2, (B, 512, 32, 2)).astype(np.float32)
    tc = rng.integers(0, 12, (B, 1)).astype(np.float32)
    masks2 = rng.uniform(-0.5, 1.0, (B, 512, 32, 2)).astype(np.float32)
    mono1 = rng.uniform(0, 1, (B, 512, 32, 1)).astype(np.float32)
    prev1 = rng.uniform(0, 1, (B, 512, 32, 1)).astype(np.float32)

    with torch.no_grad():
        # --- U-Net encoders + decoders (both variants, chained) ----------
        enc_bin = sep.PassiveSepEncCNN(convert_bin2mono=False).eval()
        load_synth("enc_bin", enc_bin, 101)
        bott, skips = enc_bin({"mixed_bin_audio_mag": t(mix), "target_class": t(tc)})
        save("enc_bin", enc_bin, {"mix": mix, "tc": tc}, [bott] + skips)

        dec_bin = sep.PassiveSepDecCNN(convert_bin2mono=False).eval()
        load_synth("dec_bin", dec_bin, 102)
        dec_out = dec_bin(bott, skips)
        save("dec_bin", dec_bin, {}, [dec_out])

        enc_mono = sep.PassiveSepEncCNN(convert_bin2mono=True).eval()
        load_synth("enc_mono", enc_mono, 103)
        bott_m, skips_m = enc_mono(t(masks2), mixed_audio=t(mix))
        save("enc_mono", enc_mono, {"masks": masks2, "mix": mix}, [bott_m] + skips_m)

        dec_mono = sep.PassiveSepDecCNN(convert_bin2mono=True).eval()
        load_synth("dec_mono", dec_mono, 104)
        dec_out_m = dec_mono(bott_m, skips_m)
        save("dec_mono", dec_mono, {}, [dec_out_m])

        # --- acoustic memory, both BN variants ---------------------------
        mem_ddppo = mem.AcousticMem(use_ddppo=True).eval()
        load_synth("mem_ddppo", mem_ddppo, 105)
        save(
            "mem_ddppo", mem_ddppo, {"mono": mono1, "prev": prev1},
            [mem_ddppo(t(mono1), t(prev1))],
        )
        mem_bn = mem.AcousticMem(use_ddppo=False).eval()
        load_synth("mem_bn", mem_bn, 106)
        save(
            "mem_bn", mem_bn, {"mono": mono1, "prev": prev1},
            [mem_bn(t(mono1), t(prev1))],
        )

        # --- policy encoders ---------------------------------------------
        audio_bin = aud.AudioCNN(obs_space, 512).eval()
        load_synth("audio_bin", audio_bin, 107)
        save(
            "audio_bin", audio_bin, {"mix": mix, "masks": masks2},
            [audio_bin({"mixed_bin_audio_mag": t(mix)}, pred_binSepMasks=t(masks2))],
        )
        audio_mem = aud.AudioCNN(obs_space, 512, encode_monoNmonoFromMem=True).eval()
        load_synth("audio_mem", audio_mem, 108)
        cat2 = np.concatenate([mono1, prev1], axis=3)
        save(
            "audio_mem", audio_mem, {"cat": cat2},
            [audio_mem({}, pred_monoNmonoFromMem=t(cat2))],
        )

        rgb = rng.uniform(0, 255, (B, 128, 128, 3)).astype(np.float32)
        depth = rng.uniform(0, 1, (B, 128, 128, 1)).astype(np.float32)
        visual = vis.VisualCNN(obs_space, 512, extra_rgb=False, extra_depth=False).eval()
        load_synth("visual", visual, 109)
        save(
            "visual", visual, {"rgb": rgb, "depth": depth},
            [visual({"rgb": t(rgb), "depth": t(depth)})],
        )

        # --- GRU state encoder: single step + masked sequence ------------
        gru = rnn.RNNStateEncoder(1536, 512).eval()
        load_synth("gru", gru, 110)
        x1 = rng.standard_normal((B, 1536)).astype(np.float32)
        h0 = rng.standard_normal((1, B, 512)).astype(np.float32)
        m1 = np.ones((B, 1), np.float32)
        y1, h1 = gru.single_forward(t(x1), t(h0), t(m1))
        T = 4
        xs = rng.standard_normal((T * B, 1536)).astype(np.float32)
        ms = rng.integers(0, 2, (T * B, 1)).astype(np.float32)
        ms[:B] = 1.0
        ys, hs = gru.seq_forward(t(xs), t(h0), t(ms))
        save(
            "gru", gru,
            {"x1": x1, "h0": h0, "m1": m1, "xs": xs, "ms": ms},
            [y1, h1, ys, hs],
        )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays")


if __name__ == "__main__":
    main()
