"""The full Move2Hear policy (``audio_separation/rl/ppo/policy.py``), and the
passive pretrain variant (``audio_separation/pretrain/passive/policy.py``).

Submodule names mirror the reference's module paths (binSep_enc, binSep_dec,
bin2mono_enc, bin2mono_dec, acoustic_mem, pol_net, action_dist, critic) so
pretrained passive-separator weights can be copied subtree-by-subtree exactly
like ``PPO.load_pretrained_passive_separators`` (rl/ppo/ppo.py:59-70).

Gradient isolation (policy.py:212-214, ppo_trainer.py:305,318): all separator
outputs entering pol_net are wrapped in ``stop_gradient``; the bin2mono input
mask and the acoustic-memory inputs are likewise stopped — giving the three
gradient islands {pol_net, action_dist, critic}, {acoustic_mem}, {frozen
passive separators}.

Methods are exposed through ``nn.Module`` method dispatch:
``policy.apply(vars, ..., method=Move2HearPolicy.act)``.
"""

import logging
from typing import Any, Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from move2hear_tpu.models.audio_cnn import AudioCNN
from move2hear_tpu.models.distributions import Categorical, CategoricalNet, CriticHead
from move2hear_tpu.models.memory import AcousticMem
from move2hear_tpu.models.rnn import GRUStateEncoder
from move2hear_tpu.models.unet import PassiveSepDecoder, PassiveSepEncoder
from move2hear_tpu.models.visual_cnn import VisualCNN

Observations = Dict[str, jnp.ndarray]
sg = jax.lax.stop_gradient


class ActOutput(NamedTuple):
    value: jnp.ndarray
    action: jnp.ndarray
    action_log_probs: jnp.ndarray
    hidden: jnp.ndarray
    probs: jnp.ndarray


class PolicyNet(nn.Module):
    """Visual + bin-audio + mono-audio encoders -> concat (3*hidden) -> GRU
    (rl/ppo/policy.py:47-118)."""

    hidden_size: int = 512
    extra_rgb: bool = False
    extra_depth: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual_encoder = VisualCNN(
            self.hidden_size, self.extra_rgb, self.extra_depth, dtype=self.dtype
        )
        self.bin_encoder = AudioCNN(self.hidden_size, dtype=self.dtype)
        self.monoNmonoFromMem_encoder = AudioCNN(
            self.hidden_size, encode_mono_n_mono_from_mem=True, dtype=self.dtype
        )
        self.state_encoder = GRUStateEncoder(self.hidden_size, dtype=self.dtype)

    def visual(self, rgb=None, depth=None):
        return self.visual_encoder(rgb=rgb, depth=depth)

    def _features(self, observations, pred_binSepMasks, pred_mono, pred_monoFromMem):
        # a precomputed "visual_feats" entry (the collect scan's per-rollout
        # pose-feature bank; see make_collect) replaces the conv stack —
        # identical values, computed once per distinct pose instead of per
        # step (params are frozen within a rollout)
        # blind agent (both modalities excluded via EXTRA_RGB/EXTRA_DEPTH, or
        # a bundle with no frame data): the visual contribution drops out and
        # the GRU input narrows to 2*hidden (the reference sizes its GRU
        # input from the encoder output dims the same way, policy.py:58-63)
        vis = observations.get("visual_feats")
        if vis is None and not self.visual_encoder.is_blind:
            if (
                observations.get("rgb") is not None
                or observations.get("depth") is not None
            ):
                vis = self.visual_encoder(
                    rgb=observations.get("rgb"), depth=observations.get("depth")
                )
            else:
                # A non-blind encoder with no frames silently changes the
                # param tree and GRU input width — checkpoints trained with
                # frames cannot resume against a frames-absent bundle. Flag
                # the footgun at trace time; EXTRA_RGB/EXTRA_DEPTH is the
                # intended way to configure a truly blind agent.
                logging.getLogger(__name__).warning(
                    "PolicyNet: visual encoder is not blind but observations "
                    "carry no rgb/depth — the visual branch drops out of the "
                    "param tree. Set EXTRA_RGB/EXTRA_DEPTH to configure a "
                    "blind agent explicitly."
                )
        feats = [] if vis is None else [vis]
        feats += [
            self.bin_encoder(
                mixed_log_mag=observations["mixed_bin_audio_mag"],
                pred_bin_sep_masks=pred_binSepMasks,
            ),
            self.monoNmonoFromMem_encoder(
                pred_mono_n_mono_from_mem=jnp.concatenate(
                    [pred_mono, pred_monoFromMem], axis=-1
                )
            ),
        ]
        return jnp.concatenate(feats, axis=-1)

    def __call__(
        self, observations, hidden, masks, pred_binSepMasks, pred_mono, pred_monoFromMem
    ):
        """Single-step: observations values (B, ...), hidden (B, H), masks (B, 1)."""
        x = self._features(observations, pred_binSepMasks, pred_mono, pred_monoFromMem)
        out, new_hidden = self.state_encoder(x, hidden, masks)
        return out, new_hidden

    def seq(
        self, observations, hidden, masks, pred_binSepMasks, pred_mono, pred_monoFromMem
    ):
        """Sequence: observations values (T, N, ...), hidden (N, H),
        masks (T, N, 1). Encoders run over the flattened T*N batch (one big
        MXU-friendly batch), the GRU scans over T."""
        t, n = masks.shape[0], masks.shape[1]

        def flat(v):
            return v.reshape((t * n,) + v.shape[2:])

        obs_flat = {k: flat(v) for k, v in observations.items()}
        x = self._features(
            obs_flat, flat(pred_binSepMasks), flat(pred_mono), flat(pred_monoFromMem)
        )
        x = x.reshape(t, n, -1)
        outs, final_hidden = self.state_encoder(x, hidden, masks)
        return outs, final_hidden


class Move2HearPolicy(nn.Module):
    """Full agent: policy net + action/critic heads + the five separator
    modules (rl/ppo/policy.py:159-327)."""

    num_actions: int = 4
    hidden_size: int = 512
    extra_rgb: bool = False
    extra_depth: bool = False
    use_ddppo: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pol_net = PolicyNet(
            self.hidden_size, self.extra_rgb, self.extra_depth, dtype=self.dtype
        )
        self.action_dist = CategoricalNet(self.num_actions, dtype=self.dtype)
        self.critic = CriticHead(dtype=self.dtype)
        self.binSep_enc = PassiveSepEncoder(convert_bin2mono=False, dtype=self.dtype)
        self.binSep_dec = PassiveSepDecoder(convert_bin2mono=False, dtype=self.dtype)
        self.bin2mono_enc = PassiveSepEncoder(convert_bin2mono=True, dtype=self.dtype)
        self.bin2mono_dec = PassiveSepDecoder(convert_bin2mono=True, dtype=self.dtype)
        self.acoustic_mem = AcousticMem(use_ddppo=self.use_ddppo, dtype=self.dtype)

    def __call__(self, observations: Observations, hidden, masks):
        """Initialization path: touches every submodule once so `init` creates
        the full parameter tree (never used for actual compute)."""
        pred_masks = self.get_binSepMasks(observations)
        pred_mono = self.convert_bin2mono(
            pred_masks, observations["mixed_bin_audio_mag"]
        )
        pred_mem = self.get_monoFromMem(pred_mono, jnp.zeros_like(pred_mono))
        return self.act(
            observations,
            hidden,
            masks,
            pred_masks,
            pred_mono,
            pred_mem,
            deterministic=True,
        )

    def visual_features(self, rgb=None, depth=None):
        """Pol-net visual encodings for a batch of poses: the collect scan
        precomputes these once per rollout (one MXU-friendly conv batch over
        the S*V*4 distinct poses) and gathers per-step instead of running
        the conv stack on every step's frames — exact, since parameters are
        frozen within a rollout."""
        return self.pol_net.visual(rgb=rgb, depth=depth)

    # --- separator chain -------------------------------------------------
    def get_binSepMasks(self, observations: Observations, train: bool = False):
        bottleneck, skips = self.binSep_enc(
            observations["mixed_bin_audio_mag"],
            target_class=observations["target_class"],
            train=train,
        )
        return self.binSep_dec(bottleneck, skips, train=train)

    def convert_bin2mono(self, pred_binSepMasks, mixed_audio, train: bool = False):
        bottleneck, skips = self.bin2mono_enc(
            mixed_audio, pred_bin_sep_masks=sg(pred_binSepMasks), train=train
        )
        return self.bin2mono_dec(bottleneck, skips, train=train)

    def get_monoFromMem(
        self, pred_mono, prev_pred_monoFromMem_masked, train: bool = False
    ):
        return self.acoustic_mem(
            sg(pred_mono), sg(prev_pred_monoFromMem_masked), train=train
        )

    def get_monoFromMem_sliced(
        self, pred_mono_s, prev_masked_s, train: bool = False
    ):
        """Acoustic-mem forward on PRE-SLICED (B, F/16, T, 16) inputs,
        returning the sliced output — used by the separator refit to hoist
        the slice16/deslice16 permutations out of its grad-step scan."""
        return self.acoustic_mem(
            sg(pred_mono_s), sg(prev_masked_s), train=train, sliced=True
        )

    # --- acting ----------------------------------------------------------
    def _pol_features(
        self, observations, hidden, masks, pred_binSepMasks, pred_mono, pred_monoFromMem
    ):
        return self.pol_net(
            observations,
            hidden,
            masks,
            sg(pred_binSepMasks),
            sg(pred_mono),
            sg(pred_monoFromMem),
        )

    def act(
        self,
        observations: Observations,
        hidden,
        masks,
        pred_binSepMasks,
        pred_mono,
        pred_monoFromMem,
        rng: Optional[jax.Array] = None,
        deterministic: bool = False,
    ) -> ActOutput:
        feats, new_hidden = self._pol_features(
            observations, hidden, masks, pred_binSepMasks, pred_mono, pred_monoFromMem
        )
        dist: Categorical = self.action_dist(feats)
        value = self.critic(feats)
        if deterministic:
            action = dist.mode()
        else:
            assert rng is not None
            action = dist.sample(rng)
        return ActOutput(
            value=value,
            action=action,
            action_log_probs=dist.log_probs(action),
            hidden=new_hidden,
            probs=dist.probs(),
        )

    def get_value(
        self, observations, hidden, masks, pred_binSepMasks, pred_mono, pred_monoFromMem
    ):
        feats, _ = self._pol_features(
            observations, hidden, masks, pred_binSepMasks, pred_mono, pred_monoFromMem
        )
        return self.critic(feats)

    def evaluate_actions(
        self,
        observations: Observations,
        hidden,
        masks,
        action,
        pred_binSepMasks,
        pred_mono,
        pred_monoFromMem,
        per_step_entropy: bool = False,
    ):
        """Sequence evaluation for the PPO update: observations values
        (T, N, ...), hidden (N, H), masks (T, N, 1), action (T, N, 1).
        Returns (values (T, N, 1), log_probs (T, N, 1), entropy scalar —
        or (T, N) when `per_step_entropy`, for validity-weighted updates
        under the preemptive rollout sync — and final hidden). NOTE: unlike
        `act`, separator inputs are NOT stop-gradient-wrapped here, matching
        evaluate_actions (policy.py:248-265) — they are storage tensors
        anyway."""
        t, n = masks.shape[0], masks.shape[1]
        feats, new_hidden = self.pol_net.seq(
            observations, hidden, masks, pred_binSepMasks, pred_mono, pred_monoFromMem
        )
        feats_flat = feats.reshape(t * n, -1)
        dist: Categorical = self.action_dist(feats_flat)
        values = self.critic(feats_flat).reshape(t, n, 1)
        log_probs = dist.log_probs(action.reshape(t * n, 1)).reshape(t, n, 1)
        entropy = dist.entropy()
        entropy = (
            entropy.reshape(t, n) if per_step_entropy else entropy.mean()
        )
        return values, log_probs, entropy, new_hidden


class Move2HearPassiveWoMemoryPolicy(nn.Module):
    """Pretrain policy: just the two passive separator pairs
    (pretrain/passive/policy.py:47-97). Module paths mirror Move2HearPolicy so
    RL can copy weights by name."""

    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.binSep_enc = PassiveSepEncoder(convert_bin2mono=False, dtype=self.dtype)
        self.binSep_dec = PassiveSepDecoder(convert_bin2mono=False, dtype=self.dtype)
        self.bin2mono_enc = PassiveSepEncoder(convert_bin2mono=True, dtype=self.dtype)
        self.bin2mono_dec = PassiveSepDecoder(convert_bin2mono=True, dtype=self.dtype)

    def get_binSepMasks(self, observations: Observations, train: bool = False):
        bottleneck, skips = self.binSep_enc(
            observations["mixed_bin_audio_mag"],
            target_class=observations["target_class"],
            train=train,
        )
        return self.binSep_dec(bottleneck, skips, train=train)

    def convert_bin2mono(self, pred_binSepMasks, mixed_audio, train: bool = False):
        bottleneck, skips = self.bin2mono_enc(
            mixed_audio, pred_bin_sep_masks=sg(pred_binSepMasks), train=train
        )
        return self.bin2mono_dec(bottleneck, skips, train=train)

    def __call__(self, observations: Observations, train: bool = False):
        """Full passive forward: returns (pred_binSepMasks, pred_mono)."""
        masks = self.get_binSepMasks(observations, train=train)
        mono = self.convert_bin2mono(
            masks, observations["mixed_bin_audio_mag"], train=train
        )
        return masks, mono
