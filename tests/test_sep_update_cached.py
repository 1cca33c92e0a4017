"""The hoisted/cached separator refit must be numerically identical to the
naive per-epoch recompute (frozen separators make the cache exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from move2hear_tpu.env import build_micro_scene
from move2hear_tpu.env.device_env import build_device_bundle
from move2hear_tpu.models import Move2HearPolicy
from move2hear_tpu.rl.ppo import PPOConfig, create_agent_state
from move2hear_tpu.rl.device_rollout import (
    RolloutSepIdx,
    make_update_sep_cached,
    make_update_sep_device,
)


def test_cached_sep_update_matches_uncached():
    n, t = 2, 3
    bundle = build_micro_scene(rows=3, cols=3, num_episodes=4, rir_length=300)
    dev = build_device_bundle(bundle, with_frames=False)
    policy = Move2HearPolicy(num_actions=3, hidden_size=32, use_ddppo=True)
    rng = np.random.default_rng(0)
    obs = {
        "rgb": jnp.zeros((n, 128, 128, 3)),
        "depth": jnp.zeros((n, 128, 128, 1)),
        "mixed_bin_audio_mag": jnp.zeros((n, 512, 32, 2)),
        "target_class": jnp.zeros((n, 1), jnp.int32),
    }
    variables = policy.init(
        jax.random.PRNGKey(0), obs, jnp.zeros((n, 32)), jnp.ones((n, 1))
    )
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=1, lr_sep=1e-3)
    state = create_agent_state(cfg, variables)

    v = bundle.scene.num_nodes
    buf = RolloutSepIdx.create(t, n, 2).replace(
        sound_ids=jnp.asarray(rng.integers(0, 4, (t, n, 2)), jnp.int32),
        az_idx=jnp.asarray(rng.integers(0, 4, (t, n)), jnp.int32),
        node=jnp.asarray(rng.integers(0, v, (t, n)), jnp.int32),
        sources=jnp.asarray(rng.integers(0, v, (t, n, 2)), jnp.int32),
        target_class=jnp.asarray(rng.integers(0, 3, (t, n, 1)), jnp.int32),
        prev_mem=jnp.asarray(rng.uniform(0, 1, (t, n, 512, 32, 1)), jnp.float32),
        masks=jnp.ones((t, n, 1)),
    )
    banks = (dev.wav_bank, dev.rir_bank)
    key = jax.random.PRNGKey(7)

    upd_naive = make_update_sep_device(policy, cfg, n, 1.2)
    s1, (bin1, mono1, mem1) = upd_naive(state, buf, banks, key, 1.0)

    upd_cached = make_update_sep_cached(policy, cfg, n, 1.2, n_updates=1)
    s2, per_update = upd_cached(state, buf, banks, key, jnp.ones((1,)))
    bin2, mono2, mem2 = per_update[0]

    assert float(bin1) == pytest.approx(float(bin2), rel=1e-5)
    assert float(mono1) == pytest.approx(float(mono2), rel=1e-5)
    assert float(mem1) == pytest.approx(float(mem2), rel=1e-4)
    for a, b in zip(
        jax.tree.leaves(s1.params["acoustic_mem"]),
        jax.tree.leaves(s2.params["acoustic_mem"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # frozen islands untouched by both
    for keyname in ("binSep_enc", "pol_net"):
        for a, b in zip(
            jax.tree.leaves(state.params[keyname]),
            jax.tree.leaves(s2.params[keyname]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_slab_cached_sep_update_matches_render_cached():
    """make_update_sep_from_slabs (consuming collect-cached pred_mono/gt_mono)
    must equal make_update_sep_cached (which re-renders + re-runs the frozen
    separators) — the separators are frozen, so the cache is exact."""
    from move2hear_tpu.ops.frontend import render_binaural_mixture
    from move2hear_tpu.rl.device_rollout import make_update_sep_from_slabs

    n, t = 2, 3
    bundle = build_micro_scene(rows=3, cols=3, num_episodes=4, rir_length=300)
    dev = build_device_bundle(bundle, with_frames=False)
    policy = Move2HearPolicy(num_actions=3, hidden_size=32, use_ddppo=True)
    rng = np.random.default_rng(1)
    obs = {
        "rgb": jnp.zeros((n, 128, 128, 3)),
        "depth": jnp.zeros((n, 128, 128, 1)),
        "mixed_bin_audio_mag": jnp.zeros((n, 512, 32, 2)),
        "target_class": jnp.zeros((n, 1), jnp.int32),
    }
    variables = policy.init(
        jax.random.PRNGKey(0), obs, jnp.zeros((n, 32)), jnp.ones((n, 1))
    )
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=1, lr_sep=1e-3)
    state = create_agent_state(cfg, variables)

    v = bundle.scene.num_nodes
    buf = RolloutSepIdx.create(t, n, 2)
    buf = buf.replace(
        sound_ids=jnp.asarray(rng.integers(0, 4, (t, n, 2)), jnp.int32),
        az_idx=jnp.asarray(rng.integers(0, 4, (t, n)), jnp.int32),
        node=jnp.asarray(rng.integers(0, v, (t, n)), jnp.int32),
        sources=jnp.asarray(rng.integers(0, v, (t, n, 2)), jnp.int32),
        target_class=jnp.asarray(rng.integers(0, 3, (t, n, 1)), jnp.int32),
        prev_mem=jnp.asarray(rng.uniform(0, 1, (t, n, 512, 32, 1)), jnp.float32),
    )

    # fill the slab-cached fields exactly as the collect scan does
    flat = lambda x: x.reshape((t * n,) + x.shape[2:])
    mono = dev.wav_bank[flat(buf.sound_ids)]
    rirs = dev.rir_bank[
        flat(buf.scene_idx)[:, None], flat(buf.az_idx)[:, None],
        flat(buf.node)[:, None], flat(buf.sources)
    ]
    rendered = render_binaural_mixture(mono, rirs, gt_mono_mag_norm=1.2)
    vars_ = {"params": state.params}
    if state.batch_stats:
        vars_ = {"params": state.params, "batch_stats": state.batch_stats}
    pm = policy.apply(
        vars_,
        {"mixed_bin_audio_mag": rendered.mixed_bin_audio_mag,
         "target_class": flat(buf.target_class)},
        method=Move2HearPolicy.get_binSepMasks,
    )
    pmono = policy.apply(
        vars_, pm, rendered.mixed_bin_audio_mag,
        method=Move2HearPolicy.convert_bin2mono,
    )
    gt_mono = rendered.gt_mono_comps[..., 0::2][..., :1]
    gt_bin = rendered.gt_bin_comps[..., 0::2][..., :2]
    bin_l1 = jnp.abs(
        jnp.expm1(rendered.mixed_bin_audio_mag) * pm - gt_bin
    ).mean(axis=(1, 2, 3))
    mono_l1 = jnp.abs(pmono - gt_mono).mean(axis=(1, 2, 3))
    unflat = lambda x: x.reshape((t, n) + x.shape[1:])
    buf = buf.replace(
        pred_mono=unflat(pmono), gt_mono=unflat(gt_mono),
        bin_l1=bin_l1.reshape(t, n), mono_l1=mono_l1.reshape(t, n),
    )

    key = jax.random.PRNGKey(9)
    upd_render = make_update_sep_cached(policy, cfg, n, 1.2, n_updates=2)
    s1, per1 = upd_render(
        state, buf, (dev.wav_bank, dev.rir_bank), key, jnp.ones((2,))
    )
    upd_slab = make_update_sep_from_slabs(policy, cfg, n, n_updates=2)
    s2, per2 = upd_slab(state, buf, key, jnp.ones((2,)))

    np.testing.assert_allclose(np.asarray(per1), np.asarray(per2), rtol=1e-4, atol=1e-6)
    for a, b in zip(
        jax.tree.leaves(s1.params["acoustic_mem"]),
        jax.tree.leaves(s2.params["acoustic_mem"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bf16_slab_refit_close_to_f32():
    """TPU.SEP_SLAB_DTYPE=bfloat16 stores the big slabs at half width; the
    refit must stay numerically close to f32 storage (inputs are the only
    thing rounded — params/compute stay f32)."""
    from move2hear_tpu.rl.device_rollout import make_update_sep_from_slabs

    n, t = 2, 4
    policy = Move2HearPolicy(num_actions=3, hidden_size=32, use_ddppo=True)
    rng = np.random.default_rng(3)
    obs = {
        "rgb": jnp.zeros((n, 128, 128, 3)),
        "depth": jnp.zeros((n, 128, 128, 1)),
        "mixed_bin_audio_mag": jnp.zeros((n, 512, 32, 2)),
        "target_class": jnp.zeros((n, 1), jnp.int32),
    }
    variables = policy.init(
        jax.random.PRNGKey(0), obs, jnp.zeros((n, 32)), jnp.ones((n, 1))
    )
    cfg = PPOConfig(ppo_epoch=1, num_mini_batch=1, lr_sep=1e-3)
    state = create_agent_state(cfg, variables)

    u = lambda *s: jnp.asarray(rng.uniform(0, 1, s), jnp.float32)
    fields = dict(
        prev_mem=u(t, n, 512, 32, 1),
        pred_mono=u(t, n, 512, 32, 1),
        gt_mono=u(t, n, 512, 32, 1),
        masks=jnp.ones((t, n, 1)),
        bin_l1=u(t, n),
        mono_l1=u(t, n),
    )
    buf32 = RolloutSepIdx.create(t, n, 2).replace(**fields)
    buf16 = RolloutSepIdx.create(t, n, 2, slab_dtype=jnp.bfloat16).replace(
        **{
            k: v.astype(jnp.bfloat16)
            if k in ("prev_mem", "pred_mono", "gt_mono")
            else v
            for k, v in fields.items()
        }
    )
    upd = make_update_sep_from_slabs(policy, cfg, n, 1)
    key = jax.random.PRNGKey(5)
    lrs = jnp.ones((1,))
    s32, l32 = upd(state, buf32, key, lrs)
    s16, l16 = upd(state, buf16, key, lrs)
    np.testing.assert_allclose(
        np.asarray(l16), np.asarray(l32), rtol=2e-2, atol=2e-3
    )
    for a, b in zip(jax.tree.leaves(s16.params), jax.tree.leaves(s32.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3
        )
