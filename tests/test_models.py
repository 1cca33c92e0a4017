"""Shape, parameter-count, and semantic tests for all model modules.

Parameter counts are checked against the exact torch layer shapes of the
reference (separator_cnn.py, audio_cnn.py, visual_cnn.py, memory_nets.py,
rnn_state_encoder.py, policy.py) computed analytically below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from move2hear_tpu.models import (
    AcousticMem,
    AudioCNN,
    GRUStateEncoder,
    Move2HearPassiveWoMemoryPolicy,
    Move2HearPolicy,
    PassiveSepDecoder,
    PassiveSepEncoder,
    VisualCNN,
)

F, T = 512, 32


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def conv_p(cin, cout, k, bias=False):
    return cin * cout * k * k + (cout if bias else 0)


def bn_p(c):
    return 2 * c  # scale + bias (affine); running stats are not params


def enc_params(cin):
    chans = [cin, 64, 128, 256, 512, 512]
    return sum(
        conv_p(chans[i], chans[i + 1], 4) + bn_p(chans[i + 1]) for i in range(5)
    )


def dec_params(n_out):
    # upconvs: (512->512)(1024->256)(512->128)(256->64)(128->n_out), each
    # ConvT+BN (block 5 included — outermost is never True in the reference,
    # separator_cnn.py:127-135), + final 1x1 conv with bias
    plan = [(512, 512), (1024, 256), (512, 128), (256, 64), (128, n_out)]
    total = sum(conv_p(cin, cout, 4) + bn_p(cout) for cin, cout in plan)
    total += conv_p(n_out, n_out, 1, bias=True)
    return total


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_sep_encoder_bin_variant(key):
    enc = PassiveSepEncoder(convert_bin2mono=False)
    mix = jnp.zeros((2, F, T, 2))
    tc = jnp.zeros((2, 1), jnp.int32)
    variables = enc.init(key, mix, target_class=tc)
    bottleneck, skips = enc.apply(variables, mix, target_class=tc)
    assert bottleneck.shape == (2, 512)
    assert [s.shape for s in skips] == [
        (2, 2, 2, 512), (2, 4, 4, 256), (2, 8, 8, 128), (2, 16, 16, 64)
    ]
    assert n_params(variables["params"]) == enc_params(33)


def test_sep_encoder_bin2mono_variant(key):
    enc = PassiveSepEncoder(convert_bin2mono=True)
    mix = jnp.zeros((2, F, T, 2))
    mask = jnp.zeros((2, F, T, 2))
    variables = enc.init(key, mix, pred_bin_sep_masks=mask)
    bottleneck, skips = enc.apply(variables, mix, pred_bin_sep_masks=mask)
    assert bottleneck.shape == (2, 512)
    assert n_params(variables["params"]) == enc_params(32)


@pytest.mark.parametrize("bin2mono,cout", [(False, 2), (True, 1)])
def test_sep_decoder(key, bin2mono, cout):
    dec = PassiveSepDecoder(convert_bin2mono=bin2mono)
    bottleneck = jnp.zeros((2, 512))
    skips = [
        jnp.zeros((2, 2, 2, 512)),
        jnp.zeros((2, 4, 4, 256)),
        jnp.zeros((2, 8, 8, 128)),
        jnp.zeros((2, 16, 16, 64)),
    ]
    variables = dec.init(key, bottleneck, skips)
    out = dec.apply(variables, bottleneck, skips)
    assert out.shape == (2, F, T, cout)
    assert n_params(variables["params"]) == dec_params(16 * cout)


def test_acoustic_mem(key):
    for use_ddppo, expected in [
        (True, conv_p(32, 32, 3) + conv_p(32, 16, 3)),
        (False, conv_p(32, 32, 3) + bn_p(32) + conv_p(32, 16, 3)),
    ]:
        mem = AcousticMem(use_ddppo=use_ddppo)
        mono = jnp.zeros((2, F, T, 1))
        variables = mem.init(key, mono, mono)
        out = mem.apply(variables, mono, mono)
        assert out.shape == (2, F, T, 1)
        assert n_params(variables["params"]) == expected


def test_audio_cnn(key):
    # conv dims: 32 -> 7 -> 2 -> 1 (audio_cnn.py:33-48) => linear in = 32
    expected = (
        conv_p(32, 32, 8, bias=True)
        + conv_p(32, 64, 4, bias=True)
        + conv_p(64, 32, 2, bias=True)
        + 32 * 512 + 512
    )
    cnn = AudioCNN(512)
    mix = jnp.zeros((2, F, T, 2))
    mask = jnp.zeros((2, F, T, 2))
    variables = cnn.init(key, mixed_log_mag=mix, pred_bin_sep_masks=mask)
    out = cnn.apply(variables, mixed_log_mag=mix, pred_bin_sep_masks=mask)
    assert out.shape == (2, 512)
    assert n_params(variables["params"]) == expected

    cnn2 = AudioCNN(512, encode_mono_n_mono_from_mem=True)
    mono2 = jnp.zeros((2, F, T, 2))
    v2 = cnn2.init(key, pred_mono_n_mono_from_mem=mono2)
    assert cnn2.apply(v2, pred_mono_n_mono_from_mem=mono2).shape == (2, 512)


def test_visual_cnn(key):
    # conv dims: 128 -> 31 -> 14 -> 12 (visual_cnn.py:54-63) => linear in = 32*12*12
    expected = (
        conv_p(4, 32, 8, bias=True)
        + conv_p(32, 64, 4, bias=True)
        + conv_p(64, 32, 3, bias=True)
        + 32 * 12 * 12 * 512 + 512
    )
    cnn = VisualCNN(512)
    rgb = jnp.zeros((2, 128, 128, 3))
    depth = jnp.zeros((2, 128, 128, 1))
    variables = cnn.init(key, rgb=rgb, depth=depth)
    out = cnn.apply(variables, rgb=rgb, depth=depth)
    assert out.shape == (2, 512)
    assert n_params(variables["params"]) == expected


def test_gru_masked_seq_equals_stepwise(key):
    """seq_forward with episode-boundary masks must equal step-by-step
    application with hidden reset (the reference's segmented semantics,
    rnn_state_encoder.py:86-137)."""
    enc = GRUStateEncoder(16)
    rng = np.random.default_rng(1)
    t, n, d = 7, 3, 5
    x = jnp.asarray(rng.standard_normal((t, n, d)), jnp.float32)
    masks = np.ones((t, n, 1), np.float32)
    masks[3, 1] = 0.0  # env 1 resets at t=3
    masks[5, 0] = 0.0
    masks = jnp.asarray(masks)
    h0 = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)

    variables = enc.init(key, x[0], h0, masks[0])
    outs_seq, h_seq = enc.apply(variables, x, h0, masks)

    h = h0
    outs = []
    for i in range(t):
        out, h = enc.apply(variables, x[i], h, masks[i])
        outs.append(out)
    np.testing.assert_allclose(np.asarray(outs_seq), np.asarray(jnp.stack(outs)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(h), atol=1e-5)

    # GRU params: torch GRU(1536->512): here d->16
    expected = d * 3 * 16 + 16 * 3 * 16 + 2 * 3 * 16
    assert n_params(variables["params"]) == expected


def _dummy_obs(b):
    return {
        "rgb": jnp.zeros((b, 128, 128, 3)),
        "depth": jnp.zeros((b, 128, 128, 1)),
        "mixed_bin_audio_mag": jnp.zeros((b, F, T, 2)),
        "target_class": jnp.zeros((b, 1), jnp.int32),
        "gt_mono_comps": jnp.zeros((b, F, T, 4)),
        "gt_bin_comps": jnp.zeros((b, F, T, 8)),
    }


def test_move2hear_policy_full(key):
    policy = Move2HearPolicy(num_actions=4, hidden_size=512, use_ddppo=True)
    b = 2
    obs = _dummy_obs(b)
    hidden = jnp.zeros((b, 512))
    masks = jnp.ones((b, 1))
    variables = policy.init(key, obs, hidden, masks)

    # expected total param count from the reference architecture
    gru = 3 * 512 * (3 * 512) + 512 * 3 * 512 + 2 * 3 * 512
    visual = (
        conv_p(4, 32, 8, True) + conv_p(32, 64, 4, True) + conv_p(64, 32, 3, True)
        + 32 * 144 * 512 + 512
    )
    audio = (
        conv_p(32, 32, 8, True) + conv_p(32, 64, 4, True) + conv_p(64, 32, 2, True)
        + 32 * 512 + 512
    )
    heads = (512 * 4 + 4) + (512 + 1)
    mem = conv_p(32, 32, 3) + conv_p(32, 16, 3)
    expected = (
        gru + visual + 2 * audio + heads + mem
        + enc_params(33) + dec_params(32) + enc_params(32) + dec_params(16)
    )
    assert n_params(variables["params"]) == expected

    pred_masks = policy.apply(variables, obs, method=Move2HearPolicy.get_binSepMasks)
    assert pred_masks.shape == (b, F, T, 2)
    pred_mono = policy.apply(
        variables, pred_masks, obs["mixed_bin_audio_mag"],
        method=Move2HearPolicy.convert_bin2mono,
    )
    assert pred_mono.shape == (b, F, T, 1)
    pred_mem = policy.apply(
        variables, pred_mono, jnp.zeros_like(pred_mono),
        method=Move2HearPolicy.get_monoFromMem,
    )
    assert pred_mem.shape == (b, F, T, 1)

    out = policy.apply(
        variables, obs, hidden, masks, pred_masks, pred_mono, pred_mem,
        jax.random.PRNGKey(1), False, method=Move2HearPolicy.act,
    )
    assert out.value.shape == (b, 1)
    assert out.action.shape == (b, 1)
    assert out.action_log_probs.shape == (b, 1)
    assert out.hidden.shape == (b, 512)
    assert out.probs.shape == (b, 4)

    # sigmoid mask in (0, 1)... after the final 1x1 conv output is unbounded,
    # but finite and well-formed
    assert np.isfinite(np.asarray(pred_masks)).all()

    # evaluate_actions on a (T=3, N=2) sequence
    t = 3
    obs_seq = {k: jnp.broadcast_to(v[None], (t,) + v.shape) for k, v in obs.items()}
    masks_seq = jnp.ones((t, b, 1))
    actions = jnp.zeros((t, b, 1), jnp.int32)
    values, log_probs, entropy, h = policy.apply(
        variables, obs_seq, hidden, masks_seq, actions,
        jnp.broadcast_to(pred_masks[None], (t,) + pred_masks.shape),
        jnp.broadcast_to(pred_mono[None], (t,) + pred_mono.shape),
        jnp.broadcast_to(pred_mem[None], (t,) + pred_mem.shape),
        method=Move2HearPolicy.evaluate_actions,
    )
    assert values.shape == (t, b, 1)
    assert log_probs.shape == (t, b, 1)
    assert entropy.shape == ()
    assert h.shape == (b, 512)


def test_passive_policy_mirrors_separator_subtrees(key):
    passive = Move2HearPassiveWoMemoryPolicy()
    obs = {
        "mixed_bin_audio_mag": jnp.zeros((1, F, T, 2)),
        "target_class": jnp.zeros((1, 1), jnp.int32),
    }
    variables = passive.init(key, obs)
    params = variables["params"]
    assert set(params.keys()) == {
        "binSep_enc", "binSep_dec", "bin2mono_enc", "bin2mono_dec"
    }
    masks, mono = passive.apply(variables, obs)
    assert masks.shape == (1, F, T, 2)
    assert mono.shape == (1, F, T, 1)

    # subtree structure must match the full policy's for name-based copy
    full = Move2HearPolicy(use_ddppo=True)
    fv = full.init(
        key, _dummy_obs(1), jnp.zeros((1, 512)), jnp.ones((1, 1))
    )
    for sub in params:
        a = jax.tree.structure(params[sub])
        b2 = jax.tree.structure(fv["params"][sub])
        assert a == b2, sub
