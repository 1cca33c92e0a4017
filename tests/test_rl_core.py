"""Golden tests for GAE, PPO update mechanics, STFT-L2 and BSS-eval metrics,
and the config system."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from move2hear_tpu.rl import compute_returns
from move2hear_tpu.eval import stft_l2_distance, scale_bss_eval, evaluate
from move2hear_tpu.eval.bss import np_istft
from move2hear_tpu.utils.config_tree import Config
from move2hear_tpu.config import get_config, default_config


# --- GAE --------------------------------------------------------------------

def ref_gae(rewards, values, masks, gamma, tau):
    """Direct port of the reference loop (rollout_storage.py:159-173)."""
    T = rewards.shape[0]
    returns = np.zeros_like(values)
    gae = 0.0
    for step in reversed(range(T)):
        delta = rewards[step] + gamma * values[step + 1] * masks[step + 1] - values[step]
        gae = delta + gamma * tau * masks[step + 1] * gae
        returns[step] = gae + values[step]
    returns[-1] = values[-1]
    return returns


def ref_discounted(rewards, values, masks, gamma):
    T = rewards.shape[0]
    returns = np.zeros_like(values)
    returns[-1] = values[-1]
    for step in reversed(range(T)):
        returns[step] = returns[step + 1] * gamma * masks[step + 1] + rewards[step]
    return returns


def test_gae_matches_reference_loop(rng):
    T, N = 20, 4
    rewards = rng.standard_normal((T, N, 1)).astype(np.float32)
    values = rng.standard_normal((T + 1, N, 1)).astype(np.float32)
    masks = (rng.uniform(size=(T + 1, N, 1)) > 0.2).astype(np.float32)

    ours = np.asarray(compute_returns(rewards, values, masks, 0.99, 0.95, True))
    ref = ref_gae(rewards, values, masks, 0.99, 0.95)
    np.testing.assert_allclose(ours[:-1], ref[:-1], atol=1e-5)

    ours_d = np.asarray(compute_returns(rewards, values, masks, 0.99, 0.95, False))
    ref_d = ref_discounted(rewards, values, masks, 0.99)
    np.testing.assert_allclose(ours_d, ref_d, atol=1e-5)


# --- STFT-L2 ----------------------------------------------------------------

def ref_stft_l2(mixed, masks_pred, gt_bin, pred_mono, gt_mono):
    """Numpy port of eval_metrics.py:306-366."""
    B = mixed.shape[0]
    mixed_lin = np.exp(mixed) - 1
    pred_bin = mixed_lin * masks_pred

    def ri(mag, ph):
        return np.stack([mag * np.cos(ph), mag * np.sin(ph)], 1).reshape(B, 1, -1)

    bin_d = (
        ((ri(gt_bin[..., 0], gt_bin[..., 1]) - ri(pred_bin[..., 0], gt_bin[..., 1])) ** 2).mean(2)
        + ((ri(gt_bin[..., 2], gt_bin[..., 3]) - ri(pred_bin[..., 1], gt_bin[..., 3])) ** 2).mean(2)
    )
    mono_d = ((ri(gt_mono[..., 0], gt_mono[..., 1]) - ri(pred_mono[..., 0], gt_mono[..., 1])) ** 2).mean(2)
    return bin_d, mono_d


def test_stft_l2_matches_reference(rng):
    B = 3
    mixed = np.abs(rng.standard_normal((B, 512, 32, 2))).astype(np.float32)
    masks_pred = rng.uniform(0, 1, (B, 512, 32, 2)).astype(np.float32)
    gt_bin = rng.standard_normal((B, 512, 32, 8)).astype(np.float32)
    pred_mono = np.abs(rng.standard_normal((B, 512, 32, 1))).astype(np.float32)
    gt_mono = rng.standard_normal((B, 512, 32, 4)).astype(np.float32)

    ours_bin, ours_mono = stft_l2_distance(mixed, masks_pred, gt_bin, pred_mono, gt_mono)
    ref_bin, ref_mono = ref_stft_l2(mixed, masks_pred, gt_bin, pred_mono, gt_mono)
    np.testing.assert_allclose(np.asarray(ours_bin), ref_bin, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_mono), ref_mono, rtol=1e-4, atol=1e-4)


# --- BSS eval ---------------------------------------------------------------

def test_si_sdr_perfect_estimate(rng):
    s = rng.standard_normal(16000)
    refs = s[:, None]
    noise = rng.standard_normal(16000) * 0.1
    est = s + noise
    mix = s + rng.standard_normal(16000)

    si_sdr, si_sir, si_sar, sd_sdr, snr, srr, si_sdri, *_ = scale_bss_eval(
        refs, est, mix, 0
    )
    # SNR should be ~ 10*log10(var(s)/var(noise)) = ~20 dB
    assert 15 < snr < 25
    assert si_sdr == pytest.approx(snr, abs=1.5)
    assert si_sdri > 0  # estimate better than mixture

    # scaling invariance of SI-SDR
    si_sdr2 = scale_bss_eval(refs, est * 3.7, mix, 0)[0]
    assert si_sdr2 == pytest.approx(si_sdr, abs=1e-6)


def test_evaluate_shapes(rng):
    s = rng.standard_normal((1, 16000))
    est = s + 0.05 * rng.standard_normal((1, 16000))
    mix = rng.standard_normal((2, 16000))
    scores = evaluate([s], [est], [mix])
    assert set(scores) >= {"si_sdr", "si_sdri", "snr"}
    assert scores["si_sdr"] > 20


def test_np_istft_roundtrip(rng):
    y = rng.standard_normal(16000).astype(np.float32)
    pad = np.pad(y, 511, mode="reflect")
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(1023) / 1023))
    S = np.stack(
        [np.fft.rfft(pad[i * 512 : i * 512 + 1023] * win) for i in range(32)], axis=1
    )
    out = np_istft(np.abs(S), np.angle(S), length=16000)
    assert np.abs(out[1024:-1024] - y[1024:-1024]).max() < 5e-3


# --- config -----------------------------------------------------------------

def test_config_tree_merge_and_freeze(tmp_path):
    c = Config({"A": 1, "B": {"C": 2.0, "D": [1, 2]}})
    c.merge_from_list(["B.C", "3.5", "A", 7])
    assert c.B.C == 3.5 and c.A == 7
    yaml_file = tmp_path / "x.yaml"
    yaml_file.write_text("B:\n  D: [9]\nE: hello\n")
    c.merge_from_file(str(yaml_file))
    assert c.B.D == [9] and c.E == "hello"
    c.freeze()
    with pytest.raises(AttributeError):
        c.A = 9
    c2 = c.clone()
    c2.defrost()
    c2.A = 9
    assert c.A == 7 and c2.A == 9


def test_get_config_derived_fields(tmp_path):
    cfg = get_config(model_dir=str(tmp_path), opts=["NUM_SOUNDS_IN_MIX", "2"])
    assert cfg.TASK_CONFIG.TASK.GT_MONO_COMPONENTS_SENSOR.FEATURE_SHAPE == [512, 32, 4]
    assert cfg.TASK_CONFIG.TASK.GT_BIN_COMPONENTS_SENSOR.FEATURE_SHAPE == [512, 32, 8]
    assert cfg.CHECKPOINT_FOLDER == str(tmp_path / "data")
    with pytest.raises(AttributeError):
        cfg.SEED = 1  # frozen


def test_switch_policy_forces_single_process(tmp_path):
    cfg = get_config(
        model_dir=str(tmp_path), opts=["RL.PPO.switch_policy", "True"]
    )
    assert cfg.NUM_PROCESSES == 1
    assert cfg.EVAL.USE_CKPT_CONFIG is False


def test_sep_buffer_slot_layout_regression():
    """Pin the sep-buffer slot layout (VERDICT r1 weak-7): the slot-0 seed
    written at init must survive the first insert_sep (which targets slot
    step+1, mirroring rollout_storage.py:102-148's next-slot convention)."""
    import jax.numpy as jnp

    from move2hear_tpu.rl.rollout import create_rollout_sep, insert_sep

    t, n, s, r = 3, 2, 2, 8
    buf = create_rollout_sep(t, n, num_sources=s, rir_length=r)
    seed_ids = jnp.full((n, s), 7, jnp.int32)
    buf = buf.replace(sound_ids=buf.sound_ids.at[0].set(seed_ids))

    buf = insert_sep(
        buf,
        jnp.asarray(0),
        jnp.full((n, s), 3, jnp.int32),
        jnp.ones((n, s, r, 2)),
        jnp.full((n, 1), 2, jnp.int32),
        jnp.zeros((n, 1)),
        jnp.zeros((n, 512, 32, 1)),
    )
    assert (np.asarray(buf.sound_ids[0]) == 7).all()   # seed intact
    assert (np.asarray(buf.sound_ids[1]) == 3).all()   # insert went to step+1
    assert (np.asarray(buf.sound_ids[2]) == 0).all()


# --- reward override (reference aliasing) -----------------------------------

def _ref_reward_util(pred, gt):
    """reward_util (env_utils.py:708-713): -MSE(pred, gt)/mean(gt^2)."""
    return -float(np.mean((pred - gt) ** 2)) / float(np.mean(gt ** 2))


def _ref_override_rewards(rewards, dones, next_pred, next_gt,
                          reward_type=None, pred=None, gt=None,
                          extra_reward_multiplier=10.0):
    """Faithful replay of override_rewards (env_utils.py:690-705): mutates
    the rewards LIST in place and returns the SAME list object."""
    for idx in range(len(rewards)):
        if not dones[idx]:
            rewards[idx] = _ref_reward_util(next_pred[idx], next_gt[idx])
            if reward_type == "quality_improvement":
                rewards[idx] -= _ref_reward_util(pred[idx], gt[idx])
            else:
                rewards[idx] *= extra_reward_multiplier
        else:
            rewards[idx] = 0.0
    return rewards


def test_sep_reward_matches_reference_aliasing(rng):
    """Replay the reference's trainer call sequence (ppo_trainer.py:385-405)
    for every step position of a MAX_EPISODE_STEPS=20 episode and pin our
    fused sep_reward against it — including the bonus step MAX-2, where the
    reference's in-place list aliasing makes the effective reward
    2*extra_mult*q_next with the quality-improvement delta DISCARDED."""
    from move2hear_tpu.rl.device_rollout import sep_reward

    n, max_steps, em = 4, 20, 10.0
    for step in range(max_steps):
        pred = rng.standard_normal((n, 8, 4)).astype(np.float32)
        gt = np.abs(rng.standard_normal((n, 8, 4))).astype(np.float32) + 0.1
        next_pred = rng.standard_normal((n, 8, 4)).astype(np.float32)
        next_gt = np.abs(rng.standard_normal((n, 8, 4))).astype(np.float32) + 0.1
        dones = [False, True, False, False] if step % 3 == 0 else [False] * n

        # ---- reference sequence (lists, in-place, aliasing) --------------
        rewards = [0.123] * n  # env rewards, about to be overridden
        rewards = _ref_override_rewards(
            rewards, dones, next_pred, next_gt, "quality_improvement",
            pred=pred, gt=gt,
        )
        if step == max_steps - 2:
            rewards_extra = _ref_override_rewards(
                rewards, dones, next_pred, next_gt, "extra",
                extra_reward_multiplier=em,
            )
            assert rewards_extra is rewards  # the aliasing under test
            rewards = (np.array(rewards) + np.array(rewards_extra)).tolist()
        ref = np.asarray(rewards, np.float32)

        # ---- ours --------------------------------------------------------
        q_now = np.asarray([_ref_reward_util(pred[i], gt[i]) for i in range(n)],
                           np.float32)
        q_next = np.asarray(
            [_ref_reward_util(next_pred[i], next_gt[i]) for i in range(n)],
            np.float32,
        )
        not_done = 1.0 - np.asarray(dones, np.float32)
        ours = np.asarray(sep_reward(
            jnp.asarray(q_now), jnp.asarray(q_next), jnp.asarray(not_done),
            step == max_steps - 2, em,
        ))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
