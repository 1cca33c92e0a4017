"""Device-env vs host-env parity: the on-device environment must reproduce
the host simulator's movement, azimuth, episode cycling, rewards and RIR
selection exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from move2hear_tpu.env import build_micro_scene
from move2hear_tpu.env.device_env import (
    build_device_bundle,
    env_reset_all,
    env_step,
    gather_sensors,
    make_order_table,
    observe,
)
from move2hear_tpu.env.sim import AAViSSSim


@pytest.fixture(scope="module")
def setup():
    bundle = build_micro_scene(rows=3, cols=3, num_episodes=8, rir_length=300)
    dev = build_device_bundle(bundle)
    return bundle, dev


def test_device_vs_host_trajectory(setup):
    bundle, dev = setup
    n_envs, max_steps = 2, 5
    order = make_order_table(n_envs, len(bundle.episodes), seed=3)
    state = env_reset_all(dev.scene, dev.episodes, jnp.asarray(order))

    # host twins following the same episode order
    sims = []
    for i in range(n_envs):
        sim = AAViSSSim(bundle.scene, bundle.audio_db, bundle.frame_cache)
        sim.reset(bundle.episodes.episodes[order[i, 0]])
        sims.append(sim)
    cursors = [0] * n_envs
    steps = [0] * n_envs

    rng = np.random.default_rng(0)
    for t in range(14):
        actions = rng.integers(1, 4, n_envs)  # FWD/LEFT/RIGHT sim codes
        state, info = env_step(
            dev.scene, dev.episodes, state, jnp.asarray(actions, jnp.int32),
            max_steps,
        )
        for i in range(n_envs):
            sims[i].step(int(actions[i]))
            steps[i] += 1
            # host-side geo/reward checks before any reset
            assert float(info["geo"][i]) == pytest.approx(
                sims[i].geo_dist_to_target()
            )
            if steps[i] >= max_steps:
                assert bool(info["done"][i])
                cursors[i] = (cursors[i] + 1) % order.shape[1]
                sims[i].reset(bundle.episodes.episodes[order[i, cursors[i]]])
                steps[i] = 0
            else:
                assert not bool(info["done"][i])
            assert int(state.node[i]) == sims[i].receiver_node
            assert int(state.rot[i]) == sims[i]._rotation

        obs = observe(dev.episodes, state)
        for i in range(n_envs):
            assert int(obs.azimuth_idx[i]) == sims[i].azimuth_angle // 90
            assert int(obs.target_class[i, 0]) == sims[i].target_class
            keys = sims[i].audio_render_keys()
            np.testing.assert_array_equal(
                np.asarray(obs.sound_ids[i]), keys["sound_ids"]
            )


def test_device_rir_and_frame_banks_match_host(setup):
    bundle, dev = setup
    order = make_order_table(1, len(bundle.episodes), seed=1)
    state = env_reset_all(dev.scene, dev.episodes, jnp.asarray(order))
    sim = AAViSSSim(bundle.scene, bundle.audio_db, bundle.frame_cache)
    sim.reset(bundle.episodes.episodes[order[0, 0]])

    obs = observe(dev.episodes, state)
    sensors = gather_sensors(dev, obs)
    keys = sim.audio_render_keys()
    # the precomputed-audio path gathers rffts instead of raw wavs/RIRs;
    # check the underlying banks directly
    rirs_from_bank = dev.rir_bank[
        np.asarray(obs.azimuth_idx[0]), np.asarray(obs.node[0]),
        np.asarray(obs.sources[0]),
    ]
    np.testing.assert_allclose(np.asarray(rirs_from_bank), keys["rirs"])
    np.testing.assert_array_equal(
        np.asarray(dev.wav_bank[np.asarray(obs.sound_ids[0])]),
        bundle.audio_db.mono_bank()[keys["sound_ids"]],
    )
    host_obs = sim.get_observations()
    np.testing.assert_array_equal(np.asarray(sensors["rgb"][0]), host_obs["rgb"])
    np.testing.assert_allclose(np.asarray(sensors["depth"][0]), host_obs["depth"])


def test_nav_reward_matches_distance_delta():
    bundle = build_micro_scene(
        rows=3, cols=3, num_episodes=8, rir_length=300, near_target=False
    )
    dev = build_device_bundle(bundle)
    far = [
        i for i, e in enumerate(bundle.episodes.episodes)
        if e.geodesic_distance >= 2
    ]
    assert far, "far-target fixture must contain far episodes"
    order = np.asarray([[far[0]]], np.int32)
    state = env_reset_all(dev.scene, dev.episodes, jnp.asarray(order))
    total = 0.0
    geo0 = float(state.prev_geo[0])
    for t in range(6):
        state, info = env_step(
            dev.scene, dev.episodes, state,
            jnp.asarray([1], jnp.int32), 100,
        )
        total += float(info["nav_reward"][0])
    assert total == pytest.approx(geo0 - float(info["geo"][0]))
