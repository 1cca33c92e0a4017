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
        np.asarray(obs.scene_idx[0]), np.asarray(obs.azimuth_idx[0]),
        np.asarray(obs.node[0]), np.asarray(obs.sources[0]),
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


# --- multi-scene: padded scene-stacked banks (VERDICT r2 item 2) -------------

@pytest.fixture(scope="module")
def multi_setup():
    from move2hear_tpu.env.audio_db import SyntheticAudioDB
    from move2hear_tpu.env.episodes import EpisodeDataset, generate_episodes
    from move2hear_tpu.env.frame_cache import SyntheticFrameCache
    from move2hear_tpu.env.micro_scene import DEFAULT_SOUNDS, MicroSceneBundle
    from move2hear_tpu.env.scene import GraphScene

    # deliberately different sizes: sceneB pads to sceneA's V
    scene_a = GraphScene.grid("sceneA", 3, 3)
    scene_b = GraphScene.grid("sceneB", 2, 4)
    audio_db = SyntheticAudioDB(DEFAULT_SOUNDS, rir_length=300)
    eps = (
        generate_episodes(scene_a, DEFAULT_SOUNDS, 4, seed=1,
                          esc_sounds=("esc",)).episodes
        + generate_episodes(scene_b, DEFAULT_SOUNDS, 4, seed=2,
                            esc_sounds=("esc",)).episodes
    )
    bundle = MicroSceneBundle(
        scene={"sceneA": scene_a, "sceneB": scene_b},
        audio_db=audio_db,
        frame_cache=SyntheticFrameCache(),
        episodes=EpisodeDataset(eps),
    )
    return bundle, build_device_bundle(bundle)


def test_multi_scene_banks_shapes(multi_setup):
    bundle, dev = multi_setup
    assert dev.scene.num_scenes == 2
    assert dev.scene.dist.shape == (2, 9, 9)
    assert dev.rir_bank.shape[:4] == (2, 4, 9, 9)
    assert dev.rgb_bank.shape[:3] == (2, 9, 4)
    # sceneB (8 nodes) padding: node 8 has no neighbors, dist -1
    assert (np.asarray(dev.scene.neighbors[1, 8]) == -1).all()
    assert (np.asarray(dev.scene.dist[1, 8, :8]) == -1).all()


def test_multi_scene_device_vs_host_trajectory(multi_setup):
    """Full parity over a mixed-scene episode order: each env switches scene
    per episode; movement, geodesics, RIR gathers must all match the host
    sim, which reconfigures per episode like habitat."""
    bundle, dev = multi_setup
    n_envs, max_steps = 2, 4
    # env 0 interleaves both scenes in its order; env 1 stays on sceneB
    a = [i for i, e in enumerate(bundle.episodes.episodes)
         if e.scene_id == "sceneA"]
    b = [i for i, e in enumerate(bundle.episodes.episodes)
         if e.scene_id == "sceneB"]
    order = np.asarray([[a[0], b[0], a[1]], [b[1], b[2], b[3]]], np.int32)
    state = env_reset_all(dev.scene, dev.episodes, jnp.asarray(order))

    sims = []
    for i in range(n_envs):
        sim = AAViSSSim(bundle.scenes, bundle.audio_db, bundle.frame_cache)
        sim.reset(bundle.episodes.episodes[order[i, 0]])
        sims.append(sim)
    cursors = [0] * n_envs
    steps = [0] * n_envs

    rng = np.random.default_rng(7)
    for t in range(3 * max_steps):
        actions = rng.integers(1, 4, n_envs)
        state, info = env_step(
            dev.scene, dev.episodes, state, jnp.asarray(actions, jnp.int32),
            max_steps,
        )
        for i in range(n_envs):
            sims[i].step(int(actions[i]))
            steps[i] += 1
            assert float(info["geo"][i]) == pytest.approx(
                sims[i].geo_dist_to_target()
            )
            if steps[i] >= max_steps:
                assert bool(info["done"][i])
                cursors[i] = (cursors[i] + 1) % order.shape[1]
                sims[i].reset(bundle.episodes.episodes[order[i, cursors[i]]])
                steps[i] = 0
            assert int(state.node[i]) == sims[i].receiver_node
            assert int(state.rot[i]) == sims[i]._rotation

        obs = observe(dev.episodes, state)
        sensors = gather_sensors(dev, obs)
        for i in range(n_envs):
            # the env's scene index follows its current episode's scene
            expect_scene = 0 if sims[i].scene.name == "sceneA" else 1
            assert int(obs.scene_idx[i]) == expect_scene
            keys = sims[i].audio_render_keys()
            rirs_dev = dev.rir_bank[
                int(obs.scene_idx[i]), np.asarray(obs.azimuth_idx[i]),
                np.asarray(obs.node[i]), np.asarray(obs.sources[i]),
            ]
            np.testing.assert_allclose(np.asarray(rirs_dev), keys["rirs"])
