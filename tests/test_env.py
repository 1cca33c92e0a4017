"""Tests for the environment runtime: movement semantics, azimuth math,
geodesics, episode iteration, rewards, vector envs, and host-vs-device audio
rendering parity."""

import numpy as np
import pytest

from move2hear_tpu.env import (
    AAViSSEnv,
    AAViSSSim,
    Action,
    GraphScene,
    ProcessVectorEnv,
    SyncVectorEnv,
    build_micro_scene,
    generate_episodes,
)
from move2hear_tpu.env.episodes import Episode


@pytest.fixture(scope="module")
def bundle():
    return build_micro_scene(rows=3, cols=3, num_episodes=6, rir_length=400)


def test_grid_scene_geometry():
    scene = GraphScene.grid("g", 3, 3)
    # node layout: x = col, z = row; node 4 is center
    assert scene.num_nodes == 9
    # direction from center (1,1)=4 to east neighbor (1,2)=5: dx=+1, dz=0 -> 0
    assert scene.edge_direction(4, 5) == 0
    assert scene.edge_direction(4, 3) == 180
    assert scene.edge_direction(4, 7) == 90   # +z
    assert scene.edge_direction(4, 1) == 270
    assert scene.shortest_path_steps(0, 8) == 4
    assert scene.geodesic_distance(0, 8) == 4.0
    assert scene.euclidean_distance(0, 8) == pytest.approx(np.sqrt(8))


def test_sim_movement_semantics(bundle):
    sim = AAViSSSim(bundle.scene, bundle.audio_db, bundle.frame_cache)
    ep = Episode(
        episode_id="t", scene_id="micro", start_node=4, start_rotation=0,
        source_nodes=[0, 8], sound_names=["class0", "music"], target_class=0,
    )
    sim.reset(ep)
    # rotation 0 -> orientation 270 -> neighbor with direction 270 is node 1
    assert sim.get_orientation() == 270
    sim.step(Action.MOVE_FORWARD)
    assert sim.receiver_node == 1

    # TURN_LEFT increases rotation by 90 (counterclockwise)
    sim.step(Action.TURN_LEFT)
    assert sim.get_orientation() == 180
    assert sim.azimuth_angle == 270

    # forward now goes -x: from node 1 (row 0, col 1) to node 0
    sim.step(Action.MOVE_FORWARD)
    assert sim.receiver_node == 0
    assert sim.reaching_goal  # target source at node 0

    # wall bump: keep turning to face off-grid, position unchanged
    sim.step(Action.TURN_LEFT)  # orientation 90 -> +z ok... node 3 exists
    sim.step(Action.TURN_LEFT)  # orientation 0 -> +x -> node 1 exists
    sim.step(Action.TURN_LEFT)  # orientation 270 -> -z: off-grid from row 0
    before = sim.receiver_node
    sim.step(Action.MOVE_FORWARD)
    assert sim.receiver_node == before

    # PAUSE raises in train mode, allowed in eval mode
    with pytest.raises(ValueError):
        sim.step(Action.PAUSE)
    sim_eval = AAViSSSim(
        bundle.scene, bundle.audio_db, bundle.frame_cache, eval_mode=True
    )
    sim_eval.reset(ep)
    sim_eval.step(Action.PAUSE)  # no raise


def test_observations_and_render_keys(bundle):
    sim = AAViSSSim(bundle.scene, bundle.audio_db, bundle.frame_cache,
                    gt_mono_mag_norm=1.2)
    obs = sim.reset(bundle.episodes.episodes[0])
    assert obs["rgb"].shape == (128, 128, 3)
    assert obs["depth"].shape == (128, 128, 1)
    assert obs["target_class"].shape == (1,)
    assert obs["sound_ids"].shape == (2,)
    assert obs["rirs"].shape == (2, 400, 2)


def test_host_render_matches_device_frontend(bundle):
    """The per-env host numpy chain and the batched device frontend must agree
    (same math, SURVEY.md §7 'numerical parity of the audio chain')."""
    import jax.numpy as jnp

    from move2hear_tpu.ops import render_binaural_mixture

    sim = AAViSSSim(bundle.scene, bundle.audio_db, bundle.frame_cache,
                    gt_mono_mag_norm=1.2)
    sim.reset(bundle.episodes.episodes[0])
    host = sim.render_audio_host()

    keys = sim.audio_render_keys()
    bank = bundle.audio_db.mono_bank()
    mono = bank[keys["sound_ids"]][None]  # (1, S, L)
    rirs = keys["rirs"][None]
    dev = render_binaural_mixture(mono, rirs, gt_mono_mag_norm=1.2)
    np.testing.assert_allclose(
        np.asarray(dev.mixed_bin_audio_mag)[0], host["mixed_bin_audio_mag"],
        atol=3e-3,
    )
    np.testing.assert_allclose(
        np.asarray(dev.gt_mono_comps)[0, ..., 0::2],
        host["gt_mono_comps"][..., 0::2], atol=5e-3,
    )


def test_env_episode_cycle_and_reward(bundle):
    env_fn = bundle.make_env_fn(
        max_episode_steps=3, with_distance_reward=True, seed=1,
        possible_actions=("PAUSE", "MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT"),
    )
    env = env_fn()
    obs = env.reset()
    ep = env.current_episode
    d0 = env.sim.geo_dist_to_target()
    total_done = 0
    for i in range(7):
        obs, reward, done, info = env.step(Action.TURN_LEFT)
        assert "geo_distance_to_target_audio_source" in info
        # turning never changes distance -> delta reward 0
        if not done:
            assert reward == pytest.approx(0.0)
        total_done += int(done)
    assert total_done == 2  # episodes of length 3

    # nav reward positive when moving closer
    env2 = bundle.make_env_fn(
        max_episode_steps=10, with_distance_reward=True, seed=2,
        shuffle_episodes=False,
        possible_actions=("PAUSE", "MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT"),
    )()
    env2.reset()
    far_eps = [
        e for e in bundle.episodes.episodes
        if e.geodesic_distance >= 1
    ]
    if far_eps:
        env2.sim.reset(far_eps[0])
        env2._prev_target_distance = far_eps[0].geodesic_distance
        # walk toward the target greedily: try all 4 headings
        start_d = env2.sim.geo_dist_to_target()
        rewards = []
        for a in [Action.MOVE_FORWARD, Action.TURN_LEFT, Action.MOVE_FORWARD,
                  Action.TURN_LEFT, Action.MOVE_FORWARD]:
            _, r, _, _ = env2.step(a)
            rewards.append(r)
        assert any(abs(r) > 0 for r in rewards) or start_d == 0


def test_sync_and_process_vector_env_agree(bundle):
    fns = [
        bundle.make_env_fn(max_episode_steps=4, seed=s, shuffle_episodes=False)
        for s in range(2)
    ]
    sync = SyncVectorEnv(fns)
    proc = ProcessVectorEnv(fns, context="fork")
    try:
        obs_s = sync.reset()
        obs_p = proc.reset()
        for o_s, o_p in zip(obs_s, obs_p):
            np.testing.assert_allclose(o_s["rirs"], o_p["rirs"])
        out_s = sync.step([1, 2])
        out_p = proc.step([1, 2])
        for (os_, rs, ds, _), (op_, rp, dp, _) in zip(out_s, out_p):
            assert rs == rp and ds == dp
            np.testing.assert_allclose(os_["rirs"], op_["rirs"])
        assert sync.count_episodes() == proc.count_episodes()
    finally:
        proc.close()


def test_pause_at_resume(bundle):
    fns = [
        bundle.make_env_fn(max_episode_steps=4, seed=s) for s in range(3)
    ]
    venv = SyncVectorEnv(fns)
    venv.reset()
    assert venv.num_envs == 3
    venv.pause_at(1)
    assert venv.num_envs == 2
    out = venv.step([1, 1])
    assert len(out) == 2
    venv.resume_all()
    assert venv.num_envs == 3


def test_generate_episodes_far_target():
    scene = GraphScene.grid("far", 4, 4)
    ds = generate_episodes(
        scene, ["a", "b", "c", "esc"], 8, near_target=False, esc_sounds=("esc",)
    )
    for e in ds.episodes:
        assert scene.shortest_path_steps(e.start_node, e.source_nodes[0]) >= 2
        assert e.sound_names[0] != "esc"

    near = generate_episodes(scene, ["a", "b"], 4, near_target=True)
    for e in near.episodes:
        assert e.start_node == e.source_nodes[0]
        assert e.geodesic_distance == 0.0


def test_action_index_mapping(bundle):
    """Policy action index i names POSSIBLE_ACTIONS[i]; default 3-action space
    has no PAUSE (configs/tasks/*/*.yaml:30)."""
    env = bundle.make_env_fn(max_episode_steps=5, seed=0)()
    env.reset()
    assert env.num_actions == 3
    node0 = env.sim.receiver_node
    rot0 = env.sim._rotation
    env.step(1)  # TURN_LEFT under the default mapping
    assert env.sim._rotation == (rot0 + 90) % 360
    env.step(2)  # TURN_RIGHT
    assert env.sim._rotation == rot0
    env.step(0)  # MOVE_FORWARD
    assert env.sim.receiver_node in (node0, *bundle.scene.neighbors[node0])


def test_vecenv_config_knobs_honored(bundle, tmp_path):
    """USE_VECENV / USE_SYNC_VECENV must select the launcher
    (env_utils.py:608-616); regression for the round-1 hardcoded sync."""
    from move2hear_tpu.config import get_config
    from move2hear_tpu.rl.trainer import PPOTrainer

    def envs_for(opts):
        cfg = get_config(
            model_dir=str(tmp_path),
            opts=["NUM_PROCESSES", "2"] + opts,
        )
        trainer = PPOTrainer(cfg, bundle=bundle)
        envs, _ = trainer._make_envs(0, 1)
        try:
            return type(envs)
        finally:
            envs.close()

    assert envs_for(["USE_SYNC_VECENV", "True"]) is SyncVectorEnv
    assert envs_for(["USE_VECENV", "False"]) is SyncVectorEnv
    assert (
        envs_for(["USE_VECENV", "True", "USE_SYNC_VECENV", "False"])
        is ProcessVectorEnv
    )
