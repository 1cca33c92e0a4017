"""Episode-keyed RIR sub-banks (env/sub_bank.py): the V-linear device path
for real scene scale (VERDICT r3 missing #2).

Parity contract: with a float32 slab, sub-bank mode is BIT-IDENTICAL to the
dense V^2 bank — rows are assembled from the same AudioDB values the dense
builder reads (reference per-step read: habitat_audio/simulator_train.py:
396-415), only the gather indexing changes."""

import jax.numpy as jnp
import numpy as np
import pytest

from move2hear_tpu.env.audio_db import SyntheticAudioDB
from move2hear_tpu.env.device_env import (
    build_device_bundle,
    env_reset_all,
    env_step,
    gather_sensors,
    make_order_table,
    observe,
)
from move2hear_tpu.env.episodes import EpisodeDataset, generate_episodes
from move2hear_tpu.env.micro_scene import (
    DEFAULT_SOUNDS,
    MicroSceneBundle,
    build_micro_scene,
)
from move2hear_tpu.env.scene import GraphScene
from move2hear_tpu.env.sub_bank import (
    EpisodeOccupancy,
    RirSubBank,
    estimate_sub_bank_bytes,
)


@pytest.fixture(scope="module")
def two_scene_bundle():
    scene_a = GraphScene.grid("sceneA", 3, 3)
    scene_b = GraphScene.grid("sceneB", 2, 4)
    audio_db = SyntheticAudioDB(DEFAULT_SOUNDS, rir_length=300)
    eps = (
        generate_episodes(scene_a, DEFAULT_SOUNDS, 6, seed=1,
                          esc_sounds=("esc",)).episodes
        + generate_episodes(scene_b, DEFAULT_SOUNDS, 6, seed=2,
                            esc_sounds=("esc",)).episodes
    )
    return MicroSceneBundle(
        scene={"sceneA": scene_a, "sceneB": scene_b},
        audio_db=audio_db,
        frame_cache=None,
        episodes=EpisodeDataset(eps),
    )


def _make_sub_bank(bundle, dev, order, horizon, t_steps, **kw):
    return RirSubBank(
        bundle.scenes,
        bundle.audio_db,
        np.asarray(dev.episodes.scene_idx),
        np.asarray(dev.episodes.sources),
        order,
        horizon,
        t_steps,
        v_pad=int(dev.scene.positions.shape[1]),
        **kw,
    )


def test_occupancy_tracker_matches_device_env(two_scene_bundle):
    """The host tracker must predict exactly the episodes the device env
    occupies over each window — progression is deterministic (auto-reset at
    the horizon; actions never change episode identity)."""
    bundle = two_scene_bundle
    dev = build_device_bundle(bundle, with_frames=False)
    n_envs, horizon, t_steps = 3, 4, 6
    order = make_order_table(n_envs, len(bundle.episodes), seed=3)
    occ = EpisodeOccupancy(order, horizon)
    state = env_reset_all(dev.scene, dev.episodes, jnp.asarray(order))
    rng = np.random.default_rng(0)
    for window in range(5):
        predicted = set(occ.episodes_for_window(t_steps).tolist())
        seen = set(np.asarray(state.ep).tolist())
        for _ in range(t_steps):
            actions = jnp.asarray(rng.integers(1, 4, n_envs), jnp.int32)
            state, _ = env_step(dev.scene, dev.episodes, state, actions, horizon)
            seen |= set(np.asarray(state.ep).tolist())
        # post-window state is the bootstrap observation -> included
        assert seen == predicted, f"window {window}: {seen} != {predicted}"
        occ.advance(t_steps)
        np.testing.assert_array_equal(
            np.asarray(state.ep),
            order[np.arange(n_envs), np.asarray(occ.cursor) % order.shape[1]],
        )


def test_sub_bank_gather_bit_identical_to_dense(two_scene_bundle):
    """f32 slab: the per-step RIR gather must match the dense bank exactly,
    across scene switches and LRU refreshes."""
    bundle = two_scene_bundle
    dev_dense = build_device_bundle(bundle, with_frames=False)
    dev_sub = build_device_bundle(
        bundle, with_frames=False, rir_mode="sub"
    )
    assert dev_sub.rir_bank is None
    n_envs, horizon, t_steps = 2, 3, 4
    order = make_order_table(n_envs, len(bundle.episodes), seed=5)
    # dry-run the occupancy to find the max keys any one window needs, and
    # pin capacity EXACTLY there: every later window must evict + re-upload
    probe = _make_sub_bank(bundle, dev_sub, order, horizon, t_steps)
    max_needed = 0
    for _ in range(4):
        eps = probe._occ.episodes_for_window(t_steps)
        max_needed = max(max_needed, len(probe._keys_for(eps)))
        probe._occ.advance(t_steps)
    sub = _make_sub_bank(
        bundle, dev_sub, order, horizon, t_steps, capacity=max_needed
    )
    state = env_reset_all(dev_dense.scene, dev_dense.episodes, jnp.asarray(order))
    rng = np.random.default_rng(1)
    for window in range(4):
        slab, table = sub.rollout_inputs()
        dev_w = dev_sub._replace(rir_sub_bank=slab, ep_src_row=table)
        for _ in range(t_steps):
            obs = observe(dev_dense.episodes, state)
            got = gather_sensors(dev_w, obs)["rirs"]
            want = gather_sensors(dev_dense, obs)["rirs"]
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
            actions = jnp.asarray(rng.integers(1, 4, n_envs), jnp.int32)
            state, _ = env_step(
                dev_dense.scene, dev_dense.episodes, state, actions, horizon
            )
        sub.advance(t_steps)
    # the pinned capacity means later windows must evict and re-upload
    assert sub.rows_uploaded > sub.capacity


def test_sub_bank_bf16_close_to_dense(two_scene_bundle):
    bundle = two_scene_bundle
    dev_sub = build_device_bundle(bundle, with_frames=False, rir_mode="sub")
    dev_dense = build_device_bundle(bundle, with_frames=False)
    order = make_order_table(2, len(bundle.episodes), seed=5)
    sub = _make_sub_bank(
        bundle, dev_sub, order, 3, 4, dtype=jnp.bfloat16
    )
    slab, table = sub.rollout_inputs()
    dev_w = dev_sub._replace(rir_sub_bank=slab, ep_src_row=table)
    state = env_reset_all(dev_dense.scene, dev_dense.episodes, jnp.asarray(order))
    obs = observe(dev_dense.episodes, state)
    got = np.asarray(gather_sensors(dev_w, obs)["rirs"])
    want = np.asarray(gather_sensors(dev_dense, obs)["rirs"])
    assert got.dtype == np.float32  # render math stays f32
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-4)


def _tiny_cfg(model_dir, extra=()):
    from move2hear_tpu.config import get_config

    return get_config(
        model_dir=model_dir,
        opts=[
            "NUM_PROCESSES", "2",
            "NUM_UPDATES", "4",
            "CHECKPOINT_INTERVAL", "100",
            "LOG_INTERVAL", "100",
            "RL.PPO.hidden_size", "64",
            "RL.PPO.num_steps", "3",
            "RL.PPO.num_updates_per_cycle", "2",
            "RL.PPO.ppo_epoch", "1",
            "RL.PPO.num_mini_batch", "1",
            "RL.PPO.use_ddppo", "True",
            "RL.PPO.sep_reward_weight", "1.0",
            "RL.PPO.nav_reward_weight", "0.0",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "4",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ] + list(extra),
    )


def test_trainer_sub_mode_matches_dense(tmp_path):
    """Full device-loop training in sub-bank mode lands on bit-identical
    final parameters to the dense mode (same seeds, f32 slab)."""
    import jax

    from move2hear_tpu.rl.trainer import PPOTrainer

    bundle = build_micro_scene(
        rows=3, cols=3, num_episodes=8, near_target=True, rir_length=300
    )
    params = {}
    for mode in ("dense", "sub"):
        cfg = _tiny_cfg(str(tmp_path / mode))
        trainer = PPOTrainer(cfg, bundle=bundle)
        trainer._train_device(rir_mode=mode)
        assert trainer._rir_mode == mode
        params[mode] = jax.device_get(trainer._final_state.params)
    flat_d = jax.tree_util.tree_leaves(params["dense"])
    flat_s = jax.tree_util.tree_leaves(params["sub"])
    for d, s in zip(flat_d, flat_s):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(s))


def test_gate_selects_sub_mode_at_scale(tmp_path):
    """A many-scene large-V fixture whose dense bank exceeds the budget (but
    whose V-linear sub-bank fits) must train on the DEVICE path in sub mode —
    the real-scene-scale capability the dense gate used to silently demote to
    the host path (VERDICT r3 missing #2)."""
    from move2hear_tpu.rl.trainer import PPOTrainer

    scenes = {}
    eps = []
    for i in range(8):
        name = f"scene{i}"
        scenes[name] = GraphScene.grid(name, 15, 20)  # V = 300
        eps += generate_episodes(
            scenes[name], DEFAULT_SOUNDS, 3, seed=10 + i,
            esc_sounds=("esc",), near_target=True,
        ).episodes
    audio_db = SyntheticAudioDB(DEFAULT_SOUNDS, rir_length=256)
    bundle = MicroSceneBundle(
        scene=scenes, audio_db=audio_db, frame_cache=None,
        episodes=EpisodeDataset(eps),
    )
    # dense: 8 scenes x 4 az x 300^2 x 256 x 2 ears x 4 B ~ 5.9 GiB
    budget = 500 * 1024 * 1024
    sub_est = estimate_sub_bank_bytes(bundle, 2, 2, 3, 4)
    assert sub_est <= budget
    cfg = _tiny_cfg(
        str(tmp_path / "scale"),
        extra=[
            "TPU.MAX_DEVICE_BANK_BYTES", str(budget),
            # the fixture carries no frame cache; exclude both visual
            # modalities from the policy (reference EXTRA_* semantics)
            "EXTRA_RGB", "True",
            "EXTRA_DEPTH", "True",
        ],
    )
    trainer = PPOTrainer(cfg, bundle=bundle)
    trainer.train()
    assert trainer._rir_mode == "sub"
    assert trainer.steady_fps >= 0.0
    assert trainer._final_state is not None


def test_belady_eviction_beats_lru_on_cyclic_orders(two_scene_bundle):
    """The device env's episode progression is deterministic, so eviction is
    Belady-optimal (evict the key needed furthest in the future). On the
    cyclic per-env orders the order table produces, LRU degrades toward a
    100% conflict-miss rate (it always evicts the key needed soonest);
    Belady must re-upload strictly less once capacity is binding."""
    bundle = two_scene_bundle
    dev = build_device_bundle(bundle, with_frames=False, rir_mode="sub")
    n_envs, horizon, t_steps = 2, 3, 3
    order = make_order_table(n_envs, len(bundle.episodes), seed=7)

    def run(capacity, windows=24):
        sub = _make_sub_bank(
            bundle, dev, order, horizon, t_steps, capacity=capacity
        )
        for _ in range(windows):
            sub.rollout_inputs()
            sub.advance(t_steps)
        return sub

    # capacity = exactly one window's worst case: eviction choice matters
    probe = _make_sub_bank(bundle, dev, order, horizon, t_steps)
    need = 0
    occ_probe = EpisodeOccupancy(order, horizon)
    for _ in range(24):
        need = max(
            need, len(probe._keys_for(occ_probe.episodes_for_window(t_steps)))
        )
        occ_probe.advance(t_steps)
    sub = run(need)
    # LRU baseline: replay the same access sequence against an LRU set
    occ = EpisodeOccupancy(order, horizon)
    resident, tick, lru_uploads = {}, 0, 0
    for _ in range(24):
        tick += 1
        keys = probe._keys_for(occ.episodes_for_window(t_steps))
        missing = [k for k in keys if k not in resident]
        for k in keys:
            if k in resident:
                resident[k] = tick
        for k in missing:
            if len(resident) >= need:
                needed = set(keys)
                victim = min(
                    (kk for kk in resident if kk not in needed),
                    key=resident.get,
                )
                del resident[victim]
            resident[k] = tick
            lru_uploads += 1
        occ.advance(t_steps)
    assert sub.rows_uploaded <= lru_uploads
    # with full-capacity residency there are no conflict misses at all
    n_keys = len(
        {
            (int(sub._ep_scene_idx[e]), int(s))
            for e in range(len(sub._ep_scene_idx))
            for s in sub._ep_sources[e]
            if s >= 0
        }
    )
    full = run(n_keys)
    assert full.rows_uploaded == n_keys


def test_prefetch_makes_rollout_inputs_upload_free(two_scene_bundle):
    """prefetch() after advance() must leave the next window fully resident:
    the rollout_inputs() on the critical path uploads nothing."""
    bundle = two_scene_bundle
    dev = build_device_bundle(bundle, with_frames=False, rir_mode="sub")
    n_envs, horizon, t_steps = 2, 3, 4
    order = make_order_table(n_envs, len(bundle.episodes), seed=9)
    sub = _make_sub_bank(bundle, dev, order, horizon, t_steps)
    sub.rollout_inputs()
    for _ in range(6):
        sub.advance(t_steps)
        sub.prefetch()
        before = sub.rows_uploaded
        slab, table = sub.rollout_inputs()
        assert sub.rows_uploaded == before, "prefetch missed rows"
    # prefetched tables still index correctly (delegates to the parity test
    # for values; here: every needed key resident and mapped)
    eps = sub._occ.episodes_for_window(t_steps)
    for k in sub._keys_for(eps):
        assert k in sub._key_to_slot


def test_max_capacity_for_budget():
    from move2hear_tpu.env.sub_bank import max_capacity_for_budget

    # fills spare budget ...
    assert max_capacity_for_budget(100 * 10, 10, 4, None) == 100
    # ... but never below the per-window requirement ...
    assert max_capacity_for_budget(0, 10, 4, None) == 4
    # ... and never beyond the dataset's unique key count
    assert max_capacity_for_budget(100 * 10, 10, 4, 17) == 17
    assert max_capacity_for_budget(100 * 10, 10, 25, 17) == 25
