"""Synthetic micro-scene fixture: a small grid scene + procedural audio DB +
frame cache + generated episodes — the test/demo substitute for
Matterport3D + SoundSpaces data (SURVEY.md §4: the reference achieved this
with DummySimulator + zero-RIR fallbacks; here it is a first-class fixture).
"""

from dataclasses import dataclass
from typing import Callable, Dict, List, Union

from move2hear_tpu.env.audio_db import SyntheticAudioDB
from move2hear_tpu.env.environment import AAViSSEnv
from move2hear_tpu.env.episodes import EpisodeDataset, generate_episodes
from move2hear_tpu.env.frame_cache import SyntheticFrameCache
from move2hear_tpu.env.scene import GraphScene
from move2hear_tpu.env.sim import AAViSSSim

DEFAULT_SOUNDS = [f"class{i}" for i in range(10)] + ["music", "esc"]


@dataclass
class MicroSceneBundle:
    """A scene bundle: scene graph(s) + audio DB + frame cache + episodes.

    Despite the historical name this is the generic bundle type — file-backed
    Matterport/SoundSpaces data loads into the same shape
    (env/bundle.py:bundle_from_config), with ``scene`` holding a
    {name: GraphScene} dict when the episode set spans several scenes."""

    scene: Union[GraphScene, Dict[str, GraphScene]]
    audio_db: SyntheticAudioDB
    frame_cache: SyntheticFrameCache
    episodes: EpisodeDataset

    @property
    def scenes(self) -> Dict[str, GraphScene]:
        if isinstance(self.scene, GraphScene):
            return {self.scene.name: self.scene}
        return self.scene

    @property
    def single_scene(self) -> GraphScene:
        scenes = self.scenes
        assert len(scenes) == 1, (
            f"bundle holds {len(scenes)} scenes; this code path is "
            "single-scene"
        )
        return next(iter(scenes.values()))

    def for_scenes(self, names) -> "MicroSceneBundle":
        """Sub-bundle restricted to the given scene names (shared audio DB
        and frame cache; filtered episodes)."""
        scenes = {n: self.scenes[n] for n in names}
        return MicroSceneBundle(
            scene=scenes,
            audio_db=self.audio_db,
            frame_cache=self.frame_cache,
            episodes=self.episodes.filter_by_scenes(list(names)),
        )

    def make_env_fn(
        self,
        max_episode_steps: int = 20,
        with_distance_reward: bool = False,
        distance_reward_scale: float = 1.0,
        eval_mode: bool = False,
        gt_mono_mag_norm: float = 1.2,
        seed: int = 0,
        shuffle_episodes: bool = True,
        episodes: EpisodeDataset = None,
        possible_actions=("MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT"),
    ) -> Callable[[], AAViSSEnv]:
        bundle = self

        def _make():
            sim = AAViSSSim(
                bundle.scene,
                bundle.audio_db,
                bundle.frame_cache,
                eval_mode=eval_mode,
                gt_mono_mag_norm=gt_mono_mag_norm,
            )
            return AAViSSEnv(
                sim,
                episodes if episodes is not None else bundle.episodes,
                max_episode_steps=max_episode_steps,
                with_distance_reward=with_distance_reward,
                distance_reward_scale=distance_reward_scale,
                seed=seed,
                shuffle_episodes=shuffle_episodes,
                possible_actions=possible_actions,
            )

        return _make


def build_micro_scene(
    rows: int = 4,
    cols: int = 4,
    num_episodes: int = 16,
    near_target: bool = True,
    rir_length: int = 1000,
    wav_length: int = 16000,
    image_size: int = 128,
    seed: int = 0,
    name: str = "micro",
    unheard_sounds: bool = False,
) -> MicroSceneBundle:
    """unheard_sounds: use a disjoint procedural sound pool (same classes,
    different waveforms) — the synthetic analog of the reference's
    unheard-sound eval splits (README.md:59-89, val/test *Unheard presets)."""
    scene = GraphScene.grid(name, rows, cols)
    audio_db = SyntheticAudioDB(
        DEFAULT_SOUNDS,
        wav_length=wav_length,
        rir_length=rir_length,
        seed=seed + (10_000 if unheard_sounds else 0),
    )
    frame_cache = SyntheticFrameCache(image_size, image_size)
    episodes = generate_episodes(
        scene,
        DEFAULT_SOUNDS,
        num_episodes,
        near_target=near_target,
        seed=seed,
        esc_sounds=("esc",),
    )
    return MicroSceneBundle(scene, audio_db, frame_cache, episodes)


def build_scale_fixture(
    num_scenes: int = 8,
    rows: int = 15,
    cols: int = 20,
    episodes_per_scene: int = 12,
    rir_length: int = 16000,
    wav_length: int = 16000,
    with_frames: bool = True,
    near_target: bool = True,
    seed: int = 0,
) -> MicroSceneBundle:
    """Real-scene-scale synthetic fixture: ``num_scenes`` grid scenes of
    V = rows*cols nodes each (Matterport graphs are V ~ 100-1000 per the
    SoundSpaces metadata the reference loads, simulator_train.py:82-86) with
    full-length 16 kHz RIRs. The dense device RIR bank for this fixture is
    V^2-terabyte-scale, so it exercises the episode-keyed sub-bank path
    (env/sub_bank.py) and the host fallback at honest sizes."""
    scenes = {}
    episodes = []
    for i in range(num_scenes):
        name = f"scale{i:02d}"
        scenes[name] = GraphScene.grid(name, rows, cols)
        episodes += generate_episodes(
            scenes[name],
            DEFAULT_SOUNDS,
            episodes_per_scene,
            near_target=near_target,
            seed=seed + 101 * i,
            esc_sounds=("esc",),
        ).episodes
    audio_db = SyntheticAudioDB(
        DEFAULT_SOUNDS, wav_length=wav_length, rir_length=rir_length,
        seed=seed,
    )
    frame_cache = SyntheticFrameCache() if with_frames else None
    from move2hear_tpu.env.episodes import EpisodeDataset

    return MicroSceneBundle(
        scene=scenes,
        audio_db=audio_db,
        frame_cache=frame_cache,
        episodes=EpisodeDataset(episodes),
    )
