from move2hear_tpu.env.scene import GraphScene
from move2hear_tpu.env.audio_db import AudioDB, SyntheticAudioDB, FileAudioDB
from move2hear_tpu.env.frame_cache import FrameCache, SyntheticFrameCache, FileFrameCache
from move2hear_tpu.env.episodes import Episode, EpisodeDataset, generate_episodes
from move2hear_tpu.env.sim import AAViSSSim, Action
from move2hear_tpu.env.environment import AAViSSEnv
from move2hear_tpu.env.vector_env import SyncVectorEnv, ProcessVectorEnv, construct_envs
from move2hear_tpu.env.micro_scene import build_micro_scene, MicroSceneBundle

__all__ = [
    "GraphScene",
    "AudioDB",
    "SyntheticAudioDB",
    "FileAudioDB",
    "FrameCache",
    "SyntheticFrameCache",
    "FileFrameCache",
    "Episode",
    "EpisodeDataset",
    "generate_episodes",
    "AAViSSSim",
    "Action",
    "AAViSSEnv",
    "SyncVectorEnv",
    "ProcessVectorEnv",
    "construct_envs",
    "build_micro_scene",
    "MicroSceneBundle",
]
