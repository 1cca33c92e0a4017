"""RL environment wrapper (``common/environments.py:17-105`` + the task
measures of ``habitat_audio/task.py:210-277``): episode iteration, the
geodesic-distance-delta nav reward (far-target), episode-over done flag, and
the distance measures in info. Separation rewards are computed in the trainer
(override_rewards), not here — matching the reference."""

from typing import Dict, Iterator, List, Optional

import numpy as np

from move2hear_tpu.env.episodes import Episode, EpisodeDataset
from move2hear_tpu.env.sim import AAViSSSim
from move2hear_tpu.utils.registry import registry


@registry.register_env(name="AAViSSEnv")
class AAViSSEnv:
    def __init__(
        self,
        sim: AAViSSSim,
        dataset: EpisodeDataset,
        max_episode_steps: int = 20,
        with_distance_reward: bool = True,
        distance_reward_scale: float = 1.0,
        shuffle_episodes: bool = True,
        seed: int = 0,
        loop_episodes: bool = True,
        possible_actions=("MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT"),
    ):
        assert len(dataset) > 0, "empty episode dataset"
        self.sim = sim
        self.dataset = dataset
        # the policy's action index i names POSSIBLE_ACTIONS[i], which maps to
        # the simulator action code (PAUSE=0/FWD=1/LEFT=2/RIGHT=3); the
        # reference's published configs use the 3-action space without PAUSE
        # (configs/tasks/*/*.yaml:30)
        from move2hear_tpu.env.sim import Action as _A

        self._action_codes = [int(_A[name]) for name in possible_actions]
        self.max_episode_steps = max_episode_steps
        self._with_distance_reward = with_distance_reward
        self._distance_reward_scale = distance_reward_scale
        self._loop = loop_episodes
        self._order = np.arange(len(dataset))
        self._rng = np.random.default_rng(seed)
        if shuffle_episodes:
            self._rng.shuffle(self._order)
        self._shuffle = shuffle_episodes
        self._cursor = -1
        self._step_count = 0
        self._prev_target_distance = 0.0
        self._episodes_played = 0

    # --- episode plumbing ------------------------------------------------
    @property
    def current_episode(self) -> Episode:
        return self.dataset.episodes[self._order[self._cursor]]

    @property
    def episode_over(self) -> bool:
        return self._step_count >= self.max_episode_steps

    def number_of_episodes(self) -> int:
        return len(self.dataset)

    def seed(self, seed: int):
        self._rng = np.random.default_rng(seed)

    def reset(self) -> Dict[str, np.ndarray]:
        self._cursor += 1
        if self._cursor >= len(self._order):
            if not self._loop:
                raise StopIteration("episode iterator exhausted")
            self._cursor = 0
            if self._shuffle:
                self._rng.shuffle(self._order)
        self._step_count = 0
        episode = self.current_episode
        obs = self.sim.reset(episode)
        # reward baseline from the episode's precomputed geodesic
        # (environments.py:46-47)
        self._prev_target_distance = episode.geodesic_distance
        self._episodes_played += 1
        return obs

    @property
    def num_actions(self) -> int:
        return len(self._action_codes)

    def step(self, action: int):
        obs = self.sim.step(self._action_codes[int(action)])
        self._step_count += 1

        reward = 0.0
        if self._with_distance_reward:
            current = self.sim.geo_dist_to_target()
            reward += (
                self._prev_target_distance - current
            ) * self._distance_reward_scale
            self._prev_target_distance = current

        done = self.episode_over
        info = self.get_metrics()
        if done:
            # auto-reset like VectorEnv workers (env_utils.py:185-196)
            obs = self.reset()
        return obs, reward, done, info

    def get_metrics(self) -> Dict[str, float]:
        geo = self.sim.geo_dist_to_target()
        start = self.current_episode.geodesic_distance
        # normalized measure: ratio to start distance, -1 when start == 0
        # (task.py:244-277)
        ndg = geo / start if start > 0 else -1.0
        return {
            "geo_distance_to_target_audio_source": geo,
            "normalized_geo_distance_to_target_audio_source": ndg,
            "euclid_distance_to_target_audio_source": self.sim.euclid_dist_to_target(),
        }
