"""Pre-rendered RGB/depth observation store — the USE_RENDERED_OBSERVATIONS
path that replaces the habitat-sim C++ renderer at train time
(``simulator_train.py:22-50,89-95,216-227``): per-scene maps
(node, rotation_angle) -> {rgb (H, W, 3) uint8, depth (H, W, 1) float}."""

import os
import pickle
import zlib
from typing import Dict, Protocol, Tuple

import numpy as np


class FrameCache(Protocol):
    def get(self, scene: str, node: int, rotation: int) -> Dict[str, np.ndarray]: ...


class SyntheticFrameCache:
    """Deterministic procedural frames: a view hash of (scene, node, rotation)
    seeds smooth gradients so different poses are visually distinct. Fixture
    replacement for Matterport scene_observations pickles."""

    def __init__(self, height: int = 128, width: int = 128):
        self._h, self._w = height, width
        self._cache: Dict[Tuple, Dict[str, np.ndarray]] = {}

    def get(self, scene, node, rotation):
        key = (scene, int(node), int(rotation) % 360)
        if key not in self._cache:
            # stable across processes (hash() is PYTHONHASHSEED-randomized)
            seed = zlib.crc32(repr(key).encode()) & 0xFFFFFFFF
            rng = np.random.default_rng(seed)
            yy, xx = np.mgrid[0 : self._h, 0 : self._w].astype(np.float32)
            base = (
                np.sin(xx / self._w * rng.uniform(2, 9) + rng.uniform(0, 6))
                + np.cos(yy / self._h * rng.uniform(2, 9) + rng.uniform(0, 6))
            ) * 0.25 + 0.5
            rgb = np.stack(
                [base * rng.uniform(0.3, 1.0) for _ in range(3)], axis=-1
            )
            rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            depth = np.clip(base, 0, 1)[..., None].astype(np.float32)
            self._cache[key] = {"rgb": rgb, "depth": depth}
        return self._cache[key]


class FileFrameCache:
    """Per-scene pickle files ``{root}/{scene_dataset}/{scene}.pkl`` holding
    {(node, rotation): {'rgb': ..., 'depth': ...}} (simulator_train.py:89-95).
    Scenes are memory-mapped lazily and kept resident."""

    def __init__(self, root: str, scene_dataset: str = "mp3d"):
        self._root = root
        self._scene_dataset = scene_dataset
        self._scenes: Dict[str, Dict] = {}

    def _load(self, scene: str):
        if scene not in self._scenes:
            path = os.path.join(self._root, self._scene_dataset, scene + ".pkl")
            with open(path, "rb") as f:
                self._scenes[scene] = pickle.load(f)
        return self._scenes[scene]

    def get(self, scene, node, rotation):
        frames = self._load(scene)
        obs = frames[(int(node), int(rotation) % 360)]
        out = {}
        if "rgb" in obs:
            out["rgb"] = np.asarray(obs["rgb"])[..., :3]
        if "depth" in obs:
            d = np.asarray(obs["depth"])
            out["depth"] = d if d.ndim == 3 else d[..., None]
        return out
