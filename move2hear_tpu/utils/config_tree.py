"""A minimal yacs-style config tree: nested attribute access, YAML merge,
dotted-key CLI override list, freeze/clone — the reference's config plumbing
(``audio_separation/config/default.py``) without the yacs dependency."""

from __future__ import annotations

import copy
from typing import Any, Iterable

import yaml


class Config(dict):
    """dict with attribute access, recursive merge and freeze semantics."""

    __frozen_key = "__frozen__"

    def __init__(self, init: dict | None = None):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        if init:
            for k, v in init.items():
                self[k] = Config(v) if isinstance(v, dict) else v

    # --- attribute protocol ---------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any):
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"Config is frozen; cannot set {name}")
        self[name] = Config(value) if isinstance(value, dict) else value

    def __setitem__(self, key, value):
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"Config is frozen; cannot set {key}")
        super().__setitem__(key, value)

    # --- yacs-like API ---------------------------------------------------
    def clone(self) -> "Config":
        c = Config()
        for k, v in self.items():
            c[k] = v.clone() if isinstance(v, Config) else copy.deepcopy(v)
        return c

    def freeze(self):
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, Config):
                v.freeze()
        return self

    def defrost(self):
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, Config):
                v.defrost()
        return self

    def merge_from_other(self, other: dict):
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), Config):
                self[k].merge_from_other(v)
            else:
                self[k] = Config(v) if isinstance(v, dict) else v
        return self

    def merge_from_file(self, path: str):
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return self.merge_from_other(data)

    def merge_from_list(self, opts: Iterable[Any]):
        """['RL.PPO.lr_pol', 1e-4, 'SEED', 3] dotted override pairs."""
        opts = list(opts)
        assert len(opts) % 2 == 0, f"odd number of override elements: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = str(key).split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if isinstance(value, str):
                value = _coerce(value, node.get(leaf))
            node[leaf] = value
        return self

    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, Config) else copy.deepcopy(v))
            for k, v in self.items()
        }

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def _coerce(value: str, old: Any):
    """Best-effort string->python coercion for CLI overrides."""
    try:
        parsed = yaml.safe_load(value)
    except yaml.YAMLError:
        parsed = value
    if old is not None and isinstance(old, bool) and not isinstance(parsed, bool):
        return bool(parsed)
    if old is not None and isinstance(old, float) and isinstance(parsed, int):
        return float(parsed)
    return parsed
