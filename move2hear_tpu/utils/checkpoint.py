"""Checkpointing.

Improves on the reference (which saves model params + config only, no
optimizer state or update counter — resume-mid-training unsupported,
ppo_trainer.py:223-238 / SURVEY.md §5): here a checkpoint is the FULL train
state (params, batch stats, both optimizer states, update counter, config
dict), serialized with flax msgpack and written atomically (tmp file +
rename) so the checkpoint-polling evaluator never sees a partial file.

File naming keeps the reference's ``ckpt.{N}.pth`` convention so the polling
workflow and best-ckpt tooling are drop-in."""

import os
import pickle
import tempfile
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np


def tree_shapes_match(a, b) -> bool:
    """True iff the two pytrees have identical structure and leaf shapes —
    the auto-resume compatibility gate (a stale interrupted state from a
    different model config must not be adopted)."""
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    if ta != tb or len(la) != len(lb):
        return False
    return all(
        np.shape(x) == np.shape(y) for x, y in zip(la, lb)
    )


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Dict[str, Any]):
    """state: dict of pytrees / plain python data. Atomic write."""
    payload = {}
    for k, v in state.items():
        if k in ("config", "extra_state"):
            payload[k] = pickle.dumps(v)
        else:
            payload[k] = flax.serialization.to_bytes(_to_host(v))
    blob = pickle.dumps(payload)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, targets: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """targets: optional dict of template pytrees for typed restoration;
    entries without a template are returned as raw nested dicts."""
    with open(path, "rb") as f:
        payload = pickle.loads(f.read())
    out = {}
    for k, v in payload.items():
        if k in ("config", "extra_state"):
            out[k] = pickle.loads(v)
        elif targets and k in targets and targets[k] is not None:
            out[k] = flax.serialization.from_bytes(targets[k], v)
        else:
            out[k] = flax.serialization.msgpack_restore(v)
    return out


def load_checkpoint_if_compatible(
    path: str, targets: Dict[str, Any], shape_key: str = "params"
) -> Optional[Dict[str, Any]]:
    """Auto-resume loader: returns None instead of raising when the snapshot
    does not fit this config.

    flax.serialization.from_bytes raises ValueError on tree STRUCTURE
    mismatch (e.g. a stale snapshot from a config with a different
    use_ddppo/BatchNorm or sensor set has different param keys) *before* any
    shape gate can run — so the structural check has to happen on the
    untyped msgpack restore first, then shapes, and only then the typed
    restore. An explicit RESUME_CKPT should NOT go through this: a
    user-requested resume that does not fit must fail loudly."""
    try:
        raw = load_checkpoint(path)  # untyped: never structure-checks
    except Exception:
        return None  # truncated/corrupt snapshot: skip, train fresh
    for k, template in targets.items():
        if template is None or k not in raw:
            continue
        if not tree_shapes_match(
            flax.serialization.to_state_dict(template), raw[k]
        ):
            return None
    try:
        return load_checkpoint(path, targets=targets)
    except (ValueError, KeyError, TypeError):
        return None
