"""Episode-keyed RIR sub-banks: the V-linear device-env path for real scenes.

The dense device RIR bank is ``(S, 4, V, V, R, 2)`` — V^2 per scene — which
at real Matterport sizes (V ~ 300-1000 nodes, R = 16000) is terabytes, so the
TPU.MAX_DEVICE_BANK_BYTES gate demotes every real-data run to the host path.
But sources are FIXED per episode (the reference merges them into the sim
config at episode start, habitat_audio/task.py:20-53, and reads one RIR wav
per source per step, simulator_train.py:396-415): during a rollout the scan
only ever gathers RIRs for (any receiver node, the <= NUM_SOUNDS_IN_MIX
active sources). A per-source "row" — all receivers x 4 azimuths for one
(scene, source-node) — is V-LINEAR: ``(4, V, R, 2)``.

This module keeps a fixed-capacity device slab of such rows plus an
``(E, S_mix)`` episode->row table, refreshed once per rollout:

  - episode progression on the device env is DETERMINISTIC (auto-reset at
    the horizon, cursor walks a host-built order table; env/device_env.py
    ``env_step``), so the host can predict exactly which episodes every env
    occupies during the next T steps without reading device state;
  - rows for newly-active sources are assembled host-side from the AudioDB
    (``get_rir_block``: one column per azimuth, cache-bypassing) and
    scattered into the slab by a donated jit — the upload overlaps device
    compute because dispatch is async;
  - rows are evicted LRU among slots not needed for the coming window.

The collect scan's gather becomes ``slab[ep_src_row[ep], azimuth, node]``
(env/device_env.py ``gather_sensors``), bit-identical to the dense path when
the slab dtype is float32 (tests/test_sub_bank.py).
"""

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

AZIMUTHS = (0, 90, 180, 270)


class EpisodeOccupancy:
    """Host mirror of the device env's deterministic episode progression
    (env/device_env.py:env_step): step_count increments every step; at the
    horizon the env resets and the cursor advances one slot (mod K)."""

    def __init__(self, order: np.ndarray, horizon: int):
        self.order = np.asarray(order)
        self.horizon = int(horizon)
        n = self.order.shape[0]
        self.cursor = np.zeros(n, np.int64)
        self.step = np.zeros(n, np.int64)

    def episodes_for_window(self, t_steps: int) -> np.ndarray:
        """Unique episode ids any env occupies during the next ``t_steps``
        scan steps INCLUDING the post-rollout bootstrap observation (the
        collect's final forward observes the post-step state, which may be a
        freshly reset episode)."""
        return self.episodes_by_window(1, t_steps)[0]

    def episodes_by_window(
        self, n_windows: int, t_steps: int
    ) -> List[np.ndarray]:
        """Unique episode ids per upcoming ``t_steps`` window, for the next
        ``n_windows`` windows, WITHOUT committing the cursor. Window 0 is what
        ``episodes_for_window`` returns; later windows feed prefetch and the
        Belady eviction rank (the progression is deterministic, so the future
        is exactly known)."""
        out = []
        k = self.order.shape[1]
        cur = self.cursor.copy()
        stp = self.step.copy()
        for _ in range(n_windows):
            need = set()
            for i in range(self.order.shape[0]):
                c, s = int(cur[i]), int(stp[i])
                need.add(int(self.order[i, c % k]))
                for _ in range(t_steps):
                    s += 1
                    if s >= self.horizon:
                        s = 0
                        c += 1
                        need.add(int(self.order[i, c % k]))
                cur[i], stp[i] = c, s
            out.append(np.asarray(sorted(need), np.int64))
        return out

    def advance(self, t_steps: int) -> None:
        """Commit ``t_steps`` executed scan steps (preemptive-sync truncation
        makes this potentially < the planned window — always pass the actual
        count)."""
        k = self.order.shape[1]
        for i in range(self.order.shape[0]):
            c, s = int(self.cursor[i]), int(self.step[i])
            for _ in range(t_steps):
                s += 1
                if s >= self.horizon:
                    s = 0
                    c += 1
            self.cursor[i], self.step[i] = c, s


def sub_bank_capacity(
    n_envs: int, s_mix: int, t_steps: int, horizon: int,
    n_unique_keys: Optional[int] = None,
) -> int:
    """Slot count: the worst-case unique (scene, source) keys one rollout
    window can touch, plus 25% headroom so consecutive windows' overlapping
    rows stay warm under LRU (window w and w+1 share the episodes that did
    not reset between them; rows still resident are never re-uploaded)."""
    per_window = n_envs * s_mix * (math.ceil(t_steps / max(1, horizon)) + 1)
    cap = math.ceil(1.25 * per_window)
    if n_unique_keys is not None:
        cap = min(cap, n_unique_keys)
    # cap >= min(per_window, n_unique_keys) by construction (cap starts at
    # 1.25 * per_window and is only clamped down to n_unique_keys)
    assert cap >= min(per_window, n_unique_keys or per_window)
    return cap


def max_capacity_for_budget(
    budget_bytes: int,
    row_bytes: int,
    min_capacity: int,
    n_unique_keys: Optional[int] = None,
) -> int:
    """Largest slot count the HBM budget allows, at least ``min_capacity``
    (the per-window requirement — below it one rollout can't be resident) and
    at most the dataset's unique key count (more slots than keys is waste).
    Filling spare budget with extra slots turns conflict re-uploads into
    hits: host->device RIR traffic is the sub-path's scaling wall whenever
    the link is slow relative to episode turnover (docs/ROUND5_NOTES.md)."""
    cap = max(min_capacity, budget_bytes // max(1, row_bytes))
    if n_unique_keys is not None:
        cap = min(cap, max(min_capacity, n_unique_keys))
    return int(cap)


def fixed_bank_bytes(bundle, image_size: int = 128) -> int:
    """HBM the sub-bank mode needs BESIDES the RIR row slab: the frame bank
    (rgb uint8 + depth f32 per node x azimuth) and the source wav bank."""
    scenes = bundle.scenes
    v = max(s.num_nodes for s in scenes.values())
    frames = 0
    if getattr(bundle, "frame_cache", None) is not None:
        frames = (
            len(scenes) * v * 4 * image_size * image_size * (3 * 1 + 1 * 4)
        )
    wav = len(bundle.audio_db.sound_names()) * bundle.audio_db.wav_length * 4
    return frames + wav


def estimate_sub_bank_bytes(
    bundle, n_envs: int, s_mix: int, t_steps: int, horizon: int,
    dtype_bytes: int = 4, image_size: int = 128,
) -> int:
    """Projected MINIMUM HBM for sub-bank mode: the per-window-requirement
    row capacity (the trainer grows capacity into spare budget beyond this —
    more resident rows means fewer host->device re-uploads) + the frame/wav
    banks (cf. device_env.estimate_bank_bytes for the dense V^2 projection)."""
    scenes = bundle.scenes
    v = max(s.num_nodes for s in scenes.values())
    r = bundle.audio_db.rir_length
    n_keys = _count_unique_keys(bundle)
    cap = sub_bank_capacity(n_envs, s_mix, t_steps, horizon, n_keys)
    rows = cap * 4 * v * r * 2 * dtype_bytes
    return rows + fixed_bank_bytes(bundle, image_size)


def _count_unique_keys(bundle) -> int:
    keys = set()
    for e in bundle.episodes.episodes:
        for src in e.source_nodes:
            keys.add((e.scene_id, int(src)))
    return len(keys)


class RirSubBank:
    """Fixed-capacity device slab of per-(scene, source) RIR rows + the
    episode->row table, refreshed per rollout. ``put`` controls device
    placement (pass a replicated-sharding device_put under a mesh)."""

    def __init__(
        self,
        scenes: Dict[str, "GraphScene"],  # noqa: F821 (sorted-name order)
        audio_db,
        ep_scene_idx: np.ndarray,   # (E,) scene index per episode
        ep_sources: np.ndarray,     # (E, S_mix) source node per slot
        order: np.ndarray,          # (N, K) global per-env episode order
        horizon: int,
        t_steps: int,
        v_pad: int,
        capacity: Optional[int] = None,
        dtype=jnp.float32,
        put=None,
        host_cache_bytes: int = 16 * 1024**3,
    ):
        self._scene_list = [scenes[k] for k in sorted(scenes)]
        self._audio_db = audio_db
        self._ep_scene_idx = np.asarray(ep_scene_idx, np.int64)
        self._ep_sources = np.asarray(ep_sources, np.int64)
        self._occ = EpisodeOccupancy(order, horizon)
        self._t_steps = int(t_steps)
        self._v_pad = int(v_pad)
        self._rir_len = int(audio_db.rir_length)
        n_envs, s_mix = order.shape[0], self._ep_sources.shape[1]
        n_keys = len(
            {
                (int(self._ep_scene_idx[e]), int(s))
                for e in range(len(self._ep_scene_idx))
                for s in self._ep_sources[e]
                if s >= 0
            }
        )
        self.capacity = int(
            capacity
            if capacity is not None
            else sub_bank_capacity(n_envs, s_mix, t_steps, horizon, n_keys)
        )
        self._dtype = dtype
        self._put = put if put is not None else jnp.asarray
        self._slab = self._put(
            jnp.zeros(
                (self.capacity, 4, v_pad, self._rir_len, 2), dtype=dtype
            )
        )
        self._key_to_slot: Dict[Tuple[int, int], int] = {}
        self._slot_key: List[Optional[Tuple[int, int]]] = (
            [None] * self.capacity
        )
        self._slot_tick = np.zeros(self.capacity, np.int64)
        self._tick = 0
        self._table = np.zeros(self._ep_sources.shape, np.int32)
        self._table_dev = None
        self._table_dirty = True
        self._scatter = jax.jit(
            lambda slab, rows, slots: slab.at[slots].set(
                rows.astype(slab.dtype)
            ),
            donate_argnums=0,
        )
        # Host-side row cache (LRU by bytes): evicted device rows that come
        # back (cyclic episode order; horizon > T overlap) skip re-assembly.
        # For file-backed data this mirrors what the OS page cache gives the
        # reference's per-step wav reads; for procedural fixtures it removes
        # the (fixture-only) regeneration cost from the steady state.
        from collections import OrderedDict

        self._host_cache: "OrderedDict[Tuple[int, int], np.ndarray]" = (
            OrderedDict()
        )
        self._host_cache_budget = int(host_cache_bytes)
        self._host_cache_bytes = 0
        # perf counters (read by bench/docs)
        self.rows_uploaded = 0
        self.bytes_uploaded = 0
        self.rows_assembled = 0

    # -- host-side row assembly ------------------------------------------
    def _assemble_row(self, key: Tuple[int, int]) -> np.ndarray:
        scene_idx, src = key
        scene = self._scene_list[scene_idx]
        v = scene.num_nodes
        row = np.zeros((4, self._v_pad, self._rir_len, 2), np.float32)
        for az_i, az in enumerate(AZIMUTHS):
            row[az_i, :v] = self._audio_db.get_rir_block(
                scene.name, az, src, v
            )
        return row

    def _row_for(self, key: Tuple[int, int]) -> np.ndarray:
        """Upload-dtype row, via the host LRU cache. bf16 rows are cast
        BEFORE caching/upload: half the RAM and half the transfer bytes."""
        row = self._host_cache.get(key)
        if row is not None:
            self._host_cache.move_to_end(key)
            return row
        row = self._assemble_row(key)
        self.rows_assembled += 1
        if self._dtype == jnp.bfloat16:
            import ml_dtypes

            row = row.astype(ml_dtypes.bfloat16)
        if self._host_cache_budget > 0:
            self._host_cache[key] = row
            self._host_cache_bytes += row.nbytes
            while self._host_cache_bytes > self._host_cache_budget:
                _, old = self._host_cache.popitem(last=False)
                self._host_cache_bytes -= old.nbytes
        return row

    def _keys_for(self, ep_ids: np.ndarray) -> List[Tuple[int, int]]:
        keys = []
        seen = set()
        for e in ep_ids:
            sc = int(self._ep_scene_idx[e])
            for s in self._ep_sources[e]:
                if s >= 0 and (sc, int(s)) not in seen:
                    seen.add((sc, int(s)))
                    keys.append((sc, int(s)))
        return keys

    def _future_rank(self) -> Dict[Tuple[int, int], int]:
        """First-use window index per key over a capacity-covering lookahead.
        The device env's episode progression is deterministic, so the future
        access sequence is exactly known — eviction can be Belady-optimal
        (evict the key needed FURTHEST in the future) instead of LRU, which
        degrades to a 100% conflict-miss rate on the cyclic episode orders
        the order table produces."""
        per_window = max(
            1, self._occ.order.shape[0] * self._ep_sources.shape[1]
        )
        lookahead = min(64, 2 + self.capacity // per_window + 1)
        rank: Dict[Tuple[int, int], int] = {}
        for w, eps in enumerate(
            self._occ.episodes_by_window(lookahead, self._t_steps)
        ):
            for k in self._keys_for(eps):
                rank.setdefault(k, w)
        return rank

    def _ensure(self, keys: List[Tuple[int, int]]) -> None:
        self._tick += 1
        needed = set(keys)
        missing = [k for k in keys if k not in self._key_to_slot]
        for k in keys:
            if k in self._key_to_slot:
                self._slot_tick[self._key_to_slot[k]] = self._tick
        if not missing:
            return
        if len(needed) > self.capacity:
            raise ValueError(
                f"sub-bank capacity {self.capacity} < {len(needed)} rows "
                "needed for one rollout window; raise TPU.SUB_BANK_ROWS"
            )
        # Eviction candidates: slots not needed this window, most-evictable
        # first — empty slots, then keys with no use in the lookahead (oldest
        # tick first), then keys by DESCENDING next-use window (Belady).
        future = self._future_rank()

        def evict_rank(i):
            # ascending sort = most-evictable first: empty slots, then keys
            # with no use in the lookahead (oldest first), then keys by
            # DESCENDING next-use window (Belady: furthest future first)
            k = self._slot_key[i]
            if k is None:
                return (0, 0, 0)
            w = future.get(k)
            if w is None:
                return (1, 0, int(self._slot_tick[i]))
            return (2, -w, int(self._slot_tick[i]))

        free = sorted(
            (
                i
                for i in range(self.capacity)
                if self._slot_key[i] is None
                or self._slot_key[i] not in needed
            ),
            key=evict_rank,
        )
        # one compiled single-row scatter per upload: no power-of-two shape
        # padding (was up to ~33% wasted transfer on a slow host->device
        # link), and each row's host assembly/cast overlaps the previous
        # row's in-flight copy (dispatch is async)
        for k, slot in zip(missing, free):
            slot = int(slot)
            old = self._slot_key[slot]
            if old is not None:
                del self._key_to_slot[old]
                self._table_dirty = True
            self._slot_key[slot] = k
            self._key_to_slot[k] = slot
            self._slot_tick[slot] = self._tick
            row = self._row_for(k)
            self._slab = self._scatter(
                self._slab,
                self._put(row[None]),
                self._put(np.asarray([slot], np.int32)),
            )
            self.rows_uploaded += 1
            self.bytes_uploaded += row.nbytes
        self._table_dirty = True

    # -- per-rollout API ---------------------------------------------------
    def rollout_inputs(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(slab, ep_src_row) covering the next ``t_steps`` window. Call
        before dispatching each collect; then ``advance(actual_steps)``."""
        eps = self._occ.episodes_for_window(self._t_steps)
        self._ensure(self._keys_for(eps))
        if self._table_dirty or self._table_dev is None:
            for e in eps:
                for j, s in enumerate(self._ep_sources[e]):
                    if s >= 0:
                        self._table[e, j] = self._key_to_slot[
                            (int(self._ep_scene_idx[e]), int(s))
                        ]
            self._table_dev = self._put(self._table)
            self._table_dirty = False
        return self._slab, self._table_dev

    def prefetch(self, n_windows: int = 1) -> None:
        """Ensure rows for the next ``n_windows`` windows NOW. Called after
        the rollout's device work is dispatched: host row assembly and the
        host->device copies overlap device compute, and the slab scatters
        execute after the in-flight collect (per-device program order), so
        the window it reads is untouched. ``rollout_inputs`` then finds every
        row resident. Purely a hint — a preemptive-sync truncation just means
        some prefetched rows go unused until their episode actually starts."""
        wins = self._occ.episodes_by_window(n_windows, self._t_steps)
        eps = np.unique(np.concatenate(wins)) if wins else np.asarray([])
        keys = self._keys_for(eps)
        if len(keys) <= self.capacity:
            self._ensure(keys)
        else:
            # more future keys than slots: ensure only window 0 (required)
            self._ensure(self._keys_for(wins[0]))

    def advance(self, t_steps: int) -> None:
        self._occ.advance(t_steps)
