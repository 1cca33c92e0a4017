"""Write a complete dataset fixture in the reference's exact on-disk layout
(SoundSpaces metadata + RIR trees, class-named mono wavs, pre-rendered
observation pickles, gz-json episode files, passive datapoint pickles) so the
trainers/evaluators can be driven from `main.py` with ONLY config paths — no
Python-API bundle injection.

Layouts reproduced (reference file:line):
  {root}/metadata/mp3d/{scene}/points.txt + graph.pkl    habitat_audio/utils.py:7-63
  {root}/binaural_rirs/mp3d/{scene}/{az}/{r}_{s}.wav     simulator_train.py:402-415
  {root}/audio_data/{train,val}/{class}_{i}.wav          datasets/dataset.py:48-64
  {root}/scene_observations/mp3d/{scene}.pkl             simulator_train.py:89-95
  {root}/datasets/audio_separation/v1/{split}/content/{scene}.json.gz
                                                         habitat_audio/dataset.py:97-131
  {root}/passive_datasets/v1/{train,val}/{scene}.pkl     datasets/dataset.py:73-77
"""

import gzip
import json
import os
import pickle

import numpy as np

from move2hear_tpu.pretrain.dataset import (
    CLASS_NAMES_TO_LABELS,
    ESC_LABEL,
    LABELS_TO_CLASS_NAMES,
)

GRID = 3  # nodes per scene side; node id = r * GRID + c


def _grid_graph(grid_size=1.0):
    import networkx as nx

    g = nx.Graph()
    v = GRID * GRID
    for n in range(v):
        r, c = divmod(n, GRID)
        g.add_node(n, point=np.array([c * grid_size, 0.0, r * grid_size]))
    for n in range(v):
        r, c = divmod(n, GRID)
        for dr, dc in ((0, 1), (1, 0)):
            rr, cc = r + dr, c + dc
            if rr < GRID and cc < GRID:
                g.add_edge(n, rr * GRID + cc)
    return g


def _geodesic(a, b):
    ra, ca = divmod(a, GRID)
    rb, cb = divmod(b, GRID)
    return float(abs(ra - rb) + abs(ca - cb))


def _write_wav(path, data, sr=16000):
    from scipy.io import wavfile

    os.makedirs(os.path.dirname(path), exist_ok=True)
    wavfile.write(path, sr, data)


def write_reference_layout(
    root,
    scenes=("sceneA", "sceneB"),
    splits=("train_nearTarget", "val_nearTarget"),
    episodes_per_scene=6,
    near_target=True,
    rir_len=300,
    wav_len=16000,
    seed=0,
):
    """Create the full fixture tree under `root` (a str/Path). Returns a dict
    of config-override paths to pass as CLI opts."""
    root = str(root)
    rng = np.random.default_rng(seed)
    v = GRID * GRID

    # --- scene metadata: points.txt + graph.pkl --------------------------
    for scene in scenes:
        meta = os.path.join(root, "metadata", "mp3d", scene)
        os.makedirs(meta, exist_ok=True)
        g = _grid_graph()
        rows = []
        for n in range(v):
            p = g.nodes[n]["point"]
            # inverse of the mp3d transform (utils.py:23-27):
            # loader computes [c1, c3 - 1.5, -c2]
            rows.append(f"{n}\t{p[0]}\t{-p[2]}\t{p[1] + 1.5}")
        with open(os.path.join(meta, "points.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
        with open(os.path.join(meta, "graph.pkl"), "wb") as f:
            pickle.dump(g, f)

    # --- binaural RIR trees ----------------------------------------------
    for si, scene in enumerate(scenes):
        for az in (0, 90, 180, 270):
            for r in range(v):
                for s in range(v):
                    rir = (
                        rng.standard_normal((rir_len, 2)) * 0.05
                        / (1.0 + _geodesic(r, s))
                    ).astype(np.float32)
                    rir[0] = 0.5  # direct path
                    _write_wav(
                        os.path.join(
                            root, "binaural_rirs", "mp3d", scene, str(az),
                            f"{r}_{s}.wav",
                        ),
                        rir,
                    )

    # --- class-named mono wavs (train pool + held-out val pool) ----------
    t = np.arange(wav_len) / 16000.0
    pools = {}
    for pool_i, pool in enumerate(("train", "val")):
        names = []
        for cls, label in CLASS_NAMES_TO_LABELS.items():
            f0 = 60.0 * (label + 2) * (1.3 if pool == "val" else 1.0)
            sig = np.sin(2 * np.pi * f0 * t) + 0.5 * np.sin(
                2 * np.pi * 2.1 * f0 * t
            )
            sig = sig + 0.1 * rng.standard_normal(wav_len)
            wav = (sig / np.abs(sig).max() * 9000).astype(np.int16)
            name = f"{cls}_0"
            _write_wav(
                os.path.join(root, "audio_data", pool, name + ".wav"), wav
            )
            names.append(name)
        pools[pool] = names

    # --- pre-rendered observations ---------------------------------------
    for scene in scenes:
        frames = {}
        for n in range(v):
            for rot in (0, 90, 180, 270):
                base = np.full((128, 128), (n * 4 + rot // 90) % 251,
                               np.uint8)
                frames[(n, rot)] = {
                    "rgb": np.stack([base, base // 2, base // 3], axis=-1),
                    "depth": (base.astype(np.float32) / 255.0),
                }
        path = os.path.join(root, "scene_observations", "mp3d", scene + ".pkl")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(frames, f)

    # --- episode gz-json per split/scene ---------------------------------
    target_labels = [l for l in range(len(CLASS_NAMES_TO_LABELS))
                     if l != ESC_LABEL]
    for split in splits:
        content = os.path.join(
            root, "datasets", "audio_separation", "v1", split, "content"
        )
        os.makedirs(content, exist_ok=True)
        for scene in scenes:
            eps = []
            for i in range(episodes_per_scene):
                srcs = rng.choice(v, size=2, replace=False)
                label = int(rng.choice(target_labels))
                d_label = int(rng.choice(
                    [l for l in range(len(CLASS_NAMES_TO_LABELS))
                     if l != label]
                ))
                start = int(srcs[0]) if near_target else int(
                    rng.choice([n for n in range(v) if _geodesic(n, srcs[0]) >= 2])
                )
                eps.append({
                    "episode_id": str(i),
                    "scene_id": f"mp3d/{scene}/{scene}.glb",
                    "start_position_index": start,
                    "start_rotation_angle": int(rng.choice([0, 90, 180, 270])),
                    "goals": [{"position_index": int(s)} for s in srcs],
                    "info": [
                        {
                            "sound": f"{LABELS_TO_CLASS_NAMES[label]}_0",
                            "target_label": label,
                            "geodesic_distance": _geodesic(start, int(srcs[0])),
                        },
                        {
                            "sound": f"{LABELS_TO_CLASS_NAMES[d_label]}_0",
                            "target_label": d_label,
                        },
                    ],
                })
            with gzip.open(
                os.path.join(content, scene + ".json.gz"), "wt"
            ) as f:
                json.dump({"episodes": eps}, f)

    # --- passive datapoint pickles ---------------------------------------
    for dp_split in ("train", "val"):
        dp_dir = os.path.join(root, "passive_datasets", "v1", dp_split)
        os.makedirs(dp_dir, exist_ok=True)
        for scene in scenes:
            pts = []
            for _ in range(8):
                r = int(rng.integers(0, v))
                pts.append({
                    "r": r,
                    "azimuth": int(rng.choice([0, 90, 180, 270])),
                    "all_s": [int(x) for x in
                              rng.choice(v, size=2, replace=False)],
                })
            with open(os.path.join(dp_dir, scene + ".pkl"), "wb") as f:
                pickle.dump({scene: pts}, f)

    return {
        "META_DIR": os.path.join(root, "metadata", "mp3d"),
        "RIR_DIR": os.path.join(root, "binaural_rirs", "mp3d"),
        "MONO_DIR": os.path.join(root, "audio_data", "train"),
        "MONO_DIR_VAL": os.path.join(root, "audio_data", "val"),
        "RENDERED_OBSERVATIONS": os.path.join(root, "scene_observations"),
        "DATA_PATH": os.path.join(
            root, "datasets", "audio_separation", "{version}", "{split}",
            "{split}.json.gz",
        ),
        "DATAPOINTS_DIR": os.path.join(root, "passive_datasets"),
    }
