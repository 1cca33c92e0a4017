"""End-to-end passive pretraining slice on synthetic data (CPU, tiny
shapes): the full fused pipeline (device rendering -> U-Nets -> L1 losses ->
adam) must run, checkpoint best-on-val, and reload."""

import os

import numpy as np
import pytest

from move2hear_tpu.config import get_config
from move2hear_tpu.pretrain import PassiveTrainer, SyntheticPassiveSource
from move2hear_tpu.utils.checkpoint import load_checkpoint
from move2hear_tpu.utils.registry import registry


@pytest.fixture
def tiny_config(tmp_path):
    cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "Pretrain.Passive.NUM_EPOCHS", "2",
            "Pretrain.Passive.BATCH_SIZE", "4",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
            "TPU.MESH_SHAPE", "[2]",
        ],
    )
    return cfg


def test_passive_trainer_end_to_end(tiny_config):
    sources = {
        "train": SyntheticPassiveSource(num_datapoints=8, rir_length=500, seed=0),
        "val": SyntheticPassiveSource(num_datapoints=4, rir_length=500, seed=1),
        "nonoverlapping_val": SyntheticPassiveSource(
            num_datapoints=4, rir_length=500, seed=2
        ),
    }
    trainer = PassiveTrainer(tiny_config, sources=sources)
    trainer.train()

    ckpt_path = os.path.join(
        tiny_config.CHECKPOINT_FOLDER, "best_ckpt_val.pth"
    )
    assert os.path.exists(ckpt_path)
    ckpt = load_checkpoint(ckpt_path)
    assert set(ckpt["params"].keys()) == {
        "binSep_enc", "binSep_dec", "bin2mono_enc", "bin2mono_dec"
    }
    assert "opt_state" in ckpt and "config" in ckpt
    assert ckpt["extra_state"]["epoch"] in (0, 1)
    # batch stats were actually updated by train-mode BN
    stats = ckpt["batch_stats"]
    means = [
        np.asarray(x)
        for k, x in _flat(stats)
        if k.endswith("mean")
    ]
    assert any(np.abs(m).max() > 0 for m in means), "BN running stats never updated"
    # per-epoch TB scalars (passive_trainer.py:254-255)
    assert any(
        "tfevents" in f for f in os.listdir(tiny_config.TENSORBOARD_DIR)
    )


def test_passive_trainer_bf16_compute(tmp_path):
    """bfloat16 compute dtype must train to finite losses (the MXU-friendly
    mode; params/BN stay f32)."""
    cfg = get_config(
        model_dir=str(tmp_path),
        opts=[
            "Pretrain.Passive.NUM_EPOCHS", "1",
            "Pretrain.Passive.BATCH_SIZE", "4",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
            "TPU.COMPUTE_DTYPE", "bfloat16",
        ],
    )
    sources = {
        k: SyntheticPassiveSource(num_datapoints=4, rir_length=400, seed=i)
        for i, k in enumerate(("train", "val", "nonoverlapping_val"))
    }
    trainer = PassiveTrainer(cfg, sources=sources)
    trainer.train()
    params, _, _ = trainer._final
    import jax

    for leaf in jax.tree.leaves(params):
        assert np.asarray(leaf).dtype == np.float32  # master params stay f32
        assert np.isfinite(np.asarray(leaf)).all()


def _flat(tree, prefix=""):
    out = []
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.extend(_flat(v, key))
        else:
            out.append((key, v))
    return out


def test_passive_trainer_registered():
    assert registry.get_trainer("passive") is PassiveTrainer


def test_synthetic_source_batch_shapes():
    src = SyntheticPassiveSource(num_datapoints=16, rir_length=500)
    rng = np.random.default_rng(0)
    b = src.sample_batch(rng, 5)
    assert b["mono_wavs"].shape == (5, 2, 16000)
    assert b["rirs"].shape == (5, 2, 500, 2)
    assert b["target_class"].shape == (5, 1)
    assert (b["target_class"] != 11).all()  # esc never a target
    d1 = src.sample_batch(rng, 3, deterministic=True, start=0)
    d2 = src.sample_batch(rng, 3, deterministic=True, start=0)
    np.testing.assert_array_equal(d1["mono_wavs"], d2["mono_wavs"])


def test_passive_trainer_preemption_and_resume(monkeypatch, tmp_path):
    """EXIT mid-run saves a scope-keyed interrupted state; a rerun with the
    same config auto-resumes it and completes (VERDICT r2 item 9 — the
    reference's pretrain loop ignores signals entirely)."""
    from move2hear_tpu.parallel import ddppo

    monkeypatch.setenv("INTERRUPTED_STATE_DIR", str(tmp_path / "interr"))
    cfg = get_config(
        model_dir=str(tmp_path / "md"),
        opts=[
            "Pretrain.Passive.NUM_EPOCHS", "2",
            "Pretrain.Passive.BATCH_SIZE", "4",
            "TASK_CONFIG.SIMULATOR.AUDIO.GT_MONO_MAG_NORM", "1.2",
        ],
    )
    sources = {
        "train": SyntheticPassiveSource(num_datapoints=8, rir_length=500, seed=0),
        "val": SyntheticPassiveSource(num_datapoints=4, rir_length=500, seed=1),
        "nonoverlapping_val": SyntheticPassiveSource(
            num_datapoints=4, rir_length=500, seed=2
        ),
    }
    ddppo.EXIT.set()
    try:
        PassiveTrainer(cfg, sources=sources).train()
    finally:
        ddppo.EXIT.clear()
    snap = ddppo.load_interrupted_state(
        cfg.JOB_ID, scope=f"PassiveTrainer:{cfg.CHECKPOINT_FOLDER}"
    )
    assert snap is not None and "params" in snap
    # preempted before epoch 0 completed -> no best-ckpt yet
    assert not os.path.exists(
        os.path.join(cfg.CHECKPOINT_FOLDER, "best_ckpt_val.pth")
    )

    # rerun with the same config resumes and completes
    PassiveTrainer(cfg, sources=sources).train()
    assert os.path.exists(
        os.path.join(cfg.CHECKPOINT_FOLDER, "best_ckpt_val.pth")
    )
    # normal completion clears the snapshot so a later rerun starts fresh
    assert ddppo.load_interrupted_state(
        cfg.JOB_ID, scope=f"PassiveTrainer:{cfg.CHECKPOINT_FOLDER}"
    ) is None
