"""Subprocess body for the trainer-level multi-host test
(tests/test_multihost.py::test_two_process_full_trainer): run the FULL
device-path PPOTrainer.train() as one rank of a multi-process jax world
(2 real processes x 4 virtual CPU devices each), then dump this rank's view
of the final parameters.

Mirrors main.py's dispatch exactly (config -> registry -> init_distributed ->
add_signal_handlers -> trainer.train()) and adds only the params dump — the
reference analog is an 8-rank DDPPO launch where every rank's DDP-wrapped
model must hold identical weights after training (rl/ppo/ddppo_utils.py:
117-165, rl/ppo/ppo.py:286-319).

Usage:
    python _multihost_train.py <out_npz> <model_dir> [opts...]
with RANK / WORLD_SIZE / LOCAL_RANK / MASTER_ADDR / MASTER_PORT and the CPU
device-count XLA flag already in the environment (single-process when
WORLD_SIZE is unset).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# the axon TPU plugin (sitecustomize) wins over the env var; force CPU
# through jax.config too (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    out_npz, model_dir, *opts = sys.argv[1:]

    from move2hear_tpu.config import get_config
    from move2hear_tpu.parallel.ddppo import (
        add_signal_handlers,
        init_distributed,
    )
    from move2hear_tpu.utils.registry import registry

    import move2hear_tpu.rl.trainer  # noqa: F401  (self-registers)

    config = get_config(None, list(opts), model_dir, "train")
    trainer_cls = registry.get_trainer(config.TRAINER_NAME)
    init_distributed(config.RL.PPO.master_addr, config.RL.PPO.master_port)
    add_signal_handlers()

    # Test hook (M2H_TEST_SYNC_STORE=stop|go): replace the num-done store
    # with a fixed-answer fake so the preemptive-sync decision DATA each rank
    # reads is controlled per rank — "stop" reads the whole world as done,
    # "go" reads nobody. Divergent values across ranks reproduce the timing
    # race a shared TCP/file store exhibits mid-rollout; the trainer's
    # collective_any reduce must still cut every rank at the same step.
    store_mode = os.environ.get("M2H_TEST_SYNC_STORE", "")
    if store_mode:
        import move2hear_tpu.rl.trainer as trainer_mod
        from move2hear_tpu.parallel.ddppo import RolloutSyncState

        class _FixedStore:
            def __init__(self, n):
                self._n = n

            def add(self, generation):
                return self._n

            def get(self, generation):
                return self._n

            def close(self):
                pass

        n_done = 10**6 if store_mode == "stop" else 0
        p = config.RL.PPO
        store_world = int(os.environ.get("WORLD_SIZE", "2"))

        def _make_sync(self, t):
            return RolloutSyncState(
                sync_frac=p.sync_frac,
                short_rollout_threshold=p.short_rollout_threshold,
                num_steps=t,
                world_size=store_world,
                store=_FixedStore(n_done),
            )

        trainer_mod.PPOTrainer._make_rollout_sync = _make_sync

    if "WORLD_SIZE" in os.environ:
        assert jax.process_count() == int(os.environ["WORLD_SIZE"])

    # Test hook (M2H_TEST_SCALE_BUNDLE=1): a multi-scene fixture whose dense
    # RIR bank exceeds TPU.MAX_DEVICE_BANK_BYTES while the episode-keyed
    # sub-bank slab fits — forcing rir_mode="sub" across the real processes
    # (tests/test_multihost.py::test_two_process_sub_bank_trainer). Identical
    # construction on every rank (seeded), like a shared file-backed bundle.
    bundle = None
    if os.environ.get("M2H_TEST_SCALE_BUNDLE", ""):
        from move2hear_tpu.env.micro_scene import build_scale_fixture

        bundle = build_scale_fixture(
            num_scenes=2, rows=5, cols=8, episodes_per_scene=8,
            rir_length=300, with_frames=False, near_target=True, seed=0,
        )

    trainer = trainer_cls(config, bundle=bundle)
    trainer.train()

    import flax.serialization

    params = jax.device_get(trainer._final_state.params)
    flat = {
        "/".join(str(k) for k in path): np.asarray(leaf)
        for path, leaf in flax.traverse_util.flatten_dict(
            flax.serialization.to_state_dict(params)
        ).items()
    }
    # first-cycle losses: global means over identical pre-divergence inputs,
    # the topology-equality oracle (params after Adam steps only bound to ~lr)
    flat["__loss_pol__"] = np.asarray(trainer._loss_log[0][0])
    flat["__loss_sep__"] = np.asarray(trainer._loss_log[0][1])
    flat["__sep_fill__"] = np.asarray(
        getattr(trainer, "_last_sep_fill", -1)
    )
    flat["__rir_mode__"] = np.asarray(
        {"dense": 0, "sub": 1, "host": 2}.get(
            getattr(trainer, "_rir_mode", ""), -1
        )
    )
    for i, st in enumerate(trainer._stats_log):
        for k, v in st.items():
            flat[f"__st{i}_{k}__"] = np.asarray(v)
    np.savez(out_npz, **flat)
    print(f"TRAIN-OK {jax.process_index()} leaves={len(flat)}", flush=True)


if __name__ == "__main__":
    import flax.traverse_util  # noqa: F401  (import check before training)

    main()
