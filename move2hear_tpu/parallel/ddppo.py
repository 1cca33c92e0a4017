"""DDPPO control-plane utilities — the TPU equivalents of
``audio_separation/rl/ppo/ddppo_utils.py``:

- rank/world discovery (env vars -> single-process fallback, :142-155)
- the preemptive rollout-sync counter (TCPStore "num_done" in the reference,
  ppo_trainer.py:597-600,769-782) as a small KV abstraction with in-process,
  file-based (multi-process single host), and TCP implementations
- preemption signal handling + interrupted-state save/load (:26-110), without
  the SLURM-specific requeue (exposed as a callback hook instead)

Gradient/stat reduction itself lives in the jitted updates (psum/pmean over
the mesh) — there is no NCCL-style side channel."""

import json
import os
import signal
import socket
import socketserver
import threading
from dataclasses import dataclass, field
from typing import Callable, Optional

EXIT = threading.Event()
REQUEUE = threading.Event()


def add_signal_handlers(requeue_signal: int = signal.SIGUSR1):
    """SIGINT/SIGTERM/SIGUSR2 -> clean-exit flag; SIGUSR1 -> requeue flag
    (ddppo_utils.py:43-56)."""

    def _clean_exit(*_):
        EXIT.set()

    def _requeue(*_):
        EXIT.set()
        REQUEUE.set()

    for s in (signal.SIGINT, signal.SIGTERM, signal.SIGUSR2):
        signal.signal(s, _clean_exit)
    signal.signal(requeue_signal, _requeue)


def get_distrib_info():
    """(local_rank, world_rank, world_size) from torchrun-style env vars, else
    the single-process fallback (ddppo_utils.py:142-155)."""
    if "RANK" in os.environ and "WORLD_SIZE" in os.environ:
        return (
            int(os.environ.get("LOCAL_RANK", 0)),
            int(os.environ["RANK"]),
            int(os.environ["WORLD_SIZE"]),
        )
    if "SLURM_PROCID" in os.environ:
        return (
            int(os.environ["SLURM_LOCALID"]),
            int(os.environ["SLURM_PROCID"]),
            int(os.environ["SLURM_NTASKS"]),
        )
    return 0, 0, 1


def init_distributed(master_addr: str = "127.0.0.1", master_port: int = 8738):
    """Initialize jax multi-process when launched with world_size > 1;
    harmless no-op otherwise. Returns (local_rank, world_rank, world_size).

    torchrun-convention env vars MASTER_ADDR/MASTER_PORT override the config
    values (the analog of init_distrib_slurm, ddppo_utils.py:117-165)."""
    local_rank, world_rank, world_size = get_distrib_info()
    if world_size > 1:
        import jax

        master_addr = os.environ.get("MASTER_ADDR", master_addr)
        master_port = int(os.environ.get("MASTER_PORT", master_port))
        jax.distributed.initialize(
            coordinator_address=f"{master_addr}:{master_port}",
            num_processes=world_size,
            process_id=world_rank,
        )
    return local_rank, world_rank, world_size


def coordination_barrier(tag: str, timeout_s: float = 900.0):
    """Align all processes at a named coordination-service barrier (no
    XLA collective, no compilation — the coordinator's own barrier RPC).

    Used around first-call compiles in multi-process runs: XLA:CPU's gloo
    context initialization aborts if the peers' first executions of a
    collective start >30 s apart (hardcoded KV timeout), and on a
    single-core host two processes compiling the same large program are
    routinely scheduled that far apart. Aligning the ranks at the call that
    triggers each compile keeps the execution-start skew to scheduler noise.
    No-op when single-process or when jax.distributed was never initialized."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(f"m2h_{tag}", int(timeout_s * 1000))


# --- num_done store ----------------------------------------------------------

class NumDoneStore:
    """Counter of ranks that finished their rollout, used by the preemptive
    sync: collection stops early once num_done > sync_frac * world_size and
    step >= short_rollout_threshold * num_steps (ppo_trainer.py:769-782).

    GENERATION-KEYED: marks are tagged with the rollout's generation number
    and counted per generation, so no shared reset exists. The reference
    instead resets a single counter once per update after a synchronizing
    allreduce (ppo_trainer.py:863); a reset-at-rollout-start scheme (round 2
    here) let a slow rank truncate marks other ranks had already posted for
    the CURRENT rollout — pinned by
    tests/test_preemptive_sync.py::test_file_store_reset_race_two_processes."""

    def add(self, generation: int) -> int:
        """Mark this rank done for `generation`; return that gen's count."""
        raise NotImplementedError

    def get(self, generation: int) -> int:
        raise NotImplementedError

    def close(self):
        pass


class LocalNumDoneStore(NumDoneStore):
    """Single-process (world_size == 1) store."""

    def __init__(self):
        self._counts = {}
        self._lock = threading.Lock()

    def add(self, generation):
        with self._lock:
            self._counts[generation] = self._counts.get(generation, 0) + 1
            return self._counts[generation]

    def get(self, generation):
        return self._counts.get(generation, 0)


class FileNumDoneStore(NumDoneStore):
    """Multi-process single-host store backed by an O_APPEND file: each rank
    appends one `{generation}\\n` line on done; a generation's count is its
    line count. Append-only — no truncation can erase other ranks' marks.
    Growth is ~8 bytes/rank/rollout (a 100k-update 8-rank run: ~6 MB).

    `truncate=True` (rank 0, at construction, before any rollout) clears
    stale marks from a previous run sharing the path."""

    def __init__(self, path: str, truncate: bool = False):
        self._path = path
        if truncate:
            with open(path, "wb"):
                pass
        else:
            open(path, "ab").close()

    def add(self, generation):
        with open(self._path, "ab") as f:
            f.write(f"{int(generation)}\n".encode())
        return self.get(generation)

    def get(self, generation):
        tag = f"{int(generation)}\n".encode()
        with open(self._path, "rb") as f:
            return sum(1 for line in f if line == tag)


class _KVHandler(socketserver.StreamRequestHandler):
    def handle(self):
        line = self.rfile.readline().strip().decode()
        store = self.server.store  # type: ignore[attr-defined]
        op, gen = line.split()
        if op == "ADD":
            v = store.add(int(gen))
        else:
            v = store.get(int(gen))
        self.wfile.write(f"{v}\n".encode())


class TCPNumDoneStore(NumDoneStore):
    """Multi-host store: rank 0 serves a tiny line-protocol KV (the TCPStore
    analog); other ranks connect per op."""

    def __init__(self, addr: str, port: int, is_master: bool):
        self._addr, self._port = addr, port
        self._server = None
        if is_master:
            self._local = LocalNumDoneStore()
            srv = socketserver.ThreadingTCPServer((addr, port), _KVHandler)
            srv.store = self._local  # type: ignore[attr-defined]
            srv.daemon_threads = True
            self._server = srv
            threading.Thread(target=srv.serve_forever, daemon=True).start()

    def _rpc(self, msg: str) -> int:
        with socket.create_connection((self._addr, self._port), timeout=30) as s:
            s.sendall((msg + "\n").encode())
            return int(s.makefile().readline().strip())

    def add(self, generation):
        return self._rpc(f"ADD {int(generation)}")

    def get(self, generation):
        return self._rpc(f"GET {int(generation)}")

    def close(self):
        if self._server is not None:
            self._server.shutdown()


def make_num_done_store(
    world_rank: int,
    world_size: int,
    master_addr: str = "127.0.0.1",
    master_port: int = 8738,
) -> NumDoneStore:
    """Pick the num-done backend from the world topology (the reference
    always builds a TCPStore on master_addr:master_port+1,
    ppo_trainer.py:597-600): single process -> in-memory; multi-process on
    one host (loopback master) -> O_APPEND file; multi-host -> the rank-0
    served TCP KV."""
    if world_size <= 1:
        return LocalNumDoneStore()
    if master_addr in ("127.0.0.1", "localhost"):
        import tempfile

        path = os.path.join(
            tempfile.gettempdir(), f"m2h_num_done_{master_port}"
        )
        # rank 0 clears stale marks from a previous run before any rollout
        return FileNumDoneStore(path, truncate=world_rank == 0)
    return TCPNumDoneStore(
        master_addr, master_port + 1, is_master=world_rank == 0
    )


def requeue_job():
    """Requeue the SLURM job on preemption (ddppo_utils.py:98-110): only the
    REQUEUE-flagged rank-0 process calls scontrol."""
    import subprocess

    if not REQUEUE.is_set():
        return False
    job_id = os.environ.get("SLURM_JOB_ID")
    if job_id is None:
        return False
    _, world_rank, _ = get_distrib_info()
    if world_rank == 0:
        subprocess.run(["scontrol", "requeue", job_id], check=False)
    return True


# --- interrupted state -------------------------------------------------------

def interrupted_state_path(job_id, scope: str = "") -> str:
    """Path of the preemption snapshot. Under SLURM, job_id alone is unique;
    outside SLURM everyone shares the default JOB_ID=1, so `scope` (trainer
    kind + CHECKPOINT_FOLDER) keys the file to one experiment — a requeued
    rerun reproduces the same scope from its config, while unrelated runs
    (e.g. a bench and a test) can no longer adopt each other's state."""
    base = os.environ.get(
        "INTERRUPTED_STATE_DIR",
        os.path.join(os.path.expanduser("~"), ".interrupted_states"),
    )
    name = str(job_id)
    if scope:
        import hashlib

        name += "-" + hashlib.sha1(scope.encode()).hexdigest()[:12]
    return os.path.join(base, f"{name}.ckpt")


def save_interrupted_state(state: dict, job_id, scope: str = "") -> str:
    from move2hear_tpu.utils.checkpoint import save_checkpoint

    path = interrupted_state_path(job_id, scope)
    save_checkpoint(path, state)
    return path


def load_interrupted_state(job_id, scope: str = "") -> Optional[dict]:
    from move2hear_tpu.utils.checkpoint import load_checkpoint

    path = interrupted_state_path(job_id, scope)
    if not os.path.exists(path):
        return None
    return load_checkpoint(path)


@dataclass
class RolloutSyncState:
    """Preemptive-sync policy evaluated inside the rollout loop.

    Each rank advances its OWN generation counter at rollout start — all
    ranks run the same rollout sequence, so generations stay aligned without
    any shared reset (see NumDoneStore docstring for the race this fixes)."""

    sync_frac: float
    short_rollout_threshold: float
    num_steps: int
    world_size: int
    store: NumDoneStore = field(default_factory=LocalNumDoneStore)
    generation: int = 0

    def should_stop_early(self, step: int) -> bool:
        if self.world_size <= 1:
            return False
        return (
            step >= self.short_rollout_threshold * self.num_steps
            and self.store.get(self.generation) > self.sync_frac * self.world_size
        )

    def mark_done(self):
        self.store.add(self.generation)

    def new_rollout(self):
        self.generation += 1
