"""Vectorized environments (``common/env_utils.py`` / ``sync_vector_env.py``).

Two launchers with one API:
  - SyncVectorEnv: all envs in-process, synchronous — the debug/test harness
    (sync_vector_env.py:113-249) and, in this TPU build, also the *default*
    trainer path: with audio rendering moved onto the device, an env step is a
    cheap graph walk + memory gathers, so worker processes (and their pipe
    serialization of 512x32 spectrograms) are pure overhead.
  - ProcessVectorEnv: one OS process per env over pipes with the reference's
    command protocol {STEP, RESET, CALL, COUNT_EPISODES, CLOSE}
    (env_utils.py:41-54,157-269), for host-heavy env stacks (e.g.
    DEVICE_AUDIO_RENDERING=False or file-backed frame caches).

API (habitat-VectorEnv-compatible subset): reset(), step(actions),
pause_at(i), resume_all(), call(names, args), count_episodes(), num_envs,
close(). Auto-reset on done happens inside the env (environment.py)."""

import multiprocessing as mp
import signal
from typing import Any, Callable, List, Optional, Sequence, Tuple

STEP_CMD = "step"
RESET_CMD = "reset"
CLOSE_CMD = "close"
CALL_CMD = "call"
COUNT_EPISODES_CMD = "count_episodes"


class _VectorEnvBase:
    def __init__(self):
        self._paused: List[Tuple[int, Any]] = []

    @property
    def num_envs(self) -> int:
        raise NotImplementedError

    def reset(self) -> List[Any]:
        raise NotImplementedError

    def step(self, actions: Sequence[int]) -> List[Tuple]:
        raise NotImplementedError

    def pause_at(self, index: int) -> None:
        raise NotImplementedError

    def resume_all(self) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


class SyncVectorEnv(_VectorEnvBase):
    def __init__(self, env_fns: Sequence[Callable[[], Any]]):
        super().__init__()
        self.envs = [fn() for fn in env_fns]

    @property
    def num_envs(self):
        return len(self.envs)

    def reset(self):
        return [env.reset() for env in self.envs]

    def step(self, actions):
        assert len(actions) == len(self.envs)
        return [env.step(a) for env, a in zip(self.envs, actions)]

    def pause_at(self, index):
        self._paused.append((index, self.envs.pop(index)))

    def resume_all(self):
        for index, env in reversed(sorted(self._paused, key=lambda x: x[0])):
            self.envs.insert(index, env)
        self._paused = []

    def call(self, function_names, function_args_list=None):
        args_list = function_args_list or [None] * len(function_names)
        results = []
        for env, name, args in zip(self.envs, function_names, args_list):
            fn = getattr(env, name)
            results.append(fn(**args) if args else fn())
        return results

    def count_episodes(self):
        return [env.number_of_episodes() for env in self.envs]

    def close(self):
        self.envs = []


def _worker(pipe, env_fn, ignore_signals: bool):
    if ignore_signals:
        # under DDPPO only the trainer coordinates shutdown
        # (env_utils.py:168-173)
        for s in (signal.SIGINT, signal.SIGTERM, signal.SIGUSR1, signal.SIGUSR2):
            try:
                signal.signal(s, signal.SIG_IGN)
            except (ValueError, OSError):
                pass
    env = env_fn()
    try:
        while True:
            cmd, data = pipe.recv()
            if cmd == STEP_CMD:
                pipe.send(env.step(data))
            elif cmd == RESET_CMD:
                pipe.send(env.reset())
            elif cmd == CALL_CMD:
                name, args = data
                fn = getattr(env, name)
                pipe.send(fn(**args) if args else fn())
            elif cmd == COUNT_EPISODES_CMD:
                pipe.send(env.number_of_episodes())
            elif cmd == CLOSE_CMD:
                pipe.send(None)
                break
    except (EOFError, KeyboardInterrupt):
        pass


class ProcessVectorEnv(_VectorEnvBase):
    def __init__(
        self,
        env_fns: Sequence[Callable[[], Any]],
        workers_ignore_signals: bool = False,
        context: str = "forkserver",
    ):
        super().__init__()
        ctx = mp.get_context(context)
        self._pipes = []
        self._procs = []
        for fn in env_fns:
            parent, child = ctx.Pipe(duplex=True)
            proc = ctx.Process(
                target=_worker, args=(child, fn, workers_ignore_signals)
            )
            proc.daemon = True
            proc.start()
            child.close()
            self._pipes.append(parent)
            self._procs.append(proc)

    @property
    def num_envs(self):
        return len(self._pipes)

    def reset(self):
        for p in self._pipes:
            p.send((RESET_CMD, None))
        return [p.recv() for p in self._pipes]

    def async_step(self, actions):
        for p, a in zip(self._pipes, actions):
            p.send((STEP_CMD, a))

    def wait_step(self):
        return [p.recv() for p in self._pipes]

    def step(self, actions):
        self.async_step(actions)
        return self.wait_step()

    def pause_at(self, index):
        self._paused.append(
            (index, (self._pipes.pop(index), self._procs.pop(index)))
        )

    def resume_all(self):
        for index, (pipe, proc) in reversed(sorted(self._paused, key=lambda x: x[0])):
            self._pipes.insert(index, pipe)
            self._procs.insert(index, proc)
        self._paused = []

    def call(self, function_names, function_args_list=None):
        args_list = function_args_list or [None] * len(function_names)
        for p, name, args in zip(self._pipes, function_names, args_list):
            p.send((CALL_CMD, (name, args)))
        return [p.recv() for p in self._pipes]

    def count_episodes(self):
        for p in self._pipes:
            p.send((COUNT_EPISODES_CMD, None))
        return [p.recv() for p in self._pipes]

    def close(self):
        for index, (pipe, proc) in self._paused:
            self._pipes.append(pipe)
            self._procs.append(proc)
        self._paused = []
        for p in self._pipes:
            try:
                p.send((CLOSE_CMD, None))
                p.recv()
            except (BrokenPipeError, EOFError):
                pass
        for proc in self._procs:
            proc.join(timeout=5)
            if proc.is_alive():
                proc.terminate()
        self._pipes, self._procs = [], []


def construct_envs(
    env_fns: Sequence[Callable[[], Any]],
    use_sync: bool = True,
    workers_ignore_signals: bool = False,
) -> _VectorEnvBase:
    """Launcher selection (env_utils.py:606-629). Scene round-robin splitting
    happens at the env_fns construction site (see rl/trainer.py /
    env/micro_scene.py)."""
    if use_sync:
        return SyncVectorEnv(env_fns)
    # fork (not forkserver): env_fns are closures over in-memory scene
    # bundles, which only survive address-space inheritance. The reference
    # instead pickles yacs configs to forkserver workers (env_utils.py:622-629)
    # — its env state is file-backed, ours may be host RAM.
    return ProcessVectorEnv(
        env_fns, workers_ignore_signals=workers_ignore_signals, context="fork"
    )
