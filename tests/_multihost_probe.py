"""Subprocess body for the 2-process multi-host smoke test
(tests/test_multihost.py): initialize jax.distributed on CPU, assemble a
globally-sharded array from process-local numpy via the mesh helpers, and
run a jitted global reduction. Usage:
    python _multihost_probe.py <coordinator addr:port> <process_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)

import jax

# the axon TPU plugin (sitecustomize) wins over the env var; force CPU
# through jax.config too (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)

import numpy as np

from move2hear_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_env_batch,
    shard_rollouts,
)

assert jax.process_count() == 2
assert len(jax.devices()) == 2, jax.devices()
mesh = make_mesh()

# each process contributes its LOCAL env slice (2 envs each -> 4 global)
local = {
    "x": np.full((2, 3), float(jax.process_index()), np.float32),
    "s": np.float32(5.0),
}
g = shard_env_batch(mesh, local)
assert g["x"].shape == (4, 3), g["x"].shape

rb = shard_rollouts(mesh, {"buf": np.ones((3, 2, 4), np.float32)})
assert rb["buf"].shape == (3, 4, 4), rb["buf"].shape

params = replicate(mesh, {"w": np.arange(4, dtype=np.float32)})

total = jax.jit(lambda t, p: t["x"].sum() + p["w"].sum())(g, params)
# x sums to 0*6 + 1*6 = 6; w sums to 6 -> 12
np.testing.assert_allclose(float(total), 12.0)
print(f"MULTIHOST-OK {jax.process_index()}", flush=True)
