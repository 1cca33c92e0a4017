from move2hear_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)
from move2hear_tpu.parallel.ddppo import (
    RolloutSyncState,
    init_distributed,
    NumDoneStore,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "RolloutSyncState",
    "init_distributed",
    "NumDoneStore",
]
