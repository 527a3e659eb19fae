from admmnet_tpu.parallel.mesh import (
    data_mesh,
    replicate,
    shard_batch,
    sharded_solver,
)

__all__ = ["data_mesh", "replicate", "shard_batch", "sharded_solver"]
