from admmnet_tpu.parallel.distributed import (
    DistributedInfo,
    host_local_batch,
    init_distributed,
)
from admmnet_tpu.parallel.mesh import (
    data_mesh,
    replicate,
    shard_batch,
    sharded_solver,
)

__all__ = [
    "DistributedInfo",
    "data_mesh",
    "host_local_batch",
    "init_distributed",
    "replicate",
    "shard_batch",
    "sharded_solver",
]
