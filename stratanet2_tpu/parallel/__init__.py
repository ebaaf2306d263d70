from stratanet2_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "replicate", "shard_batch"]
