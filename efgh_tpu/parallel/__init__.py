from efgh_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)
