from dmfusion.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    replicate,
    shard_batch,
)
