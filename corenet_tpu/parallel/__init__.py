from corenet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
