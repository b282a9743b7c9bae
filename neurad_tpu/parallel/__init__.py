"""Multi-chip/multi-host parallelism: mesh construction and data sharding."""

from neurad_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    shard_batch,
    make_sharded_train_step,
)
