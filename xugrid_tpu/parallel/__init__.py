from xugrid_tpu.parallel.sharding import (
    ShardedRegrid,
    halo_exchange,
    partition_order,
    sharded_laplace_smooth,
)

__all__ = [
    "ShardedRegrid",
    "halo_exchange",
    "partition_order",
    "sharded_laplace_smooth",
]
