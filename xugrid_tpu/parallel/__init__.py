from xugrid_tpu.parallel.sharding import (
    NeighborExchangePlan,
    ShardedRegrid,
    halo_exchange,
    hilbert_layout,
    partition_order,
    sharded_cg_solve,
    sharded_laplace_smooth,
)

__all__ = [
    "NeighborExchangePlan",
    "ShardedRegrid",
    "halo_exchange",
    "hilbert_layout",
    "partition_order",
    "sharded_cg_solve",
    "sharded_laplace_smooth",
]
