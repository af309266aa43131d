from .mesh import make_mesh
from .sharded import (
    data_sharding,
    make_sharded_epoch,
    shard_data,
    shard_state,
    state_shardings,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "make_sharded_epoch",
    "shard_data",
    "shard_state",
    "state_shardings",
]
