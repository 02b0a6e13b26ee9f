from .mesh import create_mesh
from .mesh import distributed_initialize
from .sharding import shard_chain_state
from .sharding import shard_data_dict
from .sharding import sharded_logsumexp

__all__ = [
    "create_mesh",
    "distributed_initialize",
    "shard_chain_state",
    "shard_data_dict",
    "sharded_logsumexp",
]
