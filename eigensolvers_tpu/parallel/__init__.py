"""Mesh-sharded execution: device meshes, sharded vectors and operators."""
from .mesh import (make_mesh, distributed_initialize, replicated,
                   vector_sharding, batched_vector_sharding,
                   operator_row_sharding)
from .sharded import ShardedVector, shard_operator

__all__ = ["make_mesh", "distributed_initialize", "replicated",
           "vector_sharding", "batched_vector_sharding",
           "operator_row_sharding", "ShardedVector", "shard_operator"]
