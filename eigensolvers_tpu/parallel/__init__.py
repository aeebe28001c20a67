"""Mesh-sharded execution: device meshes, sharded vectors and operators."""
from .mesh import (make_mesh, distributed_initialize, replicated,
                   vector_sharding, batched_vector_sharding,
                   operator_row_sharding)
from .sharded import ShardedVector, shard_operator
from .spmd import (row_matvec, col_matvec, sharded_vdot,
                   place_row_sharded, place_col_sharded)

__all__ = ["make_mesh", "distributed_initialize", "replicated",
           "vector_sharding", "batched_vector_sharding",
           "operator_row_sharding", "ShardedVector", "shard_operator",
           "row_matvec", "col_matvec", "sharded_vdot",
           "place_row_sharded", "place_col_sharded"]
