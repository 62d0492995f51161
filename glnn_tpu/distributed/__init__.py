from glnn_tpu.distributed.mesh import make_mesh, shard_graph, shard_nodes
from glnn_tpu.distributed.partition import (contiguous_partition, degree_balanced_order, inverse_permutation, shard_edge_balance)

__all__ = ["make_mesh", "shard_graph", "shard_nodes",
           "contiguous_partition", "degree_balanced_order", "inverse_permutation", "shard_edge_balance"]
