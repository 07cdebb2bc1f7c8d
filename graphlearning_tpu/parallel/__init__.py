from graphlearning_tpu.parallel.mesh import (
    make_mesh, node_sharding, replicated, initialize_distributed)
from graphlearning_tpu.parallel.shard import (
    pad_graph_to,
    shard_graph,
    sharded_spmm,
    sharded_spmm_ring,
    put_features,
)
from graphlearning_tpu.parallel.execute import Distributor

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "node_sharding",
    "replicated",
    "pad_graph_to",
    "shard_graph",
    "sharded_spmm",
    "sharded_spmm_ring",
    "put_features",
    "Distributor",
]
