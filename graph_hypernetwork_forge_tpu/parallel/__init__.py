"""Parallelism layer: device meshes, GSPMD shardings, explicit collectives."""

from graph_hypernetwork_forge_tpu.parallel.edge_partition import (
    edge_partitioned_message_passing,
)
from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh, mesh_axis_size
from graph_hypernetwork_forge_tpu.parallel.sharding import (
    graph_array_shardings,
    hypergnn_param_shardings,
    replicate,
    shard_graph_arrays,
    shard_params,
)

__all__ = [
    "edge_partitioned_message_passing",
    "graph_array_shardings",
    "hypergnn_param_shardings",
    "make_mesh",
    "mesh_axis_size",
    "replicate",
    "shard_graph_arrays",
    "shard_params",
]
