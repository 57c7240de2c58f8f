"""Parallelism layer: device meshes, GSPMD shardings, explicit collectives."""

from graph_hypernetwork_forge_tpu.parallel.composed import (
    composed_forward,
    make_composed_train_step,
    prepare_composed_inputs,
)
from graph_hypernetwork_forge_tpu.parallel.edge_partition import (
    edge_partitioned_message_passing,
)
from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh, mesh_axis_size
from graph_hypernetwork_forge_tpu.parallel.data_parallel import (
    make_data_parallel_step,
)
from graph_hypernetwork_forge_tpu.parallel.pipeline import (
    pipelined_forward,
    stack_layer_params,
)
from graph_hypernetwork_forge_tpu.parallel.node_partition import (
    node_partitioned_message_passing,
    partition_edges_by_dst,
)
from graph_hypernetwork_forge_tpu.parallel.relation_sharding import (
    relation_sharded_generate,
)
from graph_hypernetwork_forge_tpu.parallel.sharding import (
    graph_array_shardings,
    hypergnn_param_shardings,
    replicate,
    shard_graph_arrays,
    shard_params,
)

__all__ = [
    "composed_forward",
    "edge_partitioned_message_passing",
    "make_composed_train_step",
    "prepare_composed_inputs",
    "graph_array_shardings",
    "hypergnn_param_shardings",
    "make_data_parallel_step",
    "make_mesh",
    "mesh_axis_size",
    "node_partitioned_message_passing",
    "partition_edges_by_dst",
    "pipelined_forward",
    "relation_sharded_generate",
    "stack_layer_params",
    "replicate",
    "shard_graph_arrays",
    "shard_params",
]
