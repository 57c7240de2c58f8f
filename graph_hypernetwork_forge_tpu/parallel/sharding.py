"""Sharding layouts for HyperGNN training (GSPMD).

Partitioning strategy (SURVEY.md §2.3 build table):

- **Edge partitioning** (the dominant axis): ``src/dst/rel_ids/edge_mask``
  are sharded along ``"edge"``; the segment-sum mean aggregation then
  requires a cross-shard reduction, which XLA inserts automatically (the
  two-phase sum+count-then-divide semantics are preserved because the
  divide happens after the full reduction — exactness mirrors reference
  ``models/hypergnn.py:207-213``).
- **Tensor parallelism**: each WeightGenerator head's final Linear output
  dim (= the flattened generated weight) is sharded along ``"model"``, so
  the generated ``[U, d_in, d_out]`` banks and all downstream ``d_out``
  activations shard without resharding.
- Node features, text-encoder, and LayerNorm params are replicated (node
  sharding + halo exchange is the shard_map path in
  ``parallel/edge_partition.py``).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_hypernetwork_forge_tpu.models.hypergnn import HyperGNNConfig


def _named(mesh: Mesh, *axes) -> NamedSharding:
    axes = tuple(a if (a is None or a in mesh.shape) else None for a in axes)
    return NamedSharding(mesh, P(*axes))


def hypergnn_param_shardings(config: HyperGNNConfig, mesh: Mesh) -> Any:
    """Pytree of NamedShardings mirroring ``init_hypergnn``'s structure."""
    repl = _named(mesh)
    lin_repl = {"w": repl, "b": repl}

    def head_shardings() -> list:
        layers = [lin_repl for _ in range(config.weight_generator.num_hidden)]
        # Final generator layer: shard the flattened generated-weight dim.
        layers.append({"w": _named(mesh, None, "model"), "b": _named(mesh, "model")})
        return layers

    wg = {
        "heads": {
            name: head_shardings() for name, _ in config.weight_generator.weight_specs
        },
        "log_scales": {
            name: repl for name, _ in config.weight_generator.weight_specs
        },
    }
    return {
        "text_encoder": {"char_emb": repl, "proj": lin_repl},
        "input_proj": lin_repl,
        "weight_generators": [wg for _ in range(config.num_layers)],
        "layer_norms": [
            {"g": repl, "b": repl} for _ in range(config.num_layers)
        ],
    }


def graph_array_shardings(mesh: Mesh) -> tuple:
    """Shardings for ``EncodedGraph.arrays`` order:
    (src, dst, rel_ids, edge_mask, char_ids, text_lengths)."""
    edge = _named(mesh, "edge")
    repl = _named(mesh)
    return (edge, edge, edge, edge, repl, repl)


def shard_params(params: Any, config: HyperGNNConfig, mesh: Mesh) -> Any:
    shardings = hypergnn_param_shardings(config, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_graph_arrays(arrays: tuple, mesh: Mesh) -> tuple:
    import jax.numpy as jnp

    return tuple(
        jax.device_put(jnp.asarray(a), s)
        for a, s in zip(arrays, graph_array_shardings(mesh))
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    repl = _named(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)
