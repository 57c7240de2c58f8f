"""Node-partitioned message passing: owner-computes aggregation + halo gather.

Complementary to ``parallel/edge_partition.py``: here *nodes* (not edges)
are range-sharded over the mesh axis, each device owns the aggregation for
its node range, and edges are pre-partitioned by dst ownership so no
cross-device reduction is needed for the segment sums. What must cross the
interconnect are the *source* node embeddings of boundary edges — the halo.
This v1 exchanges the full h via ``all_gather`` (the dense-boundary limit of
a halo exchange; a boundary-minimized ``ppermute`` exchange plugs into the
same structure when a partitioner provides locality).

Exactness: each dst's full in-edge set lives on its owner, so mean
aggregation (count clamp and all) is bitwise the single-device computation
per node — no two-phase reduction involved.

Host-side: :func:`partition_edges_by_dst` reorders/pads the edge list so
shard i's slice contains exactly the edges with ``dst in [i*npp, (i+1)*npp)``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from graph_hypernetwork_forge_tpu.utils.initializers import resolve_precision
from graph_hypernetwork_forge_tpu.utils.shapes import round_up_to_multiple


def partition_edges_by_dst(
    src: np.ndarray,
    dst: np.ndarray,
    rel_ids: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    num_shards: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Group edges by dst owner into equal-size padded shards.

    Returns ``(src', dst', rel', mask', nodes_per_shard)`` where each array
    has shape ``[num_shards * cap]`` laid out shard-major; padded entries
    have mask 0 and point at the owner's first node (in-range for the local
    segment sum).
    """
    nodes_per_shard = round_up_to_multiple(-(-num_nodes // num_shards), 1)
    real = edge_mask > 0
    owner = np.minimum(dst // nodes_per_shard, num_shards - 1)
    owner = np.where(real, owner, -1)

    counts = np.bincount(owner[real], minlength=num_shards)
    cap = round_up_to_multiple(int(counts.max()) if counts.size else 1, 8)

    out_src = np.zeros(num_shards * cap, dtype=src.dtype)
    out_dst = np.zeros(num_shards * cap, dtype=dst.dtype)
    out_rel = np.zeros(num_shards * cap, dtype=rel_ids.dtype)
    out_mask = np.zeros(num_shards * cap, dtype=edge_mask.dtype)
    for s in range(num_shards):
        sel = np.nonzero(owner == s)[0]
        base = s * cap
        out_src[base : base + sel.size] = src[sel]
        out_dst[base : base + sel.size] = dst[sel]
        out_rel[base : base + sel.size] = rel_ids[sel]
        out_mask[base : base + sel.size] = 1.0
        # padding rows target the owner's first node; mask keeps them inert
        out_dst[base + sel.size : base + cap] = min(
            s * nodes_per_shard, num_nodes - 1
        )
    return out_src, out_dst, out_rel, out_mask, nodes_per_shard


def node_partitioned_message_passing(
    mesh: Mesh,
    h: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    rel_ids: jax.Array,
    w_msg: jax.Array,
    w_self: jax.Array,
    bias: jax.Array,
    edge_mask: jax.Array,
    nodes_per_shard: int,
    *,
    axis: str = "edge",
    precision="highest",
) -> jax.Array:
    """Owner-computes message passing over dst-partitioned edges.

    ``h [N_pad, d]`` is sharded by node range over ``axis`` (``N_pad =
    nodes_per_shard * axis_size``); the edge arrays are shard-major from
    :func:`partition_edges_by_dst`. Returns ``h'`` sharded the same way.
    """
    prec = resolve_precision(precision)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(axis, None),  # h: node-range sharded
            P(axis), P(axis), P(axis), P(axis),  # edges by dst owner
            P(), P(), P(),  # weight banks replicated
        ),
        out_specs=P(axis, None),
        check_vma=False,
    )
    def _shard_fn(h_local, src, dst, rel, mask, w_msg, w_self, bias):
        my_idx = jax.lax.axis_index(axis)
        # Halo exchange (dense-boundary limit): assemble the full h so any
        # remote src row is addressable. Rides ICI; a locality-aware
        # partitioner would replace this with a ppermute of boundary rows.
        h_full = jax.lax.all_gather(h_local, axis, tiled=True)  # [N_pad, d]

        hw_msg = jnp.einsum("nd,udo->uno", h_full, w_msg, precision=prec)
        hw_self = jnp.einsum("nd,udo->uno", h_full, w_self, precision=prec)
        msg = (hw_msg[rel, src] + bias[rel]) * mask[:, None]
        selfc = hw_self[rel, dst] * mask[:, None]

        # Local (owner-exclusive) aggregation over this shard's node range.
        local_dst = dst - my_idx * nodes_per_shard
        agg = jax.ops.segment_sum(msg, local_dst, num_segments=nodes_per_shard)
        selft = jax.ops.segment_sum(selfc, local_dst, num_segments=nodes_per_shard)
        cnt = jax.ops.segment_sum(mask, local_dst, num_segments=nodes_per_shard)
        cnt = jnp.maximum(cnt, 1.0)[:, None]
        return agg / cnt + selft / cnt

    return _shard_fn(h, src, dst, rel_ids, edge_mask, w_msg, w_self, bias)
