"""Explicit edge-partitioned message passing via ``shard_map`` + collectives.

The GNN analogue of sequence/context parallelism (SURVEY.md §5.7): the edge
list is sharded across the ``"edge"`` mesh axis; every device computes its
local per-edge contributions and *partial* segment sums over the full node
range, then a single ``psum`` over the edge axis completes the two-phase
mean aggregation:

    phase 1 (local):   partial_sum_v = Σ_{local e→v} msg_e ,  partial_cnt_v
    phase 2 (psum):    sum_v = psum(partial_sum_v), cnt_v = psum(partial_cnt_v)
    divide:            agg_v = sum_v / max(cnt_v, 1)

Because the divide happens strictly after the cross-shard reduction, the
result is *exactly* the single-device mean (same reduction tree, f32), which
is what the parity gate requires (reference ``models/hypergnn.py:207-213``).
Node embeddings are replicated across the edge axis here; the all-to-all
halo-exchange variant for node-sharded operation rides on top of this and
lands with neighbor-sampled minibatching.

This is the hand-written collective path; the GSPMD path
(``parallel/sharding.py``) lets XLA derive the same collectives from
shardings. Both are tested for exactness against single-device execution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map


def edge_partitioned_message_passing(
    mesh: Mesh,
    h: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    rel_ids: jax.Array,
    w_msg: jax.Array,
    w_self: jax.Array,
    bias: jax.Array,
    *,
    edge_mask: jax.Array | None = None,
    axis: str = "edge",
    precision="highest",
) -> jax.Array:
    """Relation-conditioned message passing with edges sharded over ``axis``.

    ``h``, weights and bias are replicated; ``src/dst/rel_ids/edge_mask`` are
    sharded on their leading (edge) dim. Returns replicated ``[N, d_out]``.
    """
    from graph_hypernetwork_forge_tpu.utils.initializers import resolve_precision

    precision = resolve_precision(precision)
    n = h.shape[0]
    if edge_mask is None:
        edge_mask = jnp.ones(src.shape, dtype=h.dtype)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P(), P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def _shard_fn(h, src, dst, rel_ids, w_msg, w_self, bias, edge_mask):
        # Local per-edge contributions (dense backend: relation-batched
        # matmul then vector gathers; see ops/message_passing.py).
        hw_msg = jnp.einsum("nd,udo->uno", h, w_msg, precision=precision)
        hw_self = jnp.einsum("nd,udo->uno", h, w_self, precision=precision)
        msg = (hw_msg[rel_ids, src] + bias[rel_ids]) * edge_mask[:, None]
        self_contrib = hw_self[rel_ids, dst] * edge_mask[:, None]

        # Phase 1: local partial segment sums over the full node range.
        part_msg = jax.ops.segment_sum(msg, dst, num_segments=n)
        part_self = jax.ops.segment_sum(self_contrib, dst, num_segments=n)
        part_cnt = jax.ops.segment_sum(edge_mask, dst, num_segments=n)

        # Phase 2: complete the reduction across edge shards over ICI.
        total_msg = jax.lax.psum(part_msg, axis)
        total_self = jax.lax.psum(part_self, axis)
        total_cnt = jax.lax.psum(part_cnt, axis)

        cnt = jnp.maximum(total_cnt, 1.0)[:, None]
        return total_msg / cnt + total_self / cnt

    return _shard_fn(h, src, dst, rel_ids, w_msg, w_self, bias, edge_mask)
