"""Relation-conditioned message passing — the HyperGNN compute core.

Semantics (must match reference ``models/hypergnn.py:160-230`` per-layer
allclose):

    For edge e = (u → v) with relation r:
        msg_e  = h_u @ W_msg[r] + bias[r]
    Aggregation at node v (count clamped to >= 1):
        agg_v  = (1 / max(cnt_v, 1)) * sum_{e → v} msg_e
    Self-loop with per-node *averaged* W_self over incoming relations:
        self_v = h_v @ ( sum_{e → v} W_self[r_e] / max(cnt_v, 1) )
    Output:
        h'_v   = agg_v + self_v

    Isolated nodes (cnt_v = 0) therefore output exactly zero pre-residual
    (the clamp fires before any isolated-node special case; reference
    ``models/hypergnn.py:212-226`` and SURVEY.md §2.1 #4).

TPU-first design: weights stay at *relation* granularity ``[U, d, d]``
throughout; per-edge ``[E, d, d]`` tensors (the reference's O(E·d²) memory
blow-up at ``models/hypergnn.py:281-283,217-220``) are never materialized.
Two algebraically identical backends:

``dense``
    One batched matmul ``HW[u] = H @ W[u]`` over all U relations
    (``[U, N, d]``, pure MXU work), then per-edge *vector* gathers + segment
    mean. Optimal when ``U · N`` is within a small factor of ``E`` — i.e.
    relation-dense graphs, exactly the regime of the reference benchmarks.
    The self-loop term uses the identity
        sum_{e → v} h_v @ W_self[r_e]  =  h_v @ sum_{e → v} W_self[r_e]
    so it is the same kernel with (dst, W_self, no bias).

``gather``
    Per-edge weight gather + batched matvec — the reference's own
    formulation, O(E·d²) memory. Kept as the parity oracle and for the
    extreme-sparse regime (E ≪ U·N).

``pallas``
    Fused gather→tile-matmul→(host of) segment-sum kernel over
    relation-sorted edges (see ``ops/pallas/edge_transform.py``); used when
    available, falls back to ``dense``.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from graph_hypernetwork_forge_tpu.ops.segment import segment_mean_clamped

Backend = Literal["auto", "dense", "gather", "pallas"]


def _edge_contributions_dense(h, src, dst, rel_ids, w_msg, w_self, bias, precision):
    """Per-edge (message, self) contributions via the all-relations product.

    HW[u] = H @ W[u] is a single ``[U]``-batched dense matmul (MXU-resident);
    each edge then gathers one d-vector instead of one d×d matrix.
    """
    hw_msg = jnp.einsum("nd,udo->uno", h, w_msg, precision=precision)  # [U, N, d_out]
    hw_self = jnp.einsum("nd,udo->uno", h, w_self, precision=precision)
    msg = hw_msg[rel_ids, src] + bias[rel_ids]  # [E, d_out]
    self_contrib = hw_self[rel_ids, dst]  # [E, d_out]
    return msg, self_contrib


def _edge_contributions_gather(h, src, dst, rel_ids, w_msg, w_self, bias, precision):
    """Per-edge contributions via per-edge weight gather (parity oracle)."""
    msg = (
        jnp.einsum("ed,edo->eo", h[src], w_msg[rel_ids], precision=precision)
        + bias[rel_ids]
    )
    self_contrib = jnp.einsum(
        "ed,edo->eo", h[dst], w_self[rel_ids], precision=precision
    )
    return msg, self_contrib


def _pick_backend(backend: Backend, num_nodes: int, num_rel: int, num_edges: int):
    if backend != "auto":
        return backend
    # Dense costs O(U·N·d²) flops on the MXU; gather costs O(E·d²) flops as
    # scalar-ish matvecs plus O(E·d²) HBM traffic for the weight gather. The
    # MXU advantage makes dense win unless the graph is extremely sparse
    # relative to the relation vocabulary.
    if num_rel * num_nodes <= 32 * num_edges:
        return "dense"
    return "gather"


def relational_message_passing(
    h: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    rel_ids: jax.Array,
    w_msg: jax.Array,
    w_self: jax.Array,
    bias: jax.Array,
    *,
    num_nodes: int | None = None,
    edge_mask: jax.Array | None = None,
    backend: Backend = "auto",
    precision="highest",
) -> jax.Array:
    """One round of relation-conditioned message passing.

    Args:
        h: ``[N, d_in]`` node embeddings.
        src, dst: ``[E]`` int edge endpoints (messages flow src → dst).
        rel_ids: ``[E]`` int relation id per edge, indexing into the weights.
        w_msg, w_self: ``[U, d_in, d_out]`` per-relation weights.
        bias: ``[U, d_out]`` per-relation bias (added to every message).
        num_nodes: number of nodes N (defaults to ``h.shape[0]``).
        edge_mask: optional ``[E]`` float mask; padded edges (0.0) contribute
            neither messages nor counts — required by the static-shape padding
            discipline.
        backend: ``auto`` | ``dense`` | ``gather`` | ``pallas``.
        precision: ``jax.lax.Precision`` for the matmuls (``"highest"`` for
            f32-exact parity; ``None``/default is bf16-class on TPU).

    Returns:
        ``[N, d_out]`` updated node embeddings (pre-residual).
    """
    from graph_hypernetwork_forge_tpu.utils.initializers import resolve_precision

    precision = resolve_precision(precision)
    n = int(h.shape[0]) if num_nodes is None else num_nodes
    u = int(w_msg.shape[0])
    e = int(src.shape[0])
    chosen = _pick_backend(backend, n, u, e)

    if chosen == "pallas":
        d_in, d_out = int(w_msg.shape[1]), int(w_msg.shape[2])
        if jax.default_backend() == "tpu" and (d_in % 128 or d_out % 128):
            # Mosaic compiles sub-lane-width (d < 128) blocks pathologically
            # slowly on this stack; the dense path is faster there anyway.
            chosen = "dense"

    if chosen == "pallas":
        from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
            edge_contributions_pallas,
        )

        msg, self_contrib = edge_contributions_pallas(
            h, src, dst, rel_ids, w_msg, w_self, bias
        )
    elif chosen == "dense":
        msg, self_contrib = _edge_contributions_dense(
            h, src, dst, rel_ids, w_msg, w_self, bias, precision
        )
    else:
        msg, self_contrib = _edge_contributions_gather(
            h, src, dst, rel_ids, w_msg, w_self, bias, precision
        )

    agg, cnt = segment_mean_clamped(msg, dst, n, weights=edge_mask)
    if edge_mask is not None:
        self_contrib = self_contrib * edge_mask[:, None]
    self_total = jax.ops.segment_sum(self_contrib, dst, num_segments=n)
    self_out = self_total / cnt[:, None]
    return agg + self_out
