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
import numpy as np

Backend = Literal[
    "auto", "dense", "grouped", "gather", "pallas", "pallas_packed",
    "chunked",
]

# Peak-memory budget (floats) for the dense backend's [U, N, d] product;
# past this (or when relations are sparse relative to edges) `auto` prefers
# the grouped ragged backend. Note the dense bank allocates [2U, N, d] with
# possible 2x layout padding — at the xl config (U=237, N=50k, d=64) that
# is 11+ GB, which OOMs a 16 GiB v5e once gradients are live; grouped runs
# the same config at ~880k edges/s fwd+bwd (sort-based scatters dominate
# the backward on TPU — XLA lowers scatter-add to a full key sort).
_DENSE_BUDGET_ELEMENTS = 1 << 30

# Budget (floats) for the grouped backend's [E, d] sorted-edge buffers;
# beyond this the chunked streaming path bounds peak memory instead.
_GROUPED_BUDGET_ELEMENTS = 1 << 28

# Above this [E, d] size the aggregation tail uses two separate scatters
# instead of one fused [E, 2d] concat (peak-memory vs sort-count tradeoff).
_FUSED_TAIL_BUDGET_ELEMENTS = 1 << 28


def _edge_contributions_chunk(h, src_c, dst_c, rel_c, w_msg, w_self, bias,
                              precision):
    """Per-edge contributions for ONE edge chunk via weight gather.

    Peak memory O(chunk · d²) — independent of E and N. Used by the
    ``chunked`` streaming backend for huge full-graph passes.
    """
    msg = (
        jnp.einsum("ed,edo->eo", h[src_c], w_msg[rel_c], precision=precision)
        + bias[rel_c]
    )
    self_contrib = jnp.einsum(
        "ed,edo->eo", h[dst_c], w_self[rel_c], precision=precision
    )
    return msg, self_contrib


def _chunk_pad(arrs, edge_mask, e, dtype, chunk_size):
    n_chunks = -(-e // chunk_size)
    e_pad = n_chunks * chunk_size
    if edge_mask is None:
        edge_mask = jnp.ones(e, dtype)
    if e_pad != e:
        pad = e_pad - e
        arrs = tuple(jnp.pad(a, (0, pad)) for a in arrs)
        edge_mask = jnp.pad(edge_mask, (0, pad))
    return arrs, edge_mask, n_chunks


def _slice_chunk(arr, i, chunk_size):
    return jax.lax.dynamic_slice(arr, (i * chunk_size,), (chunk_size,))


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _mp_chunked(h, src, dst, rel_ids, w_msg, w_self, bias, edge_mask,
                n, chunk_size, precision=None):
    """Streaming message passing: edges processed in fixed chunks with
    accumulators updated in place — peak memory O(chunk·d²) + O(N·d),
    enabling full-graph passes at millions of edges on one chip.

    Custom VJP: the naive reverse-mode of the chunk loop would stack each
    iteration's gathered ``[chunk, d, d]`` weights as scan residuals
    (hundreds of GB at Wikidata5M scale); instead the backward re-streams
    the edges, recomputing chunk terms and accumulating ``dh``, ``dW``,
    ``dbias`` in O(chunk·d²) transients.

    ``n`` and ``chunk_size`` are static; integer edge arrays and the mask
    receive zero cotangents (graph structure is not differentiated).
    """
    out, _ = _mp_chunked_fwd_impl(
        h, src, dst, rel_ids, w_msg, w_self, bias, edge_mask, n, chunk_size,
        precision,
    )
    return out


def _mp_chunked_fwd_impl(h, src, dst, rel_ids, w_msg, w_self, bias,
                         edge_mask, n, chunk_size, precision):
    e = src.shape[0]
    d_out = w_msg.shape[-1]
    (src_p, dst_p, rel_p), mask_p, n_chunks = _chunk_pad(
        (src, dst, rel_ids), edge_mask, e, h.dtype, chunk_size
    )

    def body(i, carry):
        agg, selft, cnt = carry
        src_c = _slice_chunk(src_p, i, chunk_size)
        dst_c = _slice_chunk(dst_p, i, chunk_size)
        rel_c = _slice_chunk(rel_p, i, chunk_size)
        mask_c = _slice_chunk(mask_p, i, chunk_size)
        msg, selfc = _edge_contributions_chunk(
            h, src_c, dst_c, rel_c, w_msg, w_self, bias, precision
        )
        # Accumulators are f32 even in bf16 speed mode (per-chunk upcast).
        agg = agg.at[dst_c].add((msg * mask_c[:, None]).astype(jnp.float32))
        selft = selft.at[dst_c].add(
            (selfc * mask_c[:, None]).astype(jnp.float32)
        )
        cnt = cnt.at[dst_c].add(mask_c.astype(jnp.float32))
        return agg, selft, cnt

    agg = jnp.zeros((n, d_out), jnp.float32)
    selft = jnp.zeros((n, d_out), jnp.float32)
    cnt = jnp.zeros((n,), jnp.float32)
    agg, selft, cnt = jax.lax.fori_loop(0, n_chunks, body, (agg, selft, cnt))
    cnt = jnp.maximum(cnt, 1.0)
    out = (agg + selft) / cnt[:, None]
    return out, cnt


def _mp_chunked_fwd(h, src, dst, rel_ids, w_msg, w_self, bias, edge_mask,
                    n, chunk_size, precision):
    out, cnt = _mp_chunked_fwd_impl(
        h, src, dst, rel_ids, w_msg, w_self, bias, edge_mask, n, chunk_size,
        precision,
    )
    return out, (h, src, dst, rel_ids, w_msg, w_self, bias, edge_mask, cnt)


def _mp_chunked_bwd(n, chunk_size, precision, residuals, g):
    h, src, dst, rel_ids, w_msg, w_self, bias, edge_mask, cnt = residuals
    e = src.shape[0]
    u, d_in, d_out = w_msg.shape
    (src_p, dst_p, rel_p), mask_p, n_chunks = _chunk_pad(
        (src, dst, rel_ids), edge_mask, e, h.dtype, chunk_size
    )
    g_over_cnt = g / cnt[:, None]  # [N, d_out]

    def body(i, carry):
        dh, dw_msg, dw_self, dbias = carry
        src_c = _slice_chunk(src_p, i, chunk_size)
        dst_c = _slice_chunk(dst_p, i, chunk_size)
        rel_c = _slice_chunk(rel_p, i, chunk_size)
        mask_c = _slice_chunk(mask_p, i, chunk_size)
        ge = g_over_cnt[dst_c] * mask_c[:, None]  # [chunk, d_out] f32
        wm_c = w_msg[rel_c]  # [chunk, d_in, d_out]
        ws_c = w_self[rel_c]
        x_src = h[src_c]  # [chunk, d_in]
        x_dst = h[dst_c]
        # dh contributions (accumulated f32 regardless of storage dtype).
        dh = dh.at[src_c].add(
            jnp.einsum("eo,edo->ed", ge, wm_c, precision=precision).astype(
                jnp.float32
            )
        )
        dh = dh.at[dst_c].add(
            jnp.einsum("eo,edo->ed", ge, ws_c, precision=precision).astype(
                jnp.float32
            )
        )
        # dW / dbias via relation-segment accumulation within the chunk.
        dw_msg = dw_msg + jax.ops.segment_sum(
            jnp.einsum("ed,eo->edo", x_src, ge, precision=precision).astype(
                jnp.float32
            ),
            rel_c, num_segments=u,
        )
        dw_self = dw_self + jax.ops.segment_sum(
            jnp.einsum("ed,eo->edo", x_dst, ge, precision=precision).astype(
                jnp.float32
            ),
            rel_c, num_segments=u,
        )
        dbias = dbias + jax.ops.segment_sum(ge, rel_c, num_segments=u)
        return dh, dw_msg, dw_self, dbias

    dh = jnp.zeros(h.shape, jnp.float32)
    dw_msg = jnp.zeros(w_msg.shape, jnp.float32)
    dw_self = jnp.zeros(w_self.shape, jnp.float32)
    dbias = jnp.zeros(bias.shape, jnp.float32)
    dh, dw_msg, dw_self, dbias = jax.lax.fori_loop(
        0, n_chunks, body, (dh, dw_msg, dw_self, dbias)
    )
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    dmask = (
        None if edge_mask is None else jnp.zeros_like(edge_mask)
    )
    return (dh.astype(h.dtype), f0(src), f0(dst), f0(rel_ids),
            dw_msg.astype(w_msg.dtype), dw_self.astype(w_self.dtype),
            dbias.astype(bias.dtype), dmask)


_mp_chunked.defvjp(_mp_chunked_fwd, _mp_chunked_bwd)


def _edge_contributions_dense(h, src, dst, rel_ids, w_msg, w_self, bias, precision):
    """Per-edge (message, self) contributions via the all-relations product.

    HW[u] = H @ W[u] is a single ``[U]``-batched dense matmul (MXU-resident);
    each edge then gathers one d-vector instead of one d×d matrix.
    """
    u = w_msg.shape[0]
    # One [2U]-batched MXU product covers both weight banks (identical
    # per-slice numerics to two separate einsums; halves launch overhead).
    hw = jnp.einsum(
        "nd,udo->uno", h, jnp.concatenate([w_msg, w_self]), precision=precision
    )  # [2U, N, d_out]
    msg = hw[rel_ids, src] + bias[rel_ids]  # [E, d_out]
    self_contrib = hw[rel_ids + u, dst]  # [E, d_out]
    return msg, self_contrib


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ragged_transform(x, w, group_sizes, precision):
    """``out[e] = x[e] @ w[g(e)]`` for relation-sorted rows — one ragged_dot.

    Custom VJP because XLA's autodiff of ``ragged_dot`` lowers the weight
    gradient pathologically on this stack (measured 1.2 s/step at the xl
    config vs 64 ms forward); both cotangents are expressible as O(E·d²)
    ragged contractions:

        dx = ragged_dot(g, wᵀ)                          (same cost as fwd)
        dw = ragged_dot_general(x, g, ragged-contract)   ([U, d_in, d_out])
    """
    # bf16 operands (speed mode) are single-pass native; a HIGHEST request
    # on them is rejected by the Mosaic lowering of ragged_dot on TPU
    # ("Bad lhs type" — fp32 contract precision over bf16 vectors).
    if x.dtype == jnp.bfloat16:
        precision = None
    return jax.lax.ragged_dot(x, w, group_sizes, precision=precision)


def _ragged_transform_fwd(x, w, group_sizes, precision):
    return _ragged_transform(x, w, group_sizes, precision), (x, w, group_sizes)


def _ragged_transform_bwd(precision, residuals, g):
    x, w, group_sizes = residuals
    if x.dtype == jnp.bfloat16:
        precision = None
    dx = jax.lax.ragged_dot(
        g, jnp.swapaxes(w, 1, 2), group_sizes, precision=precision
    )
    dn = jax.lax.RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((0,), (0,)), ((), ())),
        lhs_ragged_dimensions=[0],
        rhs_group_dimensions=[],
    )
    dw = jax.lax.ragged_dot_general(x, g, group_sizes, dn, precision=precision)
    dgs = np.zeros(group_sizes.shape, dtype=jax.dtypes.float0)
    return dx, dw, dgs


_ragged_transform.defvjp(_ragged_transform_fwd, _ragged_transform_bwd)


def _edge_contributions_grouped(h, src, dst, rel_ids, w_msg, w_self, bias, precision,
                                rel_sorted=False, sort_plan=None):
    """Per-edge contributions via relation-grouped ragged matmul.

    Sorts edges by relation id (stable, in-jit), then runs
    ``jax.lax.ragged_dot`` — the MoE-style grouped-matmul primitive — so
    every edge costs exactly one ``[d_in] @ [d_in, d_out]`` row-matmul
    against its own relation's weights: O(E·d²) FLOPs, versus the dense
    backend's O(U·N·d²) all-relations product. Wins when the graph is
    relation-sparse (E ≪ U·N), e.g. the FB15k-237-scale config
    (U=237, N=50k, E=1M → 12× fewer FLOPs).
    """
    u = w_msg.shape[0]
    if sort_plan is not None and rel_sorted:
        # Fully sort-free path: group sizes are host-precomputed (an in-jit
        # bincount is itself a scatter → device sort), and every gather
        # routes its backward through the plan's permutations so the
        # cotangent scatters become sorted-hint segment-sums
        # (ops/segment.py). Zero in-jit sorts, forward or backward.
        from graph_hypernetwork_forge_tpu.ops.segment import (
            take_rows_pair,
            take_rows_sorted,
        )

        n = h.shape[0]
        group_sizes = sort_plan.rel_counts[:u]
        h_src, h_dst = take_rows_pair(
            n, h, src, dst,
            sort_plan.src_perm, sort_plan.src_sorted, sort_plan.src_splits,
            sort_plan.dst_perm, sort_plan.dst_sorted, sort_plan.dst_splits,
        )
        # rel_ids are already non-decreasing in the rel-sorted layout, so
        # the bias cotangent needs no re-permute (perm_to_sorted=None).
        bias_e = take_rows_sorted(
            u, bias, rel_ids, None, rel_ids, sort_plan.rel_splits
        )
        msg = _ragged_transform(h_src, w_msg, group_sizes, precision) + bias_e
        self_c = _ragged_transform(h_dst, w_self, group_sizes, precision)
        return msg, self_c
    group_sizes = jnp.bincount(rel_ids, length=u).astype(jnp.int32)
    if rel_sorted:
        # Edges are already relation-sorted (host-side layout,
        # ``encode_graph(sort_by_relation=True)``): no in-jit argsort, no
        # unsort permutation — each of those lowers to a device sort.
        msg = (
            _ragged_transform(h[src], w_msg, group_sizes, precision)
            + bias[rel_ids]
        )
        self_c = _ragged_transform(h[dst], w_self, group_sizes, precision)
        return msg, self_c
    order = jnp.argsort(rel_ids, stable=True)
    rel_s = rel_ids[order]
    msg_s = (
        _ragged_transform(h[src[order]], w_msg, group_sizes, precision)
        + bias[rel_s]
    )
    self_s = _ragged_transform(h[dst[order]], w_self, group_sizes, precision)
    # Unsort back to the caller's edge order (inverse permutation scatter).
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return msg_s[inv], self_s[inv]


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


def _pick_backend(
    backend: Backend, num_nodes: int, num_rel: int, num_edges: int,
    d_out: int, rel_sorted: bool = False,
):
    if backend != "auto":
        return backend
    # Three regimes (flops/memory tradeoff):
    # - dense: O(U·N·d²) flops, materializes [2U, N, d]. Only wins on
    #   UNSORTED layouts where grouped would pay per-layer device sorts.
    # - grouped: O(E·d²) flops via ragged_dot over relation-sorted edges.
    #   With a presorted layout there is no sort overhead and grouped
    #   dominates: measured 3.9x over dense at N=10k/E=100k/U=50/d=64
    #   (36 vs 142 ms/step) and within noise at the tiny bench config.
    # - chunked: O(chunk·d²) peak memory streaming; the huge-E fallback.
    if num_edges * d_out > _GROUPED_BUDGET_ELEMENTS:
        if num_rel * num_nodes * d_out <= _DENSE_BUDGET_ELEMENTS:
            return "dense"
        return "chunked"
    if rel_sorted:
        return "grouped"
    if num_rel * num_nodes * d_out > _DENSE_BUDGET_ELEMENTS:
        return "grouped"
    if num_rel * num_nodes > 8 * num_edges:
        return "grouped"
    return "dense"


def resolve_backend(
    backend: Backend, num_nodes: int, num_rel: int, num_edges: int,
    d_in: int, d_out: int, *, rel_sorted: bool, group_padded: bool,
    has_sort_plan: bool, platform: str,
) -> str:
    """Full backend resolution incl. the TPU kernel upgrades (pure —
    unit-testable without a device; ``platform`` is injected).

    ``auto`` → the FLOP/memory-regime pick (:func:`_pick_backend`), then:
    - ``pallas`` on TPU rel-sorted group-padded layouts at d % 128 == 0
      (streaming kernel measured 1.4-1.7x over ragged_dot);
    - ``pallas_packed`` on TPU rel-sorted group-padded d=64 layouts with a
      SortPlan at >= 16,384 rows (pair-packed rows through the same
      kernel — measured crossover sweep packed_crossover_r5.json; xl 191
      vs 287 ms in r4, packed wins 16k-65k, parity band 131k-524k; below
      the gate ragged wins, 3.9 vs 8.0 ms at bench config E=10k).
    """
    chosen = _pick_backend(
        backend, num_nodes, num_rel, num_edges, d_out, rel_sorted=rel_sorted
    )
    if (
        chosen == "grouped"
        and backend == "auto"
        and rel_sorted
        and group_padded
        and platform == "tpu"
        and d_in % 128 == 0
        and d_out % 128 == 0
    ):
        chosen = "pallas"
    if (
        chosen == "grouped"
        and backend == "auto"
        and rel_sorted
        and group_padded
        and has_sort_plan
        and platform == "tpu"
        and d_in == 64
        and d_out == 64
        and num_edges >= 16_384
    ):
        # d=64 never reaches the 128-lane Mosaic kernel directly (sub-lane
        # blocks wedge this stack's compiler) and ragged_dot is measured
        # far off its d=128 efficiency. Gate from the measured crossover
        # (benchmarks/results/packed_crossover_r5.json): packed wins from
        # E=16k (4.77 vs 5.32 ms) through 65k (5.17 vs 9.16) and at xl;
        # between 131k-524k the two are within the chip's ±10% band. The
        # r4 gate (65_536) rested on two points; below 16k the bench-
        # config measurement keeps ragged (3.9 vs 8.0 ms at E=10k).
        chosen = "pallas_packed"
    return chosen


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
    rel_sorted: bool = False,
    sort_plan=None,
    group_padded: bool = False,
    compute_dtype=None,
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
        backend: ``auto`` | ``dense`` | ``grouped`` | ``gather`` |
            ``pallas`` | ``chunked``.
        precision: ``jax.lax.Precision`` for the matmuls (``"highest"`` for
            f32-exact parity; ``None``/default is bf16-class on TPU).
        rel_sorted: promise that the edge arrays are already stable-sorted
            by ``rel_ids`` (``encode_graph(sort_by_relation=True)``). Lets
            the grouped backend skip its per-layer device sorts. Passing
            True on unsorted edges produces WRONG results.
        sort_plan: optional host-precomputed
            :class:`~graph_hypernetwork_forge_tpu.data.encoding.SortPlan`
            (``encode_graph(with_sort_plan=True)``). Eliminates every
            remaining in-jit scatter sort: the aggregation tail reduces in
            dst-sorted order via a bijective permute, degree counts and
            ragged group sizes come precomputed, and (with
            ``rel_sorted=True`` on the grouped backend) the backward-pass
            gather cotangents reduce with sorted indices. The plan MUST
            have been built for exactly this edge layout.
        group_padded: promise that each relation group is padded to the
            Pallas tile multiple (``encode_graph(group_pad=GROUP_PAD)``).
            With ``rel_sorted``, lets ``auto`` upgrade the grouped pick to
            the streaming Pallas kernel on TPU at d % 128 == 0 (measured
            1.4-1.7x faster, f32-exact at ``precision="highest"``).
        compute_dtype: ``None``/``"float32"`` (parity mode) or
            ``"bfloat16"`` (speed mode): activations and the generated
            weight banks are stored/moved in bf16 — halving the wire bytes
            of the gathers, streams, and reduction tails that dominate
            these bandwidth-bound steps — while every reduction still
            accumulates in f32 (the CSR kernel natively; XLA fallbacks via
            an upcast fused into the scatter read) and the returned node
            embeddings are f32. Parity gates do not apply in speed mode
            (bf16-class storage rounding, ~4e-3 relative).

    Returns:
        ``[N, d_out]`` updated node embeddings (pre-residual, f32).
    """
    from graph_hypernetwork_forge_tpu.utils.initializers import resolve_precision

    precision = resolve_precision(precision)
    if compute_dtype in ("bfloat16", jnp.bfloat16):
        h = h.astype(jnp.bfloat16)
        w_msg = w_msg.astype(jnp.bfloat16)
        w_self = w_self.astype(jnp.bfloat16)
        bias = bias.astype(jnp.bfloat16)
    n = int(h.shape[0]) if num_nodes is None else num_nodes
    u = int(w_msg.shape[0])
    e = int(src.shape[0])
    chosen = resolve_backend(
        backend, n, u, e, int(w_msg.shape[1]), int(w_msg.shape[2]),
        rel_sorted=rel_sorted, group_padded=group_padded,
        has_sort_plan=sort_plan is not None,
        platform=jax.default_backend(),
    )

    if chosen == "chunked":
        return _mp_chunked(
            h, src, dst, rel_ids, w_msg, w_self, bias, edge_mask, n, 32_768,
            precision,
        )

    if chosen == "pallas":
        d_in, d_out = int(w_msg.shape[1]), int(w_msg.shape[2])
        if jax.default_backend() == "tpu" and (d_in % 128 or d_out % 128):
            # Mosaic compiles sub-lane-width (d < 128) blocks pathologically
            # slowly on this stack; the dense path is faster there anyway.
            chosen = "dense"
        elif not rel_sorted:
            # The streaming kernel's contract is single-relation tiles
            # (group-padded sorted layout, encode_graph(group_pad=...));
            # unsorted edges fall back to the grouped ragged backend.
            chosen = "grouped"

    if chosen == "pallas_packed":
        if (
            int(w_msg.shape[1]) != 64 or int(w_msg.shape[2]) != 64
            or not rel_sorted or not group_padded or sort_plan is None
            or src.shape[0] % 2
        ):
            raise ValueError(
                "backend='pallas_packed' requires d_in == d_out == 64, a "
                "rel-sorted GROUP_PAD-padded layout (even group sizes), "
                "and a SortPlan"
            )
        # The packed kernel's 128-pair tiles span 256 edge rows: every
        # relation-group boundary must be 256-aligned or a tile silently
        # applies its first relation's weights to a second relation's rows.
        # The encode_graph(group_pad=256) path guarantees it; direct
        # callers are checked here whenever the plan still carries host
        # (numpy) arrays — inside jit the boolean contract above is all
        # that can be enforced.
        rs = getattr(sort_plan, "rel_splits", None)
        if isinstance(rs, np.ndarray) and (rs % 256).any():
            raise ValueError(
                "backend='pallas_packed' needs relation groups padded to "
                "a 256-edge multiple (encode_graph(group_pad=256)); got "
                "rel_splits with boundaries not 256-aligned"
            )

    from graph_hypernetwork_forge_tpu.ops.segment import (
        segment_sum,
        sorted_segment_sum_by_plan,
    )

    if chosen == "pallas_packed":
        # Pair-packed d=64 path: two consecutive same-relation edge rows
        # per 128-lane row. Relation groups are GROUP_PAD(=256)-aligned, so
        # pairs never cross a group boundary and the packed group sizes /
        # CSR splits are exact halves (128-aligned — a legal kernel tile).
        # The packed transform X2 @ blockdiag(W, W) reproduces both rows'
        # x @ W exactly (the off-diagonal blocks are zero); the combined
        # [E/2, 128] output reshapes back to [E, 64] contiguously for the
        # unchanged aggregation tail. Autodiff through the blockdiag
        # concat/zeros slices the two diagonal blocks of the kernel's
        # [U, 128, 128] dW cotangent and sums them — no wasted bank grads
        # beyond the kernel's own 2x MAC padding. Semantics preserved:
        # reference per-edge transform models/hypergnn.py:201-204.
        from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
            edge_transform_sorted_combined,
        )
        from graph_hypernetwork_forge_tpu.ops.segment import take_rows_pair

        # Gather table size is h's row count — NOT the aggregation segment
        # count n (they differ in the composed per-shard case, where h is
        # the [local ++ halo] row table but aggregation outputs npp rows).
        x_src, x_dst = take_rows_pair(
            int(h.shape[0]), h, src, dst,
            sort_plan.src_perm, sort_plan.src_sorted, sort_plan.src_splits,
            sort_plan.dst_perm, sort_plan.dst_sorted, sort_plan.dst_splits,
        )
        e_rows = x_src.shape[0]
        x2s = x_src.reshape(e_rows // 2, 128)
        x2d = x_dst.reshape(e_rows // 2, 128)
        rel2 = rel_ids[::2]
        splits2 = (sort_plan.rel_splits // 2).astype(sort_plan.rel_splits.dtype)
        z = jnp.zeros_like(w_msg)
        w2m = jnp.concatenate(
            [jnp.concatenate([w_msg, z], axis=2),
             jnp.concatenate([z, w_msg], axis=2)], axis=1,
        )
        w2s = jnp.concatenate(
            [jnp.concatenate([w_self, z], axis=2),
             jnp.concatenate([z, w_self], axis=2)], axis=1,
        )
        bias2 = jnp.concatenate([bias, bias], axis=-1)
        contrib2 = edge_transform_sorted_combined(
            x2s, x2d, rel2, w2m, w2s, bias2, splits2, 128,
            jax.default_backend() != "tpu", precision,
        )
        contrib = contrib2.reshape(e_rows, 64)
        cnt = jnp.maximum(sort_plan.in_degree[:n], 1.0)[:, None].astype(
            jnp.float32
        )
        if edge_mask is not None:
            contrib = contrib * edge_mask.astype(contrib.dtype)[:, None]
        total = sorted_segment_sum_by_plan(
            contrib, sort_plan.dst_perm, sort_plan.inv_dst_perm,
            sort_plan.dst_sorted, n, sort_plan.dst_splits,
        )
        return total / cnt

    if chosen == "pallas":
        # Combined-output kernel: the tail only ever consumes msg + selfc
        # (out_v = (Σ msg + Σ self)/cnt, reference models/hypergnn.py:
        # 207-230), so the kernel emits the sum directly — half the output
        # writes, and the reduction below runs at [E, d] instead of the
        # [E, 2d] concat. Numerics differ from the two-stream form only by
        # reduction order and a single (vs two) final divide — the same
        # error class as any reduction reorder, inside the 3e-5 parity gate.
        from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
            edge_contributions_pallas_combined,
        )

        contrib = edge_contributions_pallas_combined(
            h, src, dst, rel_ids, w_msg, w_self, bias, sort_plan=sort_plan,
            interpret=jax.default_backend() != "tpu", precision=precision,
        )
        if sort_plan is not None:
            cnt = jnp.maximum(sort_plan.in_degree[:n], 1.0)[:, None].astype(
                jnp.float32
            )
        else:
            cnt = segment_sum(
                jnp.ones(dst.shape, jnp.float32)
                if edge_mask is None else edge_mask,
                dst,
                num_segments=n,
            )
            cnt = jnp.maximum(cnt, 1.0)[:, None]
        if edge_mask is not None:
            contrib = contrib * edge_mask.astype(contrib.dtype)[:, None]
        if sort_plan is not None:
            total = sorted_segment_sum_by_plan(
                contrib, sort_plan.dst_perm, sort_plan.inv_dst_perm,
                sort_plan.dst_sorted, n, sort_plan.dst_splits,
            )
        else:
            total = segment_sum(contrib, dst, num_segments=n)
        return total / cnt

    if chosen == "dense":
        msg, self_contrib = _edge_contributions_dense(
            h, src, dst, rel_ids, w_msg, w_self, bias, precision
        )
    elif chosen == "grouped":
        msg, self_contrib = _edge_contributions_grouped(
            h, src, dst, rel_ids, w_msg, w_self, bias, precision,
            rel_sorted=rel_sorted, sort_plan=sort_plan,
        )
    else:
        msg, self_contrib = _edge_contributions_gather(
            h, src, dst, rel_ids, w_msg, w_self, bias, precision
        )

    if sort_plan is not None:
        # Sort-free tail: degree counts come precomputed and the reduction
        # runs in dst-sorted order via a bijective permute + sorted-hint
        # segment-sum (backward is gather-only); no in-jit key sort.
        cnt = jnp.maximum(sort_plan.in_degree[:n], 1.0)[:, None].astype(
            jnp.float32
        )
    else:
        cnt = segment_sum(
            jnp.ones(dst.shape, jnp.float32)
            if edge_mask is None else edge_mask,
            dst,
            num_segments=n,
        )
        cnt = jnp.maximum(cnt, 1.0)[:, None]
    # Two true divides (not a shared reciprocal) to match the reference's
    # rounding: agg/cnt + self/cnt, reference models/hypergnn.py:213,220,230.
    d_out = msg.shape[-1]
    if msg.size > _FUSED_TAIL_BUDGET_ELEMENTS:
        # Huge-E: two separate [E, d] scatters. The fused [E, 2d] concat
        # keeps three ~[E, 2d] buffers live through the backward (measured
        # 15 GB at E=10M, d=64 — an OOM); separate chains let the scheduler
        # sequence them. Columns reduce independently so numerics match.
        if edge_mask is not None:
            msg = msg * edge_mask.astype(msg.dtype)[:, None]
            self_contrib = self_contrib * edge_mask.astype(
                self_contrib.dtype
            )[:, None]
        if sort_plan is not None:
            total_msg = sorted_segment_sum_by_plan(
                msg, sort_plan.dst_perm, sort_plan.inv_dst_perm,
                sort_plan.dst_sorted, n, sort_plan.dst_splits,
            )
            total_self = sorted_segment_sum_by_plan(
                self_contrib, sort_plan.dst_perm, sort_plan.inv_dst_perm,
                sort_plan.dst_sorted, n, sort_plan.dst_splits,
            )
        else:
            total_msg = segment_sum(msg, dst, num_segments=n)
            total_self = segment_sum(self_contrib, dst, num_segments=n)
        return total_msg / cnt + total_self / cnt
    # Single fused scatter: [E, 2·d_out] segment-sum covers both the message
    # and self-loop accumulators in one pass (one key sort instead of two).
    both = jnp.concatenate([msg, self_contrib], axis=-1)
    if edge_mask is not None:
        both = both * edge_mask.astype(both.dtype)[:, None]
    if sort_plan is not None:
        total = sorted_segment_sum_by_plan(
            both, sort_plan.dst_perm, sort_plan.inv_dst_perm,
            sort_plan.dst_sorted, n, sort_plan.dst_splits,
        )
    else:
        total = segment_sum(both, dst, num_segments=n)
    return total[:, :d_out] / cnt + total[:, d_out:] / cnt
