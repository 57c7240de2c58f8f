"""Host-side graph encoding: raw (edge_index, edge_texts) → static-shape arrays.

The reference rebuilds relation dedup + tokenization on every forward call in
Python (``models/hypergnn.py:264-270``). Here this is a one-time host-side
preprocessing step producing an :class:`EncodedGraph` of padded, fixed-shape
int arrays that the jitted compute core consumes directly — relation identity
enters the model *only* through the tokenized text (the zero-shot invariant,
SURVEY.md §3.3).

Padding discipline (see ``utils/shapes.py``): E, U and L are padded to bucket
boundaries; padded edges carry ``edge_mask = 0`` and are excluded from both
message sums and degree counts, padded relations tokenize like the empty
string. This keeps XLA compilation keyed to a small set of shape buckets.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from graph_hypernetwork_forge_tpu.utils.text import tokenize_texts
from graph_hypernetwork_forge_tpu.utils.shapes import (
    pad_bucket_edges,
    pad_bucket_relations,
)


@dataclasses.dataclass(frozen=True)
class SortPlan:
    """Host-precomputed sort permutations enabling sort-free aggregation.

    XLA lowers every unsorted scatter/segment-sum on TPU to a full key sort
    of the edge indices (see ``ops/segment.py``). Graph structure is static
    per run, so these permutations are computed once here and passed into
    jit as plain int32 operands; the compute core then expresses every
    scatter as (bijective gather → sorted-hint segment-sum) with zero
    in-jit sorts, in both the forward and the backward pass.

    All arrays are ``[E_pad]`` except ``in_degree`` (``[N]``, the clamped
    count denominator of reference ``models/hypergnn.py:212-213`` — masked
    padding edges contribute 0) and ``rel_counts`` (``[U_pad]``, the
    ragged_dot group sizes, replacing an in-jit ``bincount`` scatter).

    The ``*_splits`` arrays are CSR row boundaries over the corresponding
    sorted id array (``splits[i] = first row with id >= i``, length
    ``N + 1`` / ``U_pad + 1``). They feed the Pallas CSR segment-sum kernel
    (``ops/pallas/segment_sum.py``): computing them in-jit via
    ``searchsorted`` measures 23 ms at [1M, 50k] on this stack — 4x the
    kernel itself — so like every other sort artifact here they are
    host-precomputed static structure.
    """

    dst_perm: np.ndarray       # stable argsort of dst over the stored layout
    inv_dst_perm: np.ndarray   # inverse permutation of dst_perm
    dst_sorted: np.ndarray     # dst[dst_perm], non-decreasing
    src_perm: np.ndarray       # stable argsort of src over the stored layout
    inv_src_perm: np.ndarray
    src_sorted: np.ndarray     # src[src_perm], non-decreasing
    in_degree: np.ndarray      # [N] float32 masked in-edge count per node
    rel_counts: np.ndarray     # [U_pad] int32 edges per relation (masked
    #                            padding edges counted into relation 0 to
    #                            match the stored layout's rel_ids)
    dst_splits: np.ndarray | None = None  # [N + 1] CSR bounds of dst_sorted
    src_splits: np.ndarray | None = None  # [N + 1] CSR bounds of src_sorted
    rel_splits: np.ndarray | None = None  # [U_pad + 1] CSR bounds of the
    #                            rel-sorted layout's rel_ids (= cumsum of
    #                            rel_counts; valid for the stored layout
    #                            only when it is relation-sorted)


def build_sort_plan(
    src: np.ndarray,
    dst: np.ndarray,
    rel_ids: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    num_rel_pad: int,
) -> SortPlan:
    """Compute the :class:`SortPlan` for one stored edge layout."""
    e = src.shape[0]
    arange = np.arange(e, dtype=np.int32)

    dst_perm = np.argsort(dst, kind="stable").astype(np.int32)
    inv_dst = np.empty(e, dtype=np.int32)
    inv_dst[dst_perm] = arange
    src_perm = np.argsort(src, kind="stable").astype(np.int32)
    inv_src = np.empty(e, dtype=np.int32)
    inv_src[src_perm] = arange

    in_degree = np.zeros(num_nodes, dtype=np.float32)
    np.add.at(in_degree, dst, edge_mask.astype(np.float32))

    rel_counts = np.bincount(rel_ids, minlength=num_rel_pad).astype(np.int32)

    dst_sorted = dst[dst_perm].astype(np.int32)
    src_sorted = src[src_perm].astype(np.int32)
    node_bounds = np.arange(num_nodes + 1, dtype=np.int32)
    rel_splits = np.zeros(num_rel_pad + 1, dtype=np.int32)
    np.cumsum(rel_counts, out=rel_splits[1:])

    return SortPlan(
        dst_perm=dst_perm,
        inv_dst_perm=inv_dst,
        dst_sorted=dst_sorted,
        src_perm=src_perm,
        inv_src_perm=inv_src,
        src_sorted=src_sorted,
        in_degree=in_degree,
        rel_counts=rel_counts,
        dst_splits=np.searchsorted(dst_sorted, node_bounds, side="left").astype(np.int32),
        src_splits=np.searchsorted(src_sorted, node_bounds, side="left").astype(np.int32),
        rel_splits=rel_splits,
    )


def _sort_plan_flatten(p: "SortPlan"):
    return (
        (p.dst_perm, p.inv_dst_perm, p.dst_sorted, p.src_perm,
         p.inv_src_perm, p.src_sorted, p.in_degree, p.rel_counts,
         p.dst_splits, p.src_splits, p.rel_splits),
        None,
    )


def _sort_plan_unflatten(_aux, children):
    return SortPlan(*children)


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(SortPlan, _sort_plan_flatten, _sort_plan_unflatten)


@dataclasses.dataclass(frozen=True)
class EncodedGraph:
    """Fixed-shape device-ready encoding of one graph (or subgraph batch).

    Attributes:
        src, dst: ``[E_pad]`` int32 edge endpoints (padded entries point at 0).
        rel_ids: ``[E_pad]`` int32 relation id per edge into the unique set.
        edge_mask: ``[E_pad]`` float32; 1.0 for real edges, 0.0 for padding.
        char_ids: ``[U_pad, L]`` int32 tokenized unique relation texts.
        text_lengths: ``[U_pad]`` int32 true text lengths (padding rows → 1).
        num_nodes, num_edges, num_relations: true (unpadded) sizes.
        unique_texts: the deduplicated relation strings, first-occurrence
            order (reference ``dict.fromkeys`` semantics,
            ``models/hypergnn.py:264``).
    """

    src: np.ndarray
    dst: np.ndarray
    rel_ids: np.ndarray
    edge_mask: np.ndarray
    char_ids: np.ndarray
    text_lengths: np.ndarray
    num_nodes: int
    num_edges: int
    num_relations: int
    unique_texts: Tuple[str, ...]
    rel_sorted: bool = False
    sort_plan: "SortPlan | None" = None
    # Non-zero when each relation's edge group is padded to a multiple of
    # this tile size (single-relation tiles — the Pallas kernel layout).
    group_pad: int = 0

    @property
    def arrays(self) -> tuple:
        """The jit-traced operands, in a stable order."""
        return (
            self.src,
            self.dst,
            self.rel_ids,
            self.edge_mask,
            self.char_ids,
            self.text_lengths,
        )


def validate_graph_for_config(graph: EncodedGraph, config) -> None:
    """Host-side guard for the layout promises a config makes.

    ``HyperGNNConfig(rel_sorted=True)`` silently produces WRONG results on
    edges that are not relation-sorted (``ragged_dot`` assumes
    group-contiguous rows); this check turns the mismatch into an error at
    step-construction time. Call it wherever an :class:`EncodedGraph` meets
    a config (experiments, benchmarks, entry points).
    """
    if getattr(config, "rel_sorted", False) and not graph.rel_sorted:
        raise ValueError(
            "HyperGNNConfig(rel_sorted=True) requires a relation-sorted edge "
            "layout — build the graph with "
            "encode_graph(..., sort_by_relation=True)"
        )
    if getattr(config, "backend", None) == "pallas" or getattr(
        config, "group_padded", False
    ):
        from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
            GROUP_PAD,
        )

        if not graph.group_pad or graph.group_pad % GROUP_PAD:
            raise ValueError(
                "backend='pallas' / group_padded=True requires the "
                "group-padded sorted edge layout with the kernel tile "
                "dividing the pad — build the graph with encode_graph(..., "
                f"sort_by_relation=True, group_pad={GROUP_PAD}) (got "
                f"group_pad={graph.group_pad}); merely-sorted edges would "
                "silently apply a tile's first relation to all its rows"
            )
    plan = graph.sort_plan
    if plan is not None and plan.dst_perm.shape != graph.dst.shape:
        raise ValueError(
            f"sort_plan was built for {plan.dst_perm.shape[0]} edges but the "
            f"graph stores {graph.dst.shape[0]} — rebuild with "
            "encode_graph(..., with_sort_plan=True)"
        )


def dedup_texts(edge_texts: Sequence[str]) -> Tuple[List[str], np.ndarray]:
    """Order-preserving dedup → (unique_texts, per-edge relation ids).

    First-occurrence order matches reference ``models/hypergnn.py:264-268``.
    Uses the native C++ single-pass implementation when available
    (``native/ghf_native.cpp``); pure-Python fallback otherwise.
    """
    from graph_hypernetwork_forge_tpu.native_bridge import get_native

    native = get_native()
    if native is not None and not isinstance(edge_texts, np.ndarray):
        unique, rel_ids = native.dedup_and_ids(list(edge_texts))
        return unique, rel_ids

    text_to_idx: dict = {}
    rel_ids = np.empty(len(edge_texts), dtype=np.int32)
    for i, t in enumerate(edge_texts):
        idx = text_to_idx.get(t)
        if idx is None:
            idx = len(text_to_idx)
            text_to_idx[t] = idx
        rel_ids[i] = idx
    return list(text_to_idx.keys()), rel_ids


def encode_graph(
    edge_index: np.ndarray,
    edge_texts: Sequence[str],
    num_nodes: int,
    *,
    pad: bool = True,
    sort_by_relation: bool = False,
    with_sort_plan: bool = False,
    group_pad: int = 0,
) -> EncodedGraph:
    """Build an :class:`EncodedGraph` from raw connectivity + relation strings.

    ``sort_by_relation=True`` stores the edge arrays stable-sorted by
    relation id (a one-time host-side reorder; aggregation semantics are
    edge-order-invariant). This is the layout the ``grouped`` ragged
    backend wants — pair it with ``HyperGNNConfig(rel_sorted=True)`` to
    skip the per-step in-jit argsort and unsort permutation entirely
    (each otherwise lowers to a full device sort per layer on TPU).

    ``with_sort_plan=True`` additionally precomputes the :class:`SortPlan`
    (dst/src sort permutations, in-degrees, relation group sizes) that the
    compute core uses to eliminate every remaining in-jit scatter sort —
    pass ``graph.sort_plan`` into the model/train step alongside
    ``graph.arrays``.

    ``group_pad=T`` (requires ``sort_by_relation``) pads each relation's
    edge group with masked rows (carrying the group's relation id) to a
    multiple of ``T``, so every ``T``-row tile of the edge axis contains a
    single relation — the layout contract of the Pallas streaming kernel
    (``ops/pallas/edge_transform.py``). Typical overhead: ``U·T/2`` extra
    masked rows (~3% at U=237, T=256, E=1M). Implies the edge bucket
    padding (the group padding IS the static-shape discipline).
    """
    edge_index = np.asarray(edge_index)
    if edge_index.ndim != 2 or edge_index.shape[0] != 2:
        raise ValueError(f"edge_index must be [2, E], got {edge_index.shape}")
    e = edge_index.shape[1]
    if e != len(edge_texts):
        raise ValueError(
            f"edge_index has {e} edges but edge_texts has {len(edge_texts)} entries"
        )

    if group_pad and not sort_by_relation:
        raise ValueError("group_pad requires sort_by_relation=True")

    unique_texts, rel_ids = dedup_texts(edge_texts)
    u = len(unique_texts)
    char_ids, lengths = tokenize_texts(unique_texts)

    u_pad = pad_bucket_relations(u) if pad else max(u, 1)

    if group_pad:
        # Group-padded layout: each relation's (stable-ordered) edges start
        # at a tile-aligned offset; pad rows carry the group's relation id
        # with mask 0, so every group_pad-row tile is single-relation.
        g = int(group_pad)
        counts = np.bincount(rel_ids, minlength=u_pad) if e else np.zeros(
            u_pad, dtype=np.int64
        )
        padded = ((counts + g - 1) // g) * g
        if padded.sum() == 0:
            padded[u_pad - 1] = g
        offsets = np.concatenate([[0], np.cumsum(padded)[:-1]])
        e_pad = int(padded.sum())
        src = np.zeros(e_pad, dtype=np.int32)
        dst = np.zeros(e_pad, dtype=np.int32)
        mask = np.zeros(e_pad, dtype=np.float32)
        rids = np.repeat(
            np.arange(u_pad, dtype=np.int32), padded
        )  # non-decreasing incl. pad rows
        if e:
            order = np.argsort(rel_ids, kind="stable")
            sorted_rel = rel_ids[order]
            group_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
            within = np.arange(e) - group_start[sorted_rel]
            pos = offsets[sorted_rel] + within
            src[pos] = edge_index[0][order]
            dst[pos] = edge_index[1][order]
            mask[pos] = 1.0
    else:
        e_pad = pad_bucket_edges(e) if pad else max(e, 1)
        src = np.zeros(e_pad, dtype=np.int32)
        dst = np.zeros(e_pad, dtype=np.int32)
        rids = np.zeros(e_pad, dtype=np.int32)
        mask = np.zeros(e_pad, dtype=np.float32)
        src[:e] = edge_index[0]
        dst[:e] = edge_index[1]
        rids[:e] = rel_ids
        mask[:e] = 1.0
        if sort_by_relation:
            from graph_hypernetwork_forge_tpu.native_bridge import get_native

            native = get_native()
            if native is not None:
                # Counting sort in C++ (stable, O(E + U)) — faster than
                # argsort at multi-million-edge scale.
                order = native.sort_by_relation(rids, u_pad)
            else:
                order = np.argsort(rids, kind="stable")
            src, dst, rids, mask = (
                src[order], dst[order], rids[order], mask[order]
            )

    cid = np.zeros((u_pad, char_ids.shape[1]), dtype=np.int32)
    lens = np.ones(u_pad, dtype=np.int32)  # padding rows behave like ""
    cid[:u] = char_ids
    lens[:u] = lengths

    plan = (
        build_sort_plan(src, dst, rids, mask, int(num_nodes), u_pad)
        if with_sort_plan
        else None
    )

    return EncodedGraph(
        src=src,
        dst=dst,
        rel_ids=rids,
        edge_mask=mask,
        char_ids=cid,
        text_lengths=lens,
        num_nodes=int(num_nodes),
        num_edges=e,
        num_relations=u,
        unique_texts=tuple(unique_texts),
        rel_sorted=sort_by_relation,
        sort_plan=plan,
        group_pad=int(group_pad),
    )
