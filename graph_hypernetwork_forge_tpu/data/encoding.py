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
) -> EncodedGraph:
    """Build an :class:`EncodedGraph` from raw connectivity + relation strings.

    ``sort_by_relation=True`` stores the edge arrays stable-sorted by
    relation id (a one-time host-side reorder; aggregation semantics are
    edge-order-invariant). This is the layout the ``grouped`` ragged
    backend wants — pair it with ``HyperGNNConfig(rel_sorted=True)`` to
    skip the per-step in-jit argsort and unsort permutation entirely
    (each otherwise lowers to a full device sort per layer on TPU).
    """
    edge_index = np.asarray(edge_index)
    if edge_index.ndim != 2 or edge_index.shape[0] != 2:
        raise ValueError(f"edge_index must be [2, E], got {edge_index.shape}")
    e = edge_index.shape[1]
    if e != len(edge_texts):
        raise ValueError(
            f"edge_index has {e} edges but edge_texts has {len(edge_texts)} entries"
        )

    unique_texts, rel_ids = dedup_texts(edge_texts)
    u = len(unique_texts)
    char_ids, lengths = tokenize_texts(unique_texts)

    e_pad = pad_bucket_edges(e) if pad else max(e, 1)
    u_pad = pad_bucket_relations(u) if pad else max(u, 1)

    src = np.zeros(e_pad, dtype=np.int32)
    dst = np.zeros(e_pad, dtype=np.int32)
    rids = np.zeros(e_pad, dtype=np.int32)
    mask = np.zeros(e_pad, dtype=np.float32)
    src[:e] = edge_index[0]
    dst[:e] = edge_index[1]
    rids[:e] = rel_ids
    mask[:e] = 1.0
    if sort_by_relation:
        order = np.argsort(rids, kind="stable")
        src, dst, rids, mask = src[order], dst[order], rids[order], mask[order]

    cid = np.zeros((u_pad, char_ids.shape[1]), dtype=np.int32)
    lens = np.ones(u_pad, dtype=np.int32)  # padding rows behave like ""
    cid[:u] = char_ids
    lens[:u] = lengths

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
    )
