"""Toy knowledge graph for demos and tests.

Capability parity with reference ``data/knowledge_graph.py:41-105``: the same
8 named nodes (5 people, an organisation, a city, a skill), the same 11
directed edges with 7 unique relation strings, and node features drawn from a
dedicated RNG seeded with 42 so features are identical across runs and
instances.

For bitwise feature parity with the reference we draw the features through
``torch.Generator(42)`` when torch is importable (it is a baked-in dev
dependency of this environment, used *only* here and in the parity tests —
the compute path is pure JAX). Without torch we fall back to a JAX PRNG with
the same seed; shapes and determinism are preserved, exact values differ.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

_NODE_NAMES = (
    "Alice",
    "Bob",
    "Carol",
    "Dave",
    "Eve",
    "Acme Corp",
    "London",
    "Python",
)

# (src, dst, relation text) — mirrors reference data/knowledge_graph.py:59-71.
_EDGE_DATA: Tuple[Tuple[int, int, str], ...] = (
    (0, 1, "is spouse of"),
    (1, 0, "is spouse of"),
    (0, 2, "knows"),
    (1, 3, "works with"),
    (2, 3, "knows"),
    (3, 5, "works at"),
    (0, 5, "works at"),
    (5, 6, "located in"),
    (0, 7, "has skill"),
    (3, 7, "has skill"),
    (2, 4, "is parent of"),
)


def _seeded_features(num_nodes: int, feat_dim: int, seed: int = 42) -> np.ndarray:
    try:
        import torch  # local import: data-layer-only dependency

        gen = torch.Generator()
        gen.manual_seed(seed)
        return torch.randn(num_nodes, feat_dim, generator=gen).numpy()
    except ImportError:  # pragma: no cover - torch is baked into this env
        import jax

        key = jax.random.PRNGKey(seed)
        return np.asarray(jax.random.normal(key, (num_nodes, feat_dim)))


@dataclasses.dataclass
class ToyKnowledgeGraph:
    """A small in-memory knowledge graph for experimentation.

    Attributes:
        feat_dim: node feature dimension (default 16).
        node_names: human-readable node labels.
        edge_data: list of ``(src, dst, relation_text)`` triples.
        node_features: ``[N, feat_dim]`` float32 numpy array (seed-42 fixed).
        edge_index: ``[2, E]`` int64 numpy array (source row, target row).
        edge_texts: length-E list of relation strings.
    """

    feat_dim: int = 16
    node_names: List[str] = dataclasses.field(
        default_factory=lambda: list(_NODE_NAMES)
    )
    edge_data: List[tuple] = dataclasses.field(
        default_factory=lambda: list(_EDGE_DATA)
    )

    def __post_init__(self) -> None:
        self.node_features: np.ndarray = _seeded_features(
            len(self.node_names), self.feat_dim
        )
        self.edge_index: np.ndarray = np.asarray(
            [[e[0] for e in self.edge_data], [e[1] for e in self.edge_data]],
            dtype=np.int64,
        )
        self.edge_texts: List[str] = [e[2] for e in self.edge_data]

    @property
    def num_nodes(self) -> int:
        return len(self.node_names)

    @property
    def num_edges(self) -> int:
        return self.edge_index.shape[1]

    @property
    def relation_types(self) -> List[str]:
        return list(dict.fromkeys(self.edge_texts))

    def __repr__(self) -> str:
        return (
            f"ToyKnowledgeGraph(nodes={self.num_nodes}, "
            f"edges={self.num_edges}, "
            f"relation_types={len(self.relation_types)})"
        )
