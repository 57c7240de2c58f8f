"""Data layer: in-memory KGs, host-side graph encoding, synthetic datasets."""

from graph_hypernetwork_forge_tpu.data.encoding import (
    EncodedGraph,
    dedup_texts,
    encode_graph,
)
from graph_hypernetwork_forge_tpu.data.knowledge_graph import ToyKnowledgeGraph

__all__ = ["EncodedGraph", "ToyKnowledgeGraph", "dedup_texts", "encode_graph"]
