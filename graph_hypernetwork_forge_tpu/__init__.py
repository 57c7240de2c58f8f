"""Graph Hypernetwork Forge — TPU-native (JAX/XLA/Pallas/pjit) framework.

A brand-new TPU-first implementation of the capabilities of
``danieleschmidt/Graph-Hypernetwork-Forge`` (reference mounted read-only at
``/root/reference``): a hypernetwork generates GNN weight matrices on-the-fly
from text descriptions of relation types, enabling zero-shot message passing
over relation types never seen in training.

Quickstart::

    from graph_hypernetwork_forge_tpu import HyperGNN, ToyKnowledgeGraph

    kg = ToyKnowledgeGraph()
    model = HyperGNN(text_dim=64, node_feat_dim=kg.feat_dim, hidden_dim=32)
    embs = model(kg.node_features, kg.edge_index, kg.edge_texts)  # [N, 32]
    score = model.score_triple(embs[0], embs[1])

Public API parity: ``__all__`` mirrors the reference package export surface
(``graph_hypernetwork_forge/__init__.py:27-31``) plus the TPU-native
training / parallelism subsystems in the submodules.
"""

from graph_hypernetwork_forge_tpu.data.knowledge_graph import ToyKnowledgeGraph
from graph_hypernetwork_forge_tpu.models.hypergnn import HyperGNN
from graph_hypernetwork_forge_tpu.models.weight_generator import WeightGenerator

__version__ = "0.2.0"

__all__ = ["WeightGenerator", "HyperGNN", "ToyKnowledgeGraph"]
