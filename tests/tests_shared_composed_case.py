"""Shared seeded composed-training case for the multi-process tests.

Imported by both the pytest parent (oracle) and the gloo worker processes
so everyone builds bit-identical inputs.
"""

import numpy as np


def build_case():
    import jax

    from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
    from graph_hypernetwork_forge_tpu.models.hypergnn import (
        HyperGNNConfig,
        init_hypergnn,
    )

    rng = np.random.default_rng(17)
    n, e, u, f = 32, 128, 5, 8
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    texts = [f"relation kind {i}" for i in range(u)]
    etexts = [texts[i] for i in rng.integers(0, u, e)]
    graph = encode_graph(ei, etexts, n)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    config = HyperGNNConfig(
        text_dim=16, node_feat_dim=f, hidden_dim=16, num_layers=2
    )
    params = init_hypergnn(config, jax.random.PRNGKey(3))
    return graph, feats, config, params
