#!/usr/bin/env python3
"""Headline benchmark: HyperGNN fwd+bwd edges/s on the reference bench config.

Config mirrors BASELINE.md's measured reference row: N=1k nodes, E=10k edges,
U=50 unique relation strings, hidden d=64, 2 layers, full-graph margin-ranking
train step (forward + backward + Adam update). Reference (torch 2.13 CPU):
3,868 edges/s. Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

BASELINE_EDGES_PER_S = 3868.0  # reference fwd+bwd, BASELINE.md

N_NODES = 1000
N_EDGES = 10_000
N_RELATIONS = 50
HIDDEN = 64
TEXT_DIM = 64
FEAT_DIM = 64
LAYERS = 2


def build_inputs():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((N_NODES, FEAT_DIM)).astype(np.float32)
    edge_index = np.stack(
        [
            rng.integers(0, N_NODES, size=N_EDGES),
            rng.integers(0, N_NODES, size=N_EDGES),
        ]
    ).astype(np.int64)
    texts = [f"relation type number {i} with descriptive text" for i in range(N_RELATIONS)]
    edge_texts = [texts[i] for i in rng.integers(0, N_RELATIONS, size=N_EDGES)]
    return feats, edge_index, edge_texts


def main() -> None:
    from graph_hypernetwork_forge_tpu.models.hypergnn import (
        HyperGNNConfig,
        init_hypergnn,
    )
    from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
    from graph_hypernetwork_forge_tpu.training.train import make_train_step

    feats, edge_index, edge_texts = build_inputs()
    config = HyperGNNConfig(
        text_dim=TEXT_DIM,
        node_feat_dim=FEAT_DIM,
        hidden_dim=HIDDEN,
        num_layers=LAYERS,
    )
    params = init_hypergnn(config, jax.random.PRNGKey(0))
    graph = encode_graph(edge_index, edge_texts, N_NODES)

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(config, optimizer)

    feats_j = jnp.asarray(feats)
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)
    rng = jax.random.PRNGKey(1)

    # Warmup / compile.
    params, opt_state, loss = step_fn(params, opt_state, feats_j, *arrays, rng)
    jax.block_until_ready(loss)

    n_steps = 50
    t0 = time.perf_counter()
    for i in range(n_steps):
        rng, step_rng = jax.random.split(rng)
        params, opt_state, loss = step_fn(
            params, opt_state, feats_j, *arrays, step_rng
        )
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    steps_per_s = n_steps / dt
    edges_per_s = steps_per_s * N_EDGES
    print(
        json.dumps(
            {
                "metric": "hypergnn_fwd_bwd_edges_per_s",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
