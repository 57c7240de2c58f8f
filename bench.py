#!/usr/bin/env python3
"""Headline benchmark: HyperGNN fwd+bwd edges/s on the reference bench config.

Config mirrors BASELINE.md's measured reference row: N=1k nodes, E=10k edges,
U=50 unique relation strings, hidden d=64, 2 layers, full-graph margin-ranking
train step (forward + backward + Adam). Reference (torch 2.13 CPU): 3,868
edges/s. Prints ONE JSON line.

Timing protocol: K training steps are fused into ONE XLA program
(``make_multi_step``) and the per-step loss array is fetched to the host
after each call — on this remote-TPU backend a value fetch is the only
reliable synchronization (``block_until_ready`` has been observed not to
wait for remote execution), and the fused program removes per-step dispatch
from the measurement. The reported number is device-bound, steady-state
training throughput with the loss trace as proof of real work.
"""

import json
import os
import sys
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
# K=40 fused steps per program: the host↔TPU fetch round-trip (~31 ms on
# this tunneled stack) is amortized to <1 ms/step; device compute floor is
# ~3.0 ms/step at this config (measured: K=10 → 6.1 ms/step, K=40 → 3.9).
# Compile time scales ~linearly with K (~2-4 min one-time at K=40).
STEPS_PER_CALL = 40
REPS = 5


def build_inputs():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((N_NODES, FEAT_DIM)).astype(np.float32)
    edge_index = np.stack(
        [
            rng.integers(0, N_NODES, size=N_EDGES),
            rng.integers(0, N_NODES, size=N_EDGES),
        ]
    ).astype(np.int64)
    texts = [
        f"relation type number {i} with descriptive text"
        for i in range(N_RELATIONS)
    ]
    edge_texts = [texts[i] for i in rng.integers(0, N_RELATIONS, size=N_EDGES)]
    return feats, edge_index, edge_texts


def main() -> None:
    from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
    from graph_hypernetwork_forge_tpu.models.hypergnn import (
        HyperGNNConfig,
        init_hypergnn,
    )
    from graph_hypernetwork_forge_tpu.training.train import make_multi_step

    # Flagship perf path: relation-sorted edge layout + host-precomputed
    # SortPlan so every scatter in the step lowers sort-free (fwd AND bwd);
    # GHF_BENCH_BACKEND / GHF_BENCH_PLAN=0 override for A/B runs.
    backend = os.environ.get("GHF_BENCH_BACKEND", "auto")
    use_plan = os.environ.get("GHF_BENCH_PLAN", "1") != "0"

    feats, edge_index, edge_texts = build_inputs()
    config = HyperGNNConfig(
        text_dim=TEXT_DIM,
        node_feat_dim=FEAT_DIM,
        hidden_dim=HIDDEN,
        num_layers=LAYERS,
        backend=backend,
        rel_sorted=use_plan,
    )
    params = init_hypergnn(config, jax.random.PRNGKey(0))
    graph = encode_graph(
        edge_index, edge_texts, N_NODES,
        sort_by_relation=use_plan, with_sort_plan=use_plan,
    )
    plan = (
        jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
        if use_plan else None
    )

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step_fn = make_multi_step(config, optimizer, STEPS_PER_CALL)

    feats_j = jnp.asarray(feats)
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)
    rng = jax.random.PRNGKey(1)

    # Warmup / compile; fetch forces execution.
    params, opt_state, losses = step_fn(
        params, opt_state, feats_j, *arrays, rng, sort_plan=plan
    )
    np.asarray(losses)

    t0 = time.perf_counter()
    for _ in range(REPS):
        rng, step_rng = jax.random.split(rng)
        params, opt_state, losses = step_fn(
            params, opt_state, feats_j, *arrays, step_rng, sort_plan=plan
        )
        np.asarray(losses)  # host fetch = true synchronization
    dt = time.perf_counter() - t0

    total_steps = REPS * STEPS_PER_CALL
    edges_per_s = total_steps * N_EDGES / dt
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
