#!/usr/bin/env python3
"""Graph Hypernetwork Forge (TPU-native) — runnable demo.

End-to-end equivalent of the reference ``demo.py:1-159``: build the toy KG,
run an untrained forward pass, train 20 steps of margin-ranking link
prediction, demonstrate zero-shot generalisation to a never-seen relation
type, and exercise the standalone WeightGenerator — all in JAX (runs on TPU
when available, CPU otherwise).

Run::

    python demo.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from graph_hypernetwork_forge_tpu import HyperGNN, ToyKnowledgeGraph, WeightGenerator
from graph_hypernetwork_forge_tpu.training import train


def print_section(title: str) -> None:
    print(f"\n{'=' * 60}")
    print(f"  {title}")
    print("=" * 60)


def main() -> None:
    t0 = time.perf_counter()

    # 1. Build the toy KG -------------------------------------------------
    print_section("Knowledge Graph")
    kg = ToyKnowledgeGraph(feat_dim=16)
    print(kg)
    print(f"\nNodes: {kg.node_names}")
    print("\nEdges (src, dst, relation):")
    for src, dst, rel in kg.edge_data:
        print(f"  {kg.node_names[src]:12s} --[{rel}]--> {kg.node_names[dst]}")
    print(f"\nUnique relation types: {kg.relation_types}")

    # 2. Build the model --------------------------------------------------
    print_section("Model")
    model = HyperGNN(
        text_dim=64,
        node_feat_dim=kg.feat_dim,
        hidden_dim=32,
        num_layers=2,
        dropout=0.0,
    )
    print(f"Backend devices: {jax.devices()}")
    print(f"Total parameters: {model.num_parameters():,}")

    # 3. Forward pass (untrained) -----------------------------------------
    print_section("Forward pass (untrained)")
    node_embs = model(kg.node_features, kg.edge_index, kg.edge_texts)
    print(f"Output shape: {node_embs.shape}  (expected [{kg.num_nodes}, 32])")
    print(f"No NaNs: {not bool(jnp.isnan(node_embs).any())}")
    norms = jnp.linalg.norm(node_embs, axis=1)
    print(f"Output norms: {[round(float(x), 4) for x in norms]}")

    # 4. Quick training loop ----------------------------------------------
    print_section("Quick training demo (20 steps)")
    graph = model.preprocess(kg.edge_index, kg.edge_texts, kg.num_nodes)
    model.params, losses = train(
        model.config,
        model.params,
        kg.node_features,
        graph,
        num_steps=20,
        learning_rate=1e-3,
        log_every=5,
    )

    # 5. Zero-shot: new relation type never seen during training ----------
    print_section("Zero-shot: unseen relation type")
    new_relation = "is colleague of"
    print(f"New relation: '{new_relation}'")
    print(f"Was in training set: {new_relation in kg.relation_types}")

    new_src = np.asarray([1, 2], dtype=np.int64)  # Bob, Carol
    new_dst = np.asarray([2, 0], dtype=np.int64)  # Carol, Alice
    new_edge_index = np.concatenate(
        [kg.edge_index, np.stack([new_src, new_dst])], axis=1
    )
    new_edge_texts = kg.edge_texts + [new_relation, new_relation]

    zs_embs = model(kg.node_features, new_edge_index, new_edge_texts)
    print(f"Output shape with new relation: {zs_embs.shape}")
    print(f"No NaNs: {not bool(jnp.isnan(zs_embs).any())}")
    score = float(model.score_triple(zs_embs[1], zs_embs[2]))
    print(f"Link score Bob→Carol ('{new_relation}'): {score:.4f}")

    # 6. WeightGenerator standalone ---------------------------------------
    print_section("WeightGenerator standalone")
    gen = WeightGenerator(text_dim=64, d_in=32, d_out=32, hidden_dim=128)
    rng = np.random.default_rng(0)
    weights = gen(rng.standard_normal(64).astype(np.float32))
    print(f"Single-relation output keys: {list(weights.keys())}")
    for k, v in weights.items():
        print(f"  {k}: {tuple(v.shape)}")
    batch_weights = gen(rng.standard_normal((5, 64)).astype(np.float32))
    print("Batched output (batch=5):")
    for k, v in batch_weights.items():
        print(f"  {k}: {tuple(v.shape)}")

    print_section("Done ✓")
    print(f"All demos ran successfully in {time.perf_counter() - t0:.2f}s.\n")


if __name__ == "__main__":
    main()
