#!/usr/bin/env python3
"""Reference-parity zero-shot quality run: torch reference vs this framework.

Trains the PyTorch reference (``/root/reference``; objective family of
``demo.py:79-98``, scoring ``models/hypergnn.py:304-318``) and this
framework on the IDENTICAL synthetic KG (same numpy arrays, same splits,
same zero-shot relation holdout) with the IDENTICAL protocol:

- uniform corrupted-tail negatives (K per positive), margin-1.0 hinge,
- Adam, constant learning rate, same step count,
- dropout 0.0 in both (removes train-mode rng semantics differences),
- the SAME filtered MRR/Hits@K evaluator
  (:func:`graph_hypernetwork_forge_tpu.training.evaluate.evaluate_link_prediction`)
  on embeddings from a full-graph eval-mode forward.

This settles BASELINE.json's "downstream zero-shot link-prediction accuracy
matches" gate with a side-by-side table (one JSON line per run + aggregate
rows + a final ``side_by_side`` row).

Usage::

    python experiments/parity_zeroshot.py --scale 0.1 --steps 500 \
        --seeds 0,1,2 --negatives 1 --out benchmarks/results/parity_r4.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from graph_hypernetwork_forge_tpu.data.datasets import wn18rr_zero_shot_like


def eval_embs(embs, kg, test_ei, test_texts):
    """Shared filtered evaluator: full test split + zero-shot subset."""
    from graph_hypernetwork_forge_tpu.training.evaluate import (
        evaluate_link_prediction,
    )

    out = {}
    m = evaluate_link_prediction(
        embs, test_ei[0], test_ei[1], filter_edges=kg.edge_index
    )
    out.update({k: round(v, 4) for k, v in m.items()})
    zs_texts = {kg.relation_texts[r] for r in kg.zero_shot_relations}
    zs_mask = np.asarray([t in zs_texts for t in test_texts])
    if zs_mask.any():
        zs = evaluate_link_prediction(
            embs, test_ei[0][zs_mask], test_ei[1][zs_mask],
            filter_edges=kg.edge_index,
        )
        out.update({f"zero_shot_{k}": round(v, 4) for k, v in zs.items()})
    return out


def run_torch(kg, steps, lr, seed, num_negatives):
    """Train the reference implementation on kg's train split."""
    import torch

    sys.path.insert(0, "/root/reference")
    from graph_hypernetwork_forge import HyperGNN  # the torch reference

    torch.manual_seed(seed)
    model = HyperGNN(
        text_dim=64,
        node_feat_dim=kg.node_features.shape[1],
        hidden_dim=64,
        num_layers=2,
        dropout=0.0,
    )
    train_ei, train_texts = kg.split_edges("train")
    feats = torch.from_numpy(kg.node_features)
    ei = torch.from_numpy(np.ascontiguousarray(train_ei))
    src, dst = ei[0], ei[1]
    n = kg.num_nodes
    e = src.shape[0]

    rng = np.random.default_rng(seed + 1)
    optimizer = torch.optim.Adam(model.parameters(), lr=lr)
    t0 = time.perf_counter()
    loss = None
    for _ in range(steps):
        model.train()
        optimizer.zero_grad()
        embs = model(feats, ei, train_texts)
        pos = model.score_triple(embs[src], embs[dst])
        # Uniform corrupted tails — K columns, mean hinge over K (the K=1
        # case is the reference demo's objective with uniform instead of
        # permutation negatives; both frameworks use this same protocol).
        neg_idx = torch.from_numpy(
            rng.integers(0, n, size=(e, num_negatives))
        )
        neg = model.score_triple(
            embs[src][:, None, :].expand(-1, num_negatives, -1),
            embs[neg_idx],
        )
        loss = torch.clamp(1.0 - pos[:, None] + neg, min=0.0).mean()
        loss.backward()
        optimizer.step()
    train_s = time.perf_counter() - t0

    model.eval()
    with torch.no_grad():
        embs = model(
            feats, torch.from_numpy(kg.edge_index), kg.edge_texts
        ).numpy()
    test_ei, test_texts = kg.split_edges("test")
    out = {
        "framework": "torch",
        "seed": seed,
        "steps": steps,
        "num_negatives": num_negatives,
        "final_loss": round(float(loss), 4),
        "train_s": round(train_s, 1),
    }
    out.update(eval_embs(embs, kg, test_ei, test_texts))
    return out


def run_jax(kg, steps, lr, seed, num_negatives):
    """Train this framework — same data, same protocol, same evaluator."""
    import jax
    import jax.numpy as jnp
    import optax

    from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
    from graph_hypernetwork_forge_tpu.models.hypergnn import (
        HyperGNNConfig,
        apply_hypergnn,
        init_hypergnn,
    )
    from graph_hypernetwork_forge_tpu.training.train import make_train_step

    config = HyperGNNConfig(
        text_dim=64, node_feat_dim=kg.node_features.shape[1],
        hidden_dim=64, num_layers=2, dropout=0.0, rel_sorted=True,
    )
    train_ei, train_texts = kg.split_edges("train")
    graph = encode_graph(
        train_ei, train_texts, kg.num_nodes, sort_by_relation=True
    )
    feats = jnp.asarray(kg.node_features)
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)

    params = init_hypergnn(config, jax.random.PRNGKey(seed))
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(config, optimizer, num_negatives=num_negatives)

    rng = jax.random.PRNGKey(seed + 1)
    t0 = time.perf_counter()
    loss = None
    for _ in range(steps):
        rng, sr = jax.random.split(rng)
        params, opt_state, loss = step_fn(params, opt_state, feats, *arrays, sr)
    final_loss = float(loss)
    train_s = time.perf_counter() - t0

    full_graph = encode_graph(
        kg.edge_index, kg.edge_texts, kg.num_nodes, sort_by_relation=True
    )
    embs = np.asarray(apply_hypergnn(
        config, params, feats, *(jnp.asarray(a) for a in full_graph.arrays)
    ))
    test_ei, test_texts = kg.split_edges("test")
    out = {
        "framework": "jax",
        "seed": seed,
        "steps": steps,
        "num_negatives": num_negatives,
        "final_loss": round(final_loss, 4),
        "train_s": round(train_s, 1),
    }
    out.update(eval_embs(embs, kg, test_ei, test_texts))
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scale", type=float, default=0.1)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--negatives", type=int, default=1)
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--frameworks", default="torch,jax")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                   help="JAX platform for the jax leg AND the shared "
                        "evaluator; cpu (default) keeps the run hermetic "
                        "and off the shared TPU queue.")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.platform == "cpu":
        # The axon sitecustomize overrides JAX_PLATFORMS; config wins.
        import jax

        jax.config.update("jax_platforms", "cpu")

    seeds = [int(x) for x in args.seeds.split(",")]
    frameworks = args.frameworks.split(",")
    lines = []

    def emit(obj):
        s = json.dumps(obj)
        print(s, flush=True)
        lines.append(s)
        if args.out:
            with open(args.out, "w") as f:
                f.write("\n".join(lines) + "\n")

    aggs = {}
    for fw in frameworks:
        rows = []
        for seed in seeds:
            kg = wn18rr_zero_shot_like(seed=seed, scale=args.scale)
            runner = run_torch if fw == "torch" else run_jax
            row = runner(kg, args.steps, args.lr, seed, args.negatives)
            row["scale"] = args.scale
            emit(row)
            rows.append(row)
        agg = {"aggregate": True, "framework": fw, "scale": args.scale,
               "steps": args.steps, "num_negatives": args.negatives,
               "n_seeds": len(seeds)}
        for key in ("mrr", "hits@10", "zero_shot_mrr", "zero_shot_hits@10"):
            vals = [r[key] for r in rows if key in r]
            if vals:
                agg[f"{key}_mean"] = round(float(np.mean(vals)), 4)
                agg[f"{key}_std"] = round(float(np.std(vals)), 4)
        emit(agg)
        aggs[fw] = agg

    if len(aggs) == 2:
        t, j = aggs.get("torch"), aggs.get("jax")
        emit({
            "side_by_side": True, "scale": args.scale, "steps": args.steps,
            "num_negatives": args.negatives,
            "torch_zero_shot_mrr": t.get("zero_shot_mrr_mean"),
            "jax_zero_shot_mrr": j.get("zero_shot_mrr_mean"),
            "torch_mrr": t.get("mrr_mean"), "jax_mrr": j.get("mrr_mean"),
            "torch_hits@10": t.get("hits@10_mean"),
            "jax_hits@10": j.get("hits@10_mean"),
        })


if __name__ == "__main__":
    main()
