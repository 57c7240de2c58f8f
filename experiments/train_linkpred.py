#!/usr/bin/env python3
"""Link-prediction training harness (full-graph or neighbor-sampled).

The benchmark-scale equivalent of the reference's 20-step demo loop
(``demo.py:77-101``), for the BASELINE.json configs: FB15k-237-like and
WN18RR-zero-shot-like synthetic KGs, with filtered MRR/Hits@K evaluation —
including relations never seen in training (weights generated purely from
text).

Usage::

    python experiments/train_linkpred.py --dataset fb15k237 --scale 0.05 \
        --steps 200 --eval-every 50
    python experiments/train_linkpred.py --dataset wn18rr-zeroshot --scale 0.1
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from graph_hypernetwork_forge_tpu.data.datasets import (  # noqa: E402
    fb15k237_like,
    generate_synthetic_kg,
    wn18rr_zero_shot_like,
)
from graph_hypernetwork_forge_tpu.data.encoding import encode_graph  # noqa: E402
from graph_hypernetwork_forge_tpu.models.hypergnn import (  # noqa: E402
    HyperGNNConfig,
    apply_hypergnn,
    init_hypergnn,
)
from graph_hypernetwork_forge_tpu.training.evaluate import (  # noqa: E402
    evaluate_link_prediction,
)
from graph_hypernetwork_forge_tpu.training.train import make_train_step  # noqa: E402
from graph_hypernetwork_forge_tpu.utils.metrics import (  # noqa: E402
    MetricsLogger,
    StdoutWriter,
)


def build_dataset(name: str, scale: float, seed: int):
    import os

    if os.path.isdir(name):
        # A directory of standard triples files (train/valid/test.txt +
        # optional relation_texts.txt): real-benchmark ingestion.
        from graph_hypernetwork_forge_tpu.data.triples import (
            load_triples_dataset,
        )

        return load_triples_dataset(name, seed=seed)
    if name == "fb15k237":
        return fb15k237_like(seed=seed, scale=scale)
    if name == "wn18rr-zeroshot":
        return wn18rr_zero_shot_like(seed=seed, scale=scale)
    if name == "tiny":
        return generate_synthetic_kg(
            200, 1000, 12, seed=seed, zero_shot_fraction=0.2
        )
    raise ValueError(f"unknown dataset {name!r}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--dataset",
        default="tiny",
        help="'tiny', 'fb15k237', 'wn18rr-zeroshot' (synthetic), or a "
             "directory of standard triples files (train/valid/test.txt "
             "+ optional relation_texts.txt) for real benchmarks",
    )
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--hidden-dim", type=int, default=64)
    p.add_argument("--text-dim", type=int, default=64)
    p.add_argument("--num-layers", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument(
        "--lr-schedule", default="constant", choices=["constant", "cosine"],
        help="cosine = linear warmup (10%% of steps) then cosine decay to 0",
    )
    p.add_argument(
        "--num-negatives", type=int, default=1,
        help="corrupted tails per positive (mean hinge over K negatives)",
    )
    p.add_argument(
        "--adv-temp", type=float, default=0.0,
        help="self-adversarial negative temperature (softmax-weighted "
             "hard negatives; requires --num-negatives > 1)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precision", default="highest", choices=["highest", "default"])
    p.add_argument("--checkpoint-dir", default=None)
    args = p.parse_args(argv)

    kg = build_dataset(args.dataset, args.scale, args.seed)
    train_ei, train_texts = kg.split_edges("train")
    test_ei, test_texts = kg.split_edges("test")
    print(
        f"dataset={args.dataset} N={kg.num_nodes} E={kg.num_edges} "
        f"U={len(kg.relation_texts)} train={train_ei.shape[1]} "
        f"test={test_ei.shape[1]} zero_shot_rels={len(kg.zero_shot_relations)}"
    )

    config = HyperGNNConfig(
        text_dim=args.text_dim,
        node_feat_dim=kg.node_features.shape[1],
        hidden_dim=args.hidden_dim,
        num_layers=args.num_layers,
        precision=args.precision,
        rel_sorted=True,  # graphs below are encoded with sort_by_relation
    )
    params = init_hypergnn(config, jax.random.PRNGKey(args.seed))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    print(f"model params: {n_params:,}  devices: {jax.devices()}")

    graph = encode_graph(train_ei, train_texts, kg.num_nodes, sort_by_relation=True)
    feats = jnp.asarray(kg.node_features)
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)

    if args.lr_schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=args.lr,
            warmup_steps=max(1, args.steps // 10),
            decay_steps=max(2, args.steps),
        )
    else:
        lr = args.lr
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(
        config, optimizer, num_negatives=args.num_negatives,
        adversarial_temperature=args.adv_temp,
    )
    logger = MetricsLogger([StdoutWriter(every=max(1, args.eval_every // 5))])

    # Message-passing graph for eval includes test edges (standard
    # transductive protocol); zero-shot relation texts appear here only.
    full_graph = encode_graph(
        kg.edge_index, kg.edge_texts, kg.num_nodes, sort_by_relation=True
    )
    full_arrays = tuple(jnp.asarray(a) for a in full_graph.arrays)

    def evaluate(params):
        embs = apply_hypergnn(config, params, feats, *full_arrays)
        m = evaluate_link_prediction(
            embs, test_ei[0], test_ei[1], filter_edges=kg.edge_index
        )
        if kg.zero_shot_relations:
            zs_texts = {kg.relation_texts[r] for r in kg.zero_shot_relations}
            zs_mask = np.asarray([t in zs_texts for t in test_texts])
            if zs_mask.any():
                zs = evaluate_link_prediction(
                    embs,
                    test_ei[0][zs_mask],
                    test_ei[1][zs_mask],
                    filter_edges=kg.edge_index,
                )
                m.update({f"zero_shot_{k}": v for k, v in zs.items()})
        return m

    rng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.perf_counter()
    edges_done = 0
    for step in range(1, args.steps + 1):
        rng, step_rng = jax.random.split(rng)
        params, opt_state, loss = step_fn(
            params, opt_state, feats, *arrays, step_rng
        )
        edges_done += graph.num_edges
        if step % max(1, args.eval_every // 5) == 0 or step == args.steps:
            dt = time.perf_counter() - t0
            logger.log(
                step,
                loss=float(loss),
                edges_per_s=edges_done / dt if dt > 0 else 0.0,
            )
        if step % args.eval_every == 0 or step == args.steps:
            metrics = evaluate(params)
            print(f"  eval@{step}: " + " ".join(
                f"{k}={v:.4f}" for k, v in metrics.items()))

    if args.checkpoint_dir:
        from graph_hypernetwork_forge_tpu.training.checkpoint import save_checkpoint

        path = save_checkpoint(args.checkpoint_dir, params, opt_state, args.steps)
        print(f"checkpoint saved: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
