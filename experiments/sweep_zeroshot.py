#!/usr/bin/env python3
"""Zero-shot MRR sweep: wn18rr-zeroshot at scale 1.0, multi-seed.

Runs the (num_negatives × seed) grid in ONE process so XLA compiles are
shared across seeds, reports filtered MRR / Hits@K on the full test split
and on the zero-shot-relation subset (relations never seen in training —
weights generated purely from text, reference objective ``demo.py:79-98``),
and prints mean±std aggregates. Writes one JSON line per run plus
aggregate lines.

Usage::

    python experiments/sweep_zeroshot.py [--scale 1.0] [--steps 1500] \
        [--negatives 1,8,32] [--seeds 0,1,2] [--out results.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from graph_hypernetwork_forge_tpu.data.datasets import (
    fb15k237_like,
    wn18rr_zero_shot_like,
)
from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
from graph_hypernetwork_forge_tpu.models.hypergnn import (
    HyperGNNConfig,
    apply_hypergnn,
    init_hypergnn,
)
from graph_hypernetwork_forge_tpu.training.evaluate import (
    evaluate_link_prediction,
)
from graph_hypernetwork_forge_tpu.training.train import make_train_step


def run_one(kg, config, num_negatives, steps, lr, seed, lr_schedule="cosine",
            adv_temp=0.0, weight_decay=0.0, eval_every=0):
    train_ei, train_texts = kg.split_edges("train")
    test_ei, test_texts = kg.split_edges("test")
    graph = encode_graph(
        train_ei, train_texts, kg.num_nodes, sort_by_relation=True
    )
    feats = jnp.asarray(kg.node_features)
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)

    params = init_hypergnn(config, jax.random.PRNGKey(seed))
    if lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=max(1, steps // 10), decay_steps=max(2, steps),
        )
    else:
        sched = lr
    optimizer = (
        optax.adamw(sched, weight_decay=weight_decay)
        if weight_decay > 0.0 else optax.adam(sched)
    )
    opt_state = optimizer.init(params)
    step_fn = make_train_step(
        config, optimizer, num_negatives=num_negatives,
        adversarial_temperature=adv_temp,
    )

    # Best-on-valid model selection: evaluate the valid split every
    # ``eval_every`` steps (embeddings from the TRAIN graph — valid edges
    # never enter message passing) and keep the params with the best
    # filtered valid MRR. Filtering uses train+valid known-true edges.
    valid_ei, _ = kg.split_edges("valid")
    sel_filter = np.concatenate([train_ei, valid_ei], axis=1)
    valid_curve = []
    best = {"step": 0, "valid_mrr": -1.0, "params": None}

    def eval_valid(params, step):
        embs_v = apply_hypergnn(config, params, feats, *arrays)
        mv = evaluate_link_prediction(
            embs_v, valid_ei[0], valid_ei[1], filter_edges=sel_filter
        )
        valid_curve.append({"step": step, "valid_mrr": round(mv["mrr"], 4)})
        if mv["mrr"] > best["valid_mrr"]:
            best.update(
                step=step, valid_mrr=mv["mrr"], params=jax.device_get(params)
            )

    rng = jax.random.PRNGKey(seed + 1)
    t0 = time.perf_counter()
    loss = None
    for s in range(steps):
        rng, sr = jax.random.split(rng)
        params, opt_state, loss = step_fn(params, opt_state, feats, *arrays, sr)
        if eval_every and (s + 1) % eval_every == 0:
            eval_valid(params, s + 1)
    final_loss = float(loss)  # one sync at the end
    train_s = time.perf_counter() - t0

    full_graph = encode_graph(
        kg.edge_index, kg.edge_texts, kg.num_nodes, sort_by_relation=True
    )
    embs = apply_hypergnn(
        config, params, feats, *(jnp.asarray(a) for a in full_graph.arrays)
    )
    out = {
        "num_negatives": num_negatives,
        "seed": seed,
        "steps": steps,
        "lr_schedule": lr_schedule,
        "adv_temp": adv_temp,
        "dropout": config.dropout,
        "weight_decay": weight_decay,
        "final_loss": round(final_loss, 4),
        "train_s": round(train_s, 1),
    }
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
        # Per-relation breakdown: each held-out relation scored separately
        # (weights generated purely from its text — the capability table
        # the aggregate number averages over).
        per_rel = {}
        texts_arr = np.asarray(test_texts, dtype=object)
        for rid in kg.zero_shot_relations:
            t = kg.relation_texts[rid]
            m = texts_arr == t
            if m.any():
                r = evaluate_link_prediction(
                    embs, test_ei[0][m], test_ei[1][m],
                    filter_edges=kg.edge_index,
                )
                per_rel[t] = {
                    "n": int(m.sum()), "mrr": round(r["mrr"], 4),
                    "hits@10": round(r["hits@10"], 4),
                }
        out["zero_shot_per_relation"] = per_rel

    if eval_every and best["params"] is not None:
        # Test metrics for the best-on-valid checkpoint (``sel_*`` keys):
        # the number a deployment would actually ship, vs the final-step
        # numbers above which drift once training overfits.
        out["valid_curve"] = valid_curve
        out["best_step"] = best["step"]
        out["best_valid_mrr"] = round(best["valid_mrr"], 4)
        sel_params = jax.device_put(best["params"])
        sel_embs = apply_hypergnn(
            config, sel_params, feats,
            *(jnp.asarray(a) for a in full_graph.arrays),
        )
        m = evaluate_link_prediction(
            sel_embs, test_ei[0], test_ei[1], filter_edges=kg.edge_index
        )
        out.update({f"sel_{k}": round(v, 4) for k, v in m.items()})
        if zs_mask.any():
            zs = evaluate_link_prediction(
                sel_embs, test_ei[0][zs_mask], test_ei[1][zs_mask],
                filter_edges=kg.edge_index,
            )
            out.update(
                {f"sel_zero_shot_{k}": round(v, 4) for k, v in zs.items()}
            )
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--dataset", default="wn18rr-zeroshot",
                   choices=["wn18rr-zeroshot", "fb15k237"],
                   help="fb15k237 is transductive (no zero-shot holdout): "
                        "the zero_shot_* columns are then absent")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--negatives", default="1,8,32")
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--lr-schedule", default="cosine",
                   choices=["constant", "cosine"])
    p.add_argument("--adv-temp", type=float, default=0.0,
                   help="self-adversarial negative temperature (0 = uniform)")
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--weight-decay", type=float, default=0.0,
                   help="AdamW decoupled weight decay (0 = plain Adam)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="evaluate the valid split every N steps and report "
                        "sel_* test metrics from the best-on-valid params")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) so background "
                        "sweeps never contend for the TPU")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    negatives = [int(x) for x in args.negatives.split(",")]
    seeds = [int(x) for x in args.seeds.split(",")]
    lines = []

    def emit(obj):
        s = json.dumps(obj)
        print(s, flush=True)
        lines.append(s)

    for k in negatives:
        rows = []
        for seed in seeds:
            # Dataset varies with seed too (synthetic): both graph and
            # init randomness contribute to the variance bars.
            maker = (fb15k237_like if args.dataset == "fb15k237"
                     else wn18rr_zero_shot_like)
            kg = maker(seed=seed, scale=args.scale)
            config = HyperGNNConfig(
                text_dim=64, node_feat_dim=kg.node_features.shape[1],
                hidden_dim=64, num_layers=2, rel_sorted=True,
                dropout=args.dropout,
            )
            row = run_one(
                kg, config, k, args.steps, args.lr, seed,
                lr_schedule=args.lr_schedule, adv_temp=args.adv_temp,
                weight_decay=args.weight_decay, eval_every=args.eval_every,
            )
            emit(row)
            rows.append(row)
        agg = {"aggregate": True, "dataset": args.dataset,
               "num_negatives": k,
               "lr_schedule": args.lr_schedule, "steps": args.steps,
               "scale": args.scale, "adv_temp": args.adv_temp,
               "dropout": args.dropout, "weight_decay": args.weight_decay,
               "n_seeds": len(seeds)}
        for key in ("mrr", "hits@10", "zero_shot_mrr", "zero_shot_hits@10",
                    "sel_mrr", "sel_hits@10", "sel_zero_shot_mrr",
                    "sel_zero_shot_hits@10", "best_step"):
            vals = [r[key] for r in rows if key in r]
            if vals:
                agg[f"{key}_mean"] = round(float(np.mean(vals)), 4)
                agg[f"{key}_std"] = round(float(np.std(vals)), 4)
        emit(agg)

    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
