#!/usr/bin/env python3
"""Focused xl measurements: the loss stage + the flagship fused steps.

Measures link_prediction_loss_sorted fwd / fwd+bwd at the xl config
(N=50k, E=1M, U=237) for d in {64, 128}, plus the RTT-free fused K=10
full train step on the packed d=64 layout and the d=128 pallas layout —
the two flagship numbers directives r5-1/2 are judged on.

Usage: python benchmarks/loss_stage.py [--out FILE] [--steps-only|--loss-only]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
from graph_hypernetwork_forge_tpu.models.hypergnn import (
    HyperGNNConfig,
    init_hypergnn,
)
from graph_hypernetwork_forge_tpu.training.objectives import (
    link_prediction_loss_sorted,
)
from graph_hypernetwork_forge_tpu.training.train import make_multi_step

N, E, U = 50_000, 1_000_000, 237
K, REPS = 10, 3
LINES = []


def emit(obj):
    s = json.dumps(obj)
    print(s, flush=True)
    LINES.append(s)


def bench_scan(label, fn, *args, reps=REPS, fused=K):
    def prog(*a):
        def body(c, _):
            out = fn(c, *a)
            return jnp.sum(out) * 1e-20, jnp.sum(out)

        _, ys = jax.lax.scan(body, jnp.float32(0.0), length=fused)
        return ys

    g = jax.jit(prog)
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(g(*args))
    dt = 1e3 * (time.perf_counter() - t0) / (reps * fused)
    emit({"stage": label, "ms": round(dt, 3)})


def make_graph(d, group_pad=None):
    rng = np.random.default_rng(0)
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(
        np.int64
    )
    texts = [f"relation type number {i} with descriptive text"
             for i in range(U)]
    etexts = [texts[i] for i in rng.integers(0, U, E)]
    kw = {} if group_pad is None else {"group_pad": group_pad}
    graph = encode_graph(
        ei, etexts, N, sort_by_relation=True, with_sort_plan=True, **kw
    )
    feats = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)
    plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
    return graph, feats, arrays, plan


def main():
    loss_only = "--steps-only" not in sys.argv
    steps_only = "--loss-only" not in sys.argv

    if loss_only:
        for d in (64, 128):
            _, _, arrays, plan = make_graph(d)
            src, dst, rel, mask = arrays[:4]
            rng = np.random.default_rng(1)
            h = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))

            def loss_stage(c, embs):
                return link_prediction_loss_sorted(
                    embs + c, src, dst, plan, jnp.int32(12345),
                    edge_mask=mask,
                )

            bench_scan(f"loss_roll_fwd_d{d}", loss_stage, h)
            bench_scan(
                f"loss_roll_fwd_bwd_d{d}",
                lambda c, e_: jnp.sum(jax.grad(loss_stage, 1)(c, e_)), h,
            )

    if steps_only:
        for d, gp in ((64, 256), (128, 256)):
            graph, feats, arrays, plan = make_graph(d, group_pad=gp)
            config = HyperGNNConfig(
                text_dim=64, node_feat_dim=d, hidden_dim=d, num_layers=2,
                rel_sorted=True, group_padded=True,
            )
            params = init_hypergnn(config, jax.random.PRNGKey(0))
            optimizer = optax.adam(1e-3)
            mstep = make_multi_step(config, optimizer, K, neg_mode="roll")
            o = optimizer.init(params)
            r = jax.random.PRNGKey(2)
            _, _, losses = mstep(params, o, feats, *arrays, r, sort_plan=plan)
            np.asarray(losses)
            t0 = time.perf_counter()
            for _ in range(REPS):
                r, sr = jax.random.split(r)
                _, _, losses = mstep(
                    params, o, feats, *arrays, sr, sort_plan=plan
                )
                np.asarray(losses)
            ms = 1e3 * (time.perf_counter() - t0) / (REPS * K)
            label = "packed" if d == 64 else "pallas"
            emit({
                "stage": f"xl_d{d}_{label}_full_step_fused_k{K}",
                "ms": round(ms, 3),
                "edges_per_s": round(E / (ms / 1e3)),
            })

    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
        with open(out, "w") as f:
            f.write("\n".join(LINES) + "\n")


if __name__ == "__main__":
    main()
