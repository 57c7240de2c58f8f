#!/usr/bin/env python3
"""Decompose the xl (N=50k, E=1M, U=237, d=64) train-step time by stage.

The full fwd+bwd step measured 293 ms (benchmarks/scaling.py); this
microbench times each pipeline stage in isolation — scan-fused K
iterations per program with a carry perturbation to defeat CSE, host fetch
as the only reliable sync on this stack — so optimization effort goes to
the real bottleneck instead of a guess.

Stages: relation-grouped contributions (ragged_dot fwd / fwd+bwd with the
custom VJP), the sort-free gathers (take_rows_sorted fwd / fwd+bwd), the
sorted-hint aggregation tail, the rolled-negative loss, and the end-to-end
fwd / fwd+bwd for reference.

Prints one JSON line per stage.
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
    apply_hypergnn,
    init_hypergnn,
)
from graph_hypernetwork_forge_tpu.ops.message_passing import (
    _edge_contributions_grouped,
)
from graph_hypernetwork_forge_tpu.ops.segment import (
    sorted_segment_sum_by_plan,
    take_rows_sorted,
)
from graph_hypernetwork_forge_tpu.training.train import make_train_step

import os

N, E, U, D = 50_000, 1_000_000, 237, int(os.environ.get("GHF_D", "64"))
K = 10
REPS = 3


STAGE_MS = {}


def bench(label, fn, *args):
    def prog(*a):
        def body(c, _):
            out = fn(c, *a)
            return jnp.sum(out) * 1e-20, jnp.sum(out)

        _, ys = jax.lax.scan(body, jnp.float32(0.0), length=K)
        return ys

    g = jax.jit(prog)
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.asarray(g(*args))
    dt = (time.perf_counter() - t0) / (REPS * K)
    STAGE_MS[label] = dt * 1e3
    print(json.dumps({"stage": label, "ms": round(dt * 1e3, 3)}), flush=True)


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(
        np.int64
    )
    texts = [f"relation type number {i} with descriptive text" for i in range(U)]
    etexts = [texts[i] for i in rng.integers(0, U, E)]
    graph = encode_graph(
        ei, etexts, N, sort_by_relation=True, with_sort_plan=True
    )
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)
    src, dst, rel, mask = arrays[:4]
    plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
    u_pad = graph.char_ids.shape[0]
    h = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    w_msg = jnp.asarray(
        0.01 * rng.standard_normal((u_pad, D, D)).astype(np.float32)
    )
    w_self = jnp.asarray(
        0.01 * rng.standard_normal((u_pad, D, D)).astype(np.float32)
    )
    bias = jnp.asarray(0.01 * rng.standard_normal((u_pad, D)).astype(np.float32))
    x_edge = jnp.asarray(
        rng.standard_normal((src.shape[0], 2 * D)).astype(np.float32)
    )

    # 1. Contributions: ragged_dot fwd and fwd+bwd (custom VJP).
    def contrib(c, h, w_msg, w_self, bias):
        m, s = _edge_contributions_grouped(
            h + c, src, dst, rel, w_msg, w_self, bias,
            jax.lax.Precision.HIGHEST, rel_sorted=True, sort_plan=plan,
        )
        return jnp.sum(m) + jnp.sum(s)

    bench("contrib_fwd", lambda c, *a: contrib(c, *a), h, w_msg, w_self, bias)

    def contrib_grad(c, h, w_msg, w_self, bias):
        g = jax.grad(contrib, argnums=(1, 2, 3, 4))(c, h, w_msg, w_self, bias)
        return sum(jnp.sum(x) for x in g)

    bench("contrib_fwd_bwd", contrib_grad, h, w_msg, w_self, bias)

    # 2. Sort-free gather (take_rows_sorted) fwd and fwd+bwd.
    def take(c, h):
        return jnp.sum(
            take_rows_sorted(
                N, h + c, src, plan.src_perm, plan.src_sorted,
                plan.src_splits,
            )
        )

    bench("take_rows_fwd", take, h)
    bench("take_rows_fwd_bwd", lambda c, h: jnp.sum(jax.grad(take, 1)(c, h)), h)

    # 3. Aggregation tail: sorted-hint [E, 2d] segment sum fwd and fwd+bwd.
    def tail(c, x):
        return jnp.sum(
            sorted_segment_sum_by_plan(
                x + c, plan.dst_perm, plan.inv_dst_perm, plan.dst_sorted, N,
                plan.dst_splits,
            )
        )

    bench("agg_tail_fwd", tail, x_edge)
    bench("agg_tail_fwd_bwd", lambda c, x: jnp.sum(jax.grad(tail, 1)(c, x)), x_edge)

    # 4. Generator heads + text encoder (per layer; the summary multiplies
    # by num_layers) and the [N, d] residual/ReLU/LayerNorm epilogue.
    config = HyperGNNConfig(
        text_dim=64, node_feat_dim=D, hidden_dim=D, num_layers=2,
        rel_sorted=True,
    )
    params = init_hypergnn(config, jax.random.PRNGKey(0))

    from graph_hypernetwork_forge_tpu.models.text_encoder import (
        apply_text_encoder,
    )
    from graph_hypernetwork_forge_tpu.models.weight_generator import (
        apply_weight_generator,
    )
    from graph_hypernetwork_forge_tpu.utils.initializers import (
        layer_norm_apply,
    )

    chars, lens = arrays[4], arrays[5]
    text_embs = apply_text_encoder(params["text_encoder"], chars, lens)

    def gen_one(c, text):
        w = apply_weight_generator(
            config.weight_generator, params["weight_generators"][0], text + c
        )
        return jnp.sum(w["W_msg"]) + jnp.sum(w["W_self"]) + jnp.sum(w["bias"])

    bench("generator_fwd_bwd_per_layer",
          lambda c, t: gen_one(c, t) + jnp.sum(jax.grad(gen_one, 1)(c, t)),
          text_embs)

    def tenc(c, chars):
        return jnp.sum(
            apply_text_encoder(params["text_encoder"], chars, lens) + c
        )

    bench("text_encode_fwd", tenc, chars)

    def epilogue(c, h_in, contrib_out):
        out = h_in
        for i in range(config.num_layers):
            out = layer_norm_apply(
                params["layer_norms"][i],
                jax.nn.relu(out + contrib_out + c),
            )
        return jnp.sum(out)

    bench(
        "epilogue_fwd_bwd_all_layers",
        lambda c, a, b: jnp.sum(jax.grad(epilogue, 1)(c, a, b)),
        h, jnp.asarray(rng.standard_normal((N, D)).astype(np.float32)),
    )

    # 5. Scoring + loss (roll mode): two more [E, d] sort-free gathers fwd,
    # two sorted reductions bwd — the stage the round-3 breakdown omitted.
    from graph_hypernetwork_forge_tpu.training.objectives import (
        link_prediction_loss_sorted,
    )

    def loss_stage(c, embs):
        return link_prediction_loss_sorted(
            embs + c, src, dst, plan, jnp.int32(12345), edge_mask=mask
        )

    bench("loss_roll_fwd", loss_stage, h)
    bench(
        "loss_roll_fwd_bwd",
        lambda c, e: jnp.sum(jax.grad(loss_stage, 1)(c, e)), h,
    )

    # 6. Adam update on the full param pytree.
    optimizer0 = optax.adam(1e-3)
    ostate0 = optimizer0.init(params)
    gshape = jax.tree_util.tree_map(jnp.ones_like, params)

    def adam_stage(c, g):
        gg = jax.tree_util.tree_map(lambda x: x + c, g)
        updates, _ = optimizer0.update(gg, ostate0, params)
        new_p = optax.apply_updates(params, updates)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_p))

    bench("adam_update", adam_stage, gshape)

    # 7. End-to-end model fwd, fwd+bwd, and the full train step.
    def fwd(c, feats):
        return jnp.sum(
            apply_hypergnn(
                config, params, feats + c, *arrays, sort_plan=plan
            )
        )

    bench("model_fwd", fwd, feats)
    bench(
        "model_fwd_bwd",
        lambda c, f: jnp.sum(jax.grad(fwd, 1)(c, f)), feats,
    )

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(config, optimizer, neg_mode="roll")

    # Full step (not scan-fused: donation; time with per-call fetch).
    p, o = params, opt_state
    r = jax.random.PRNGKey(1)
    p, o, loss = step(p, o, feats, *arrays, r, sort_plan=plan)
    float(loss)
    steps = 5
    t0 = time.perf_counter()
    for _ in range(steps):
        r, sr = jax.random.split(r)
        p, o, loss = step(p, o, feats, *arrays, sr, sort_plan=plan)
        float(loss)
    full_ms = 1e3 * (time.perf_counter() - t0) / steps
    print(json.dumps({
        "stage": "full_step_fwd_bwd_adam",
        "ms": round(full_ms, 3),
        "note": "per-call dispatch + loss fetch: includes the ~31-70 ms "
                "tunnel RTT documented in CLAUDE.md",
    }), flush=True)

    # Device-only step time: K steps fused in one program, ONE loss fetch —
    # the RTT-free denominator the stage sum should be judged against.
    from graph_hypernetwork_forge_tpu.training.train import make_multi_step

    kfuse = 10
    mstep = make_multi_step(config, optimizer, kfuse, neg_mode="roll")
    # Fresh params: the dispatched loop above DONATED the original buffers.
    p2 = init_hypergnn(config, jax.random.PRNGKey(0))
    o2 = optimizer.init(p2)
    r2 = jax.random.PRNGKey(2)
    _, _, losses = mstep(p2, o2, feats, *arrays, r2, sort_plan=plan)
    np.asarray(losses)
    t0 = time.perf_counter()
    for _ in range(REPS):
        r2, sr = jax.random.split(r2)
        _, _, losses = mstep(p2, o2, feats, *arrays, sr, sort_plan=plan)
        np.asarray(losses)
    fused_ms = 1e3 * (time.perf_counter() - t0) / (REPS * kfuse)
    print(json.dumps({
        "stage": "full_step_fused_k10",
        "ms": round(fused_ms, 3),
    }), flush=True)

    # Accounting: the stages above compose the whole step. Per layer the
    # backward pass runs contributions + the fused [E, 2d] tail; the loss
    # adds two more sort-free [E, d] gathers (+ their reduction cotangents);
    # generator/text/epilogue/Adam are the small fixed costs. Stage sums
    # within ~10% of the measured step close round-3's ~115 ms gap.
    s = STAGE_MS
    layers = config.num_layers
    expected = (
        layers * s["contrib_fwd_bwd"]
        + layers * s["agg_tail_fwd_bwd"]
        + layers * s["generator_fwd_bwd_per_layer"]
        + s["text_encode_fwd"]
        + s["epilogue_fwd_bwd_all_layers"]
        + s["loss_roll_fwd_bwd"]
        + s["adam_update"]
    )
    print(json.dumps({
        "stage": "sum_of_stages",
        "ms": round(expected, 3),
        "full_step_ms": round(full_ms, 3),
        "full_step_fused_ms": round(fused_ms, 3),
        "coverage_vs_dispatched": round(expected / full_ms, 3),
        "coverage_vs_fused": round(expected / fused_ms, 3),
        "composition": {
            "contrib(xL)": round(layers * s["contrib_fwd_bwd"], 1),
            "agg_tail(xL)": round(layers * s["agg_tail_fwd_bwd"], 1),
            "generator(xL)": round(
                layers * s["generator_fwd_bwd_per_layer"], 1
            ),
            "text_encode": round(s["text_encode_fwd"], 1),
            "epilogue": round(s["epilogue_fwd_bwd_all_layers"], 1),
            "loss_roll": round(s["loss_roll_fwd_bwd"], 1),
            "adam": round(s["adam_update"], 1),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
