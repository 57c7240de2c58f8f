#!/usr/bin/env python3
"""Real-chip composed step at xl with the kernel contrib backends.

Runs the composed multi-device train step on a SINGLE-device mesh (the
one real chip) at the xl config and compares contrib backends — showing
the composed program inherits the single-chip kernel numbers rather than
forfeiting them (r4 limitation: composed accepted only dense/grouped).

Protocol: per-call dispatch with a loss fetch per step (the composed step
is a single jitted program; the ~31-70 ms tunnel RTT documented in
CLAUDE.md is INCLUDED in every row equally, so the backend DELTAS are
RTT-free). The single-device make_train_step rows use the identical
protocol for a like-for-like frame.

Usage: python benchmarks/composed_xl.py [--out FILE]
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
from graph_hypernetwork_forge_tpu.parallel.composed import (
    make_composed_train_step,
    prepare_composed_inputs,
)
from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh
from graph_hypernetwork_forge_tpu.training.train import make_train_step

N, E, U, D = 50_000, 1_000_000, 237, 64
STEPS = 8
LINES = []


def emit(obj):
    s = json.dumps(obj)
    print(s, flush=True)
    LINES.append(s)


def main():
    rng = np.random.default_rng(0)
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(
        np.int64
    )
    texts = [f"relation type number {i} with descriptive text"
             for i in range(U)]
    etexts = [texts[i] for i in rng.integers(0, U, E)]
    graph = encode_graph(
        ei, etexts, N, sort_by_relation=True, with_sort_plan=True,
        group_pad=256,
    )
    feats = rng.standard_normal((N, D)).astype(np.float32)
    config = HyperGNNConfig(
        text_dim=64, node_feat_dim=D, hidden_dim=D, num_layers=2,
        rel_sorted=True, group_padded=True,
    )
    params = init_hypergnn(config, jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    mesh = make_mesh((1,), ("edge",), devices=jax.devices()[:1])

    inputs = prepare_composed_inputs(
        graph, feats, 1, halo=True, rel_sort_local=True, group_pad=256
    )
    arrays = tuple(
        jnp.asarray(a) for a in (
            inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
            inputs.edge_mask, inputs.char_ids, inputs.lengths,
        )
    )
    kw = dict(
        src_halo=jnp.asarray(inputs.src_halo),
        send_idx=jnp.asarray(inputs.send_idx),
        rel_group_sizes=jnp.asarray(inputs.rel_group_sizes),
        agg_plan=tuple(jnp.asarray(a) for a in inputs.agg_plan),
    )
    kplan = tuple(jnp.asarray(a) for a in inputs.kernel_plan)

    def trace_composed(contrib, step, extra):
        # Device-time via profiler trace: the per-call tunnel dispatch
        # measured 1.6-1.8 s/call during this session (state-dependent),
        # swamping wall-clock rows — the trace shows what the CHIP does.
        import sys as _sys
        import tempfile

        _sys.path.insert(0, "benchmarks")
        from step_profile import trace_device_summary

        p = init_hypergnn(config, jax.random.PRNGKey(0))
        o = optimizer.init(p)
        tdir = tempfile.mkdtemp(prefix="ghf_composed_trace_")
        r = jax.random.PRNGKey(3)
        with jax.profiler.trace(tdir):
            p, o, loss = step(p, o, *arrays, r, **extra)
            float(loss)
        summary = trace_device_summary(tdir, 1)
        if summary is not None:
            emit({
                "config": "composed-xl-1dev-trace", "contrib": contrib,
                "device_total_ms_per_step":
                    summary["device_total_ms_per_step"],
                "categories_ms_per_step":
                    summary["categories_ms_per_step"],
            })

    def run_composed(contrib):
        step = make_composed_train_step(
            mesh, config, optimizer, inputs.nodes_per_shard,
            num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
            contrib=contrib, agg_sorted=True,
        )
        extra = dict(kw)
        if contrib in ("pallas", "pallas_packed"):
            extra["kernel_plan"] = kplan
        # Fresh params per run: the composed step does not donate, but the
        # single-device row below does — never share buffers across runs.
        p = init_hypergnn(config, jax.random.PRNGKey(0))
        o = optimizer.init(p)
        r = jax.random.PRNGKey(1)
        p, o, loss = step(p, o, *arrays, r, **extra)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            r, sr = jax.random.split(r)
            p, o, loss = step(p, o, *arrays, sr, **extra)
            float(loss)
        ms = 1e3 * (time.perf_counter() - t0) / STEPS
        emit({
            "config": "composed-xl-1dev", "contrib": contrib,
            "ms_per_step_with_rtt": round(ms, 3),
            "loss": round(float(loss), 4),
        })
        trace_composed(contrib, step, extra)
        return ms

    # Single-device oracle under the IDENTICAL per-call-fetch protocol.
    # NON-donating K=1 multi-step: per-call donation measured 1552 ms/step
    # here (the donation layout-churn pathology CLAUDE.md documents).
    from graph_hypernetwork_forge_tpu.training.train import make_multi_step

    sd_arrays = tuple(jnp.asarray(a) for a in graph.arrays)
    plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
    sd_step = make_multi_step(config, optimizer, 1, neg_mode="roll")
    p = init_hypergnn(config, jax.random.PRNGKey(0))
    o = optimizer.init(p)
    r = jax.random.PRNGKey(1)
    p, o, losses = sd_step(p, o, jnp.asarray(feats), *sd_arrays, r,
                           sort_plan=plan)
    np.asarray(losses)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r, sr = jax.random.split(r)
        p, o, losses = sd_step(p, o, jnp.asarray(feats), *sd_arrays, sr,
                               sort_plan=plan)
        np.asarray(losses)
    sd_ms = 1e3 * (time.perf_counter() - t0) / STEPS
    emit({"config": "single-device-xl", "backend": "auto(pallas_packed)",
          "ms_per_step_with_rtt": round(sd_ms, 3)})

    g_ms = run_composed("grouped")
    p_ms = run_composed("pallas_packed")
    emit({
        "config": "composed-xl-1dev",
        "packed_vs_grouped_speedup": round(g_ms / p_ms, 3),
        "packed_vs_single_device_overhead": round(p_ms / sd_ms, 3),
        "note": "per-call fetch protocol: RTT included equally in every "
                "row; deltas are device-time deltas",
    })
    if "--out" in sys.argv:
        with open(sys.argv[sys.argv.index("--out") + 1], "w") as f:
            f.write("\n".join(LINES) + "\n")


if __name__ == "__main__":
    main()
