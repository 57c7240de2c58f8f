#!/usr/bin/env python3
"""On-chip trace attribution of the fused xl train step (r5 directive 4).

Round 3/4 summed ISOLATED stage microbenches and landed 31% short of the
fused step — isolated scans overlap DMA/compute differently than the
composed heterogeneous program. This script closes the accounting with an
actual device trace: ``jax.profiler.trace`` around the fused K-step
program, the xplane converted with xprof's ``raw_to_tool_data``, and HLO
self-times aggregated per category (pallas custom-calls, gathers,
fusions, dots, ...). The category table SUMS to the device total by
construction; the device total is compared against the wall-clock step.

Usage: python benchmarks/step_profile.py [--d 64] [--out FILE]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
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
from graph_hypernetwork_forge_tpu.training.train import make_multi_step

N, E, U, K = 50_000, 1_000_000, 237, 10
LINES = []


def emit(obj):
    s = json.dumps(obj)
    print(s, flush=True)
    LINES.append(s)


def categorize(name: str) -> str:
    n = name.lower()
    if ("custom-call" in n or "tpu_custom_call" in n or "mosaic" in n
            or "pallas" in n):
        return "pallas_kernels"
    if "gather" in n:
        return "gathers"
    if "scatter" in n:
        return "scatters"
    if "sort" in n:
        return "sorts"
    if "dot" in n or "conv" in n:
        return "matmuls"
    if "all-gather" in n or "all-reduce" in n or "collective" in n:
        return "collectives"
    if "fusion" in n or "fused" in n:
        return "fusions"
    if "copy" in n or "transpose" in n or "reshape" in n or "pad" in n:
        return "data_movement"
    return "other"


def trace_device_summary(tdir, steps):
    """Parse a jax.profiler trace dir → per-step device-time attribution.

    Returns ``{"device_total_ms_per_step", "categories_ms_per_step",
    "top_op_types_ms_per_step"}`` or None if no xplane was written. Device
    rows only, IDLE excluded; ``steps`` normalizes a multi-step trace.
    """
    xplanes = glob.glob(
        os.path.join(tdir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        return None
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats", {"tqx": "out:json"}
    )
    if isinstance(data, bytes):
        data = data.decode()
    stats = json.loads(data)
    tbl = stats[0] if isinstance(stats, list) else stats
    cols = [c.get("label", c.get("id", "")) for c in tbl["cols"]]

    def col(label_sub):
        for i, c in enumerate(cols):
            if label_sub.lower() in str(c).lower():
                return i
        return None

    i_dev = col("host/device")
    i_type = col("operation type")
    i_name = col("operation name")
    i_self = col("total self-time (us)")
    cat_us, op_us, total_us = {}, {}, 0.0

    def val(c, i):
        v = c[i]
        return v.get("v") if isinstance(v, dict) else v

    for row in tbl["rows"]:
        c = row["c"]
        if str(val(c, i_dev)) != "Device":
            continue
        tname = str(val(c, i_type))
        name = str(val(c, i_name))
        if tname == "IDLE":
            continue
        try:
            self_us = float(val(c, i_self))
        except (TypeError, ValueError):
            continue
        total_us += self_us
        cat = categorize(tname + " " + name)
        cat_us[cat] = cat_us.get(cat, 0.0) + self_us
        key = f"{tname}:{name[:60]}"
        op_us[key] = op_us.get(key, 0.0) + self_us
    return {
        "device_total_ms_per_step": round(total_us / 1e3 / steps, 3),
        "categories_ms_per_step": {
            k: round(v / 1e3 / steps, 3)
            for k, v in sorted(cat_us.items(), key=lambda kv: -kv[1])
        },
        "top_op_types_ms_per_step": {
            k: round(v / 1e3 / steps, 3)
            for k, v in sorted(op_us.items(), key=lambda kv: -kv[1])[:15]
        },
    }


def main():
    d = 64
    if "--d" in sys.argv:
        d = int(sys.argv[sys.argv.index("--d") + 1])
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
    feats = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)
    plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
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
    np.asarray(losses)  # compile + sync

    # Wall-clock fused step (the denominator).
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r, sr = jax.random.split(r)
        _, _, losses = mstep(params, o, feats, *arrays, sr, sort_plan=plan)
        np.asarray(losses)
    wall_ms = 1e3 * (time.perf_counter() - t0) / (reps * K)
    emit({"stage": f"fused_step_wall_d{d}", "ms": round(wall_ms, 3)})

    tdir = tempfile.mkdtemp(prefix="ghf_trace_")
    with jax.profiler.trace(tdir):
        r, sr = jax.random.split(r)
        _, _, losses = mstep(params, o, feats, *arrays, sr, sort_plan=plan)
        np.asarray(losses)

    summary = trace_device_summary(tdir, K)
    if summary is None:
        emit({"error": "no xplane found", "dir": tdir})
        return
    device_total_ms = summary["device_total_ms_per_step"]
    emit({
        "stage": f"trace_attribution_d{d}",
        "wall_ms_per_step": round(wall_ms, 3),
        "coverage_vs_wall": round(device_total_ms / wall_ms, 3),
        **summary,
    })
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
        with open(out, "w") as f:
            f.write("\n".join(LINES) + "\n")


if __name__ == "__main__":
    main()
