#!/usr/bin/env python3
"""Pin the pallas_packed / grouped crossover at d=64.

The ``resolve_backend`` gate routes rel-sorted group-padded d=64 layouts
with a SortPlan to the pair-packed kernel only at >= some row count —
round 4 set 65,536 from two data points (bench config: ragged wins 3.9 vs
8.0 ms; xl: packed wins). This sweep measures one message-passing layer
fwd+bwd for both backends at E ∈ {16k..512k} (N = E/20, U = 50) and
emits the measured crossover so the gate constant cites an artifact.

Usage: python benchmarks/packed_crossover.py [--out FILE]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
from graph_hypernetwork_forge_tpu.ops.message_passing import (
    relational_message_passing,
)

D, U = 64, 50
ES = [16_384, 32_768, 65_536, 131_072, 262_144, 524_288]
K, REPS = 10, 3
LINES = []


def emit(obj):
    s = json.dumps(obj)
    print(s, flush=True)
    LINES.append(s)


def bench(fn, *args):
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
    return 1e3 * (time.perf_counter() - t0) / (REPS * K)


def main():
    rows = []
    for e in ES:
        n = max(e // 20, 256)
        rng = np.random.default_rng(0)
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        texts = [f"relation type number {i} text" for i in range(U)]
        etexts = [texts[i] for i in rng.integers(0, U, e)]
        graph = encode_graph(
            ei, etexts, n, sort_by_relation=True, with_sort_plan=True,
            group_pad=256,
        )
        arrays = tuple(jnp.asarray(a) for a in graph.arrays)
        src, dst, rel, mask = arrays[:4]
        plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
        u_pad = graph.char_ids.shape[0]
        h = jnp.asarray(rng.standard_normal((n, D)).astype(np.float32))
        w_msg = jnp.asarray(
            0.01 * rng.standard_normal((u_pad, D, D)).astype(np.float32)
        )
        w_self = jnp.asarray(
            0.01 * rng.standard_normal((u_pad, D, D)).astype(np.float32)
        )
        bias = jnp.asarray(
            0.01 * rng.standard_normal((u_pad, D)).astype(np.float32)
        )

        def layer(c, h_, backend):
            out = relational_message_passing(
                h_ + c, src, dst, rel, w_msg, w_self, bias,
                edge_mask=mask, backend=backend, rel_sorted=True,
                group_padded=True, sort_plan=plan,
            )
            return out

        row = {"E": e, "E_pad": int(src.shape[0]), "N": n}
        for backend in ("grouped", "pallas_packed"):
            ms = bench(
                lambda c, h_, b=backend: jnp.sum(
                    jax.grad(lambda hh: jnp.sum(layer(c, hh, b) ** 2))(h_)
                ),
                h,
            )
            row[f"{backend}_ms"] = round(ms, 3)
        row["packed_wins"] = row["pallas_packed_ms"] < row["grouped_ms"]
        emit(row)
        rows.append(row)
    crossover = next((r["E"] for r in rows if r["packed_wins"]), None)
    emit({"measured_crossover_E": crossover,
          "gate_constant": 65_536,
          "note": "resolve_backend packed gate; cite this artifact"})
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
        with open(out, "w") as f:
            f.write("\n".join(LINES) + "\n")


if __name__ == "__main__":
    main()
