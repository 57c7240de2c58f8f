#!/usr/bin/env python3
"""Multi-device scaling benchmark: composed train step at 1/2/4/8 devices.

Runs the fully-composed SPMD train step (relation sharding + node-partitioned
message passing + grads + Adam, ``parallel/composed.py``) on a virtual CPU
mesh (the multi-chip dry-run harness — no TPU pod needed) and reports
edges/s, parallel efficiency vs 1 device, and the per-step collective bytes
each device moves over the interconnect (the dense-boundary halo all_gather
+ relation-bank all_gathers + gradient reduction).

North star (BASELINE.md): ≥80% scaling efficiency 1 → 4 devices. On a CPU
mesh the collectives are memcpy-speed, so the efficiency numbers here
validate the *program structure* (work division, no replicated compute
growth); absolute edges/s is not a TPU number.

Prints one JSON line per mesh size.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
import optax

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

# Sized for a CPU-device mesh: the point is parallel efficiency of the
# PROGRAM (work division, no replicated compute growth), not absolute
# edges/s. Override via env GHF_SCALE_N / GHF_SCALE_E for bigger runs.
import os

N = int(os.environ.get("GHF_SCALE_N", 4_000))
E = int(os.environ.get("GHF_SCALE_E", 40_000))
U, D, L = 32, 64, 2


def build():
    rng = np.random.default_rng(0)
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)])
    texts = [f"relation type number {i} with descriptive text" for i in range(U)]
    etexts = [texts[i] for i in rng.integers(0, U, E)]
    graph = encode_graph(ei, etexts, N)
    feats = rng.standard_normal((N, D)).astype(np.float32)
    return graph, feats


def collective_bytes_per_step(k: int, n_pad: int, u_pad: int) -> int:
    """Bytes each device sends per step over the mesh axis (f32).

    Per layer: halo all_gather of h (send local (n_pad/k)·D rows), relation
    bank all_gather (send (u_pad/k)·(2·D·D + D)); final embedding
    all_gather for scoring; backward transposes each all_gather into a
    reduce-scatter of the same volume (×2); plus the gradient psum
    (~param count, ~2× for ring all-reduce).
    """
    per_layer = (n_pad // k) * D * 4 + (u_pad // k) * (2 * D * D + D) * 4
    fwd = L * per_layer + (n_pad // k) * D * 4
    return fwd * 3  # fwd all_gathers + bwd reduce-scatter transposes (≈2×)


def main():
    graph, feats = build()
    config = HyperGNNConfig(
        text_dim=64, node_feat_dim=D, hidden_dim=D, num_layers=L
    )
    base_params = init_hypergnn(config, jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)

    base_eps = None
    for k in (1, 2, 4, 8):
        mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
        inputs = prepare_composed_inputs(graph, feats, k)
        step = make_composed_train_step(
            mesh, config, optimizer, inputs.nodes_per_shard,
            num_nodes=inputs.num_nodes,
        )
        arrays = tuple(
            jnp.asarray(a) for a in (
                inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
                inputs.edge_mask, inputs.char_ids, inputs.lengths,
            )
        )
        params = jax.tree_util.tree_map(jnp.asarray, base_params)
        opt_state = optimizer.init(params)
        rng = jax.random.PRNGKey(1)
        params, opt_state, loss = step(params, opt_state, *arrays, rng)
        float(loss)  # sync
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            rng, sr = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, *arrays, sr)
            float(loss)
        dt = time.perf_counter() - t0
        eps = reps * E / dt
        if base_eps is None:
            base_eps = eps
        print(json.dumps({
            "devices": k,
            "edges": E,
            "nodes": N,
            "fwd_bwd_edges_per_s": round(eps, 1),
            "step_ms": round(1e3 * dt / reps, 2),
            "efficiency_vs_1dev": round(eps / (base_eps * k), 3),
            "collective_mib_per_dev_per_step": round(
                collective_bytes_per_step(
                    k, inputs.feats.shape[0], inputs.char_ids.shape[0]
                ) / 2**20, 2,
            ) if k > 1 else 0.0,
            "loss": round(float(loss), 4),
        }))


if __name__ == "__main__":
    main()
