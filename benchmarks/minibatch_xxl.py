#!/usr/bin/env python3
"""xxl-scale distributed-minibatch throughput (BASELINE config #4 shape).

Builds a Wikidata5M-scale synthetic graph (N=1M, E=10M, U=237), then
drives :class:`DistributedMinibatchTrainer` — neighbor-sampled subgraph
batches, dst-partitioned into per-shard fixed-ladder buckets, edge-sharded
composed step — and reports steps/s with the host-side sampling cost
split out from the device step (the sampler is the C++ native path when
built, numpy otherwise).

On the single real chip the mesh is (1,); the same program IS the
multi-shard program (tested exact vs single-device on the virtual CPU
mesh in tests/test_minibatch.py) — this row measures the xxl data-path
throughput, not scaling.

Usage: python benchmarks/minibatch_xxl.py [--steps 30] [--out FILE]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np
import optax

sys.path.insert(0, ".")

from graph_hypernetwork_forge_tpu.models.hypergnn import (
    HyperGNNConfig,
    init_hypergnn,
)
from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh
from graph_hypernetwork_forge_tpu.training.minibatch import (
    DistributedMinibatchTrainer,
    MinibatchSpec,
)

import os

N = int(os.environ.get("GHF_XXL_N", 1_000_000))
E = int(os.environ.get("GHF_XXL_E", 10_000_000))
U, D = 237, 64


def main():
    steps = 30
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(
        np.int64
    )
    texts = [f"relation type number {i} with descriptive text"
             for i in range(U)]
    etexts = [texts[i] for i in rng.integers(0, U, E)]
    feats = rng.standard_normal((N, D)).astype(np.float32)
    build_s = time.perf_counter() - t0

    config = HyperGNNConfig(
        text_dim=64, node_feat_dim=D, hidden_dim=D, num_layers=2
    )
    optimizer = optax.adam(1e-3)
    k = 1 if jax.default_backend() == "tpu" else min(4, jax.device_count())
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    t0 = time.perf_counter()
    trainer = DistributedMinibatchTrainer(
        mesh, config, optimizer, ei, etexts, feats,
        MinibatchSpec(batch_size=1024, fanouts=(10, 10),
                      node_bucket_multiple=32_768),
        cap_multiple=8192,
    )
    csr_s = time.perf_counter() - t0

    params = init_hypergnn(config, jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    rng_np = np.random.default_rng(1)
    key = jax.random.PRNGKey(2)

    # Warmup (compiles for the bucket shapes).
    key, sk = jax.random.split(key)
    params, opt_state, loss = trainer.step(params, opt_state, rng_np, sk)
    float(loss)

    sample_s = step_s = 0.0
    losses = []
    for _ in range(steps):
        key, sk = jax.random.split(key)
        t0 = time.perf_counter()
        batch = trainer.sample_batch_sharded(rng_np)
        sample_s += time.perf_counter() - t0
        (inputs, feats_b, src_b, dst_b, rel_b, mask_b, chars_b, lens_b,
         ps, pd, pm, gs) = batch
        npp = inputs.nodes_per_shard
        contrib = trainer._pick_contrib(feats_b.shape[0], chars_b.shape[0])
        skey = (npp, src_b.shape[0], chars_b.shape[0], contrib)
        t0 = time.perf_counter()
        if skey not in trainer._dist_steps:
            from graph_hypernetwork_forge_tpu.training.minibatch import (
                make_composed_minibatch_step,
            )

            trainer._dist_steps[skey] = make_composed_minibatch_step(
                mesh, config, optimizer, npp, contrib=contrib,
            )
        params, opt_state, loss = trainer._dist_steps[skey](
            params, opt_state, feats_b, src_b, dst_b, rel_b, mask_b,
            chars_b, lens_b, ps, pd, pm, sk, rel_group_sizes=gs,
        )
        losses.append(float(loss))  # host fetch = true sync
        step_s += time.perf_counter() - t0
    # Device-time via profiler trace: per-call dispatch overhead on this
    # tunneled stack drifted to seconds/call during this session — the
    # trace shows what the chip actually does for one step.
    import tempfile

    sys.path.insert(0, "benchmarks")
    from step_profile import trace_device_summary

    tdir = tempfile.mkdtemp(prefix="ghf_mb_trace_")
    key, sk = jax.random.split(key)
    with jax.profiler.trace(tdir):
        params, opt_state, loss = trainer._dist_steps[skey](
            params, opt_state, feats_b, src_b, dst_b, rel_b, mask_b,
            chars_b, lens_b, ps, pd, pm, sk, rel_group_sizes=gs,
        )
        float(loss)
    summary = trace_device_summary(tdir, 1) or {}

    out = {
        "config": "xxl-minibatch",
        "device_trace_ms_per_step": summary.get("device_total_ms_per_step"),
        "device_trace_categories": summary.get("categories_ms_per_step"),
        "N": N, "E": E, "U": U, "d": D,
        "batch_size": 1024, "fanouts": [10, 10],
        "mesh": list(mesh.shape.values()),
        "graph_build_s": round(build_s, 1),
        "sampler_csr_s": round(csr_s, 1),
        "steps": steps,
        "host_sampling_ms_per_step": round(1e3 * sample_s / steps, 1),
        "per_call_wall_ms": round(1e3 * step_s / steps, 1),
        "per_call_note": "includes the session-state-dependent seconds-scale dispatch overhead (CLAUDE.md); device_trace_ms_per_step is the chip time",
        "steps_per_s_end_to_end": round(steps / (sample_s + step_s), 2),
        "final_loss": round(float(np.mean(losses[-5:])), 4),
        "n_compiled_buckets": len(trainer._dist_steps),
        "contrib": contrib,
    }
    print(json.dumps(out), flush=True)
    if "--out" in sys.argv:
        with open(sys.argv[sys.argv.index("--out") + 1], "w") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
