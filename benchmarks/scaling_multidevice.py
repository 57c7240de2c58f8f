#!/usr/bin/env python3
"""Multi-device scaling benchmark: composed train step at 1/2/4/8 devices.

Runs the fully-composed SPMD train step (relation sharding + node-partitioned
message passing + grads + Adam, ``parallel/composed.py``) on a virtual CPU
mesh in BOTH variants:

- ``halo`` (the default path): boundary-minimized ``all_to_all`` exchange per
  layer + fully-local scoring (``neg_mode="local_roll"``) — per-device
  compute and wire bytes divide by the mesh size;
- ``dense`` (the v1 fallback): full-``h`` ``all_gather`` per layer +
  full-embedding gather for scoring — per-device compute does NOT divide
  (the relation product is replicated), kept here as the contrast.

Metrics per mesh size:

- ``flops_per_device``: XLA's compiled per-device FLOP count
  (``compiled.cost_analysis()``) — the *structural* scaling metric. North
  star (BASELINE.md): ≥80% parallel efficiency at 4 devices, i.e.
  ``flops(1dev) / (k · flops_per_device(k)) ≥ 0.8``. This is what real
  multi-chip wall-clock follows when collectives ride ICI.
- ``fwd_bwd_edges_per_s`` wall-clock on THIS host — honest but bounded by
  the host's physical core count (virtual CPU devices share cores: on a
  2-core container, >2x wall speedup is physically impossible at any
  efficiency, and the absolute numbers are CPU numbers, not TPU numbers).
- ``collective_mib_per_dev``: wire bytes each device sends per step
  (halo: B boundary rows per pair per layer + relation banks + grad psum;
  dense: full node-embedding all_gathers), from the HaloPlan volume
  helpers — the halo-vs-dense bytes column.

The graph is clustered (communities with a small cross-community edge
fraction) and relabeled with ``locality_relabel`` so range partitioning
keeps neighborhoods on one device — the regime edge-partitioned GNN
training targets (SURVEY.md §5.7).

Prints one JSON line per (variant, mesh size); a ``summary`` line reports
the 4-device efficiencies. ``tests/test_composed.py::
test_halo_step_per_device_flops_shrink_with_mesh`` guards the structural
metric in CI.
"""

from __future__ import annotations

import json
import os
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
from graph_hypernetwork_forge_tpu.parallel.halo import (
    allgather_bytes_per_device,
    build_halo_plan,
    halo_bytes_per_device,
    locality_relabel,
)
from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh

N = int(os.environ.get("GHF_SCALE_N", 8_192))
E = int(os.environ.get("GHF_SCALE_E", 65_536))
U, D, L = 32, 64, 2
COMMUNITIES = 64
CROSS_FRACTION = 0.02  # fraction of edges crossing community boundaries


def build():
    """Clustered KG + locality relabeling (the edge-partitioning regime)."""
    rng = np.random.default_rng(0)
    csize = N // COMMUNITIES
    comm = rng.integers(0, COMMUNITIES, E)
    src = comm * csize + rng.integers(0, csize, E)
    cross = rng.random(E) < CROSS_FRACTION
    dst_comm = np.where(cross, rng.integers(0, COMMUNITIES, E), comm)
    dst = dst_comm * csize + rng.integers(0, csize, E)
    perm = locality_relabel(src, dst, N)
    src, dst = perm[src], perm[dst]
    texts = [f"relation type number {i} with descriptive text" for i in range(U)]
    etexts = [texts[i] for i in rng.integers(0, U, E)]
    graph = encode_graph(np.stack([src, dst]), etexts, N)
    feats = rng.standard_normal((N, D)).astype(np.float32)
    return graph, feats


def wire_bytes_per_step(inputs, k: int, u_pad: int, n_params: int, halo: bool) -> int:
    """Bytes each device SENDS per train step over the mesh axis (f32).

    Forward: L node-embedding exchanges (halo: (k-1)·B·D rows via
    all_to_all; dense: (k-1)·npp·D rows via all_gather) + L relation-bank
    all_gathers of (u_pad/k)·(2·D·D + D) + the scoring exchange (halo: one
    more B-row all_to_all; dense: a full (k-1)·npp·D all_gather).
    Backward: each collective transposes to one of the same volume (×2
    total). Plus the parameter-gradient psum (~2·params for a ring).
    """
    if k == 1:
        return 0
    if halo:
        node_ex = (k - 1) * inputs.halo_width * D * 4
    else:
        node_ex = (k - 1) * inputs.nodes_per_shard * D * 4
    bank_ex = (k - 1) * (u_pad // k) * (2 * D * D + D) * 4
    fwd = (L + 1) * node_ex + L * bank_ex
    return fwd * 2 + 2 * n_params * 4


def per_device_flops(step, params, opt_state, arrays, rng, kwargs) -> float:
    compiled = step.lower(params, opt_state, *arrays, rng, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def main():
    graph, feats = build()
    config = HyperGNNConfig(
        text_dim=64, node_feat_dim=D, hidden_dim=D, num_layers=L
    )
    base_params = init_hypergnn(config, jax.random.PRNGKey(0))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(base_params))
    optimizer = optax.adam(1e-3)
    host_cores = os.cpu_count()

    results = {}
    for variant, halo, contrib in (
        ("dense", False, "dense"),
        ("halo", True, "dense"),
        # Production path at large U: per-device ragged_dot over each
        # shard's rel-sorted slice — O(E/k · d²) instead of O(npp·2U·d²).
        ("halo-grouped", True, "grouped"),
    ):
        base_eps = base_flops = None
        for k in (1, 2, 4, 8):
            mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
            inputs = prepare_composed_inputs(
                graph, feats, k, halo=halo,
                rel_sort_local=contrib == "grouped",
            )
            step = make_composed_train_step(
                mesh, config, optimizer, inputs.nodes_per_shard,
                num_nodes=inputs.num_nodes,
                halo_width=inputs.halo_width if halo else None,
                contrib=contrib,
            )
            arrays = tuple(
                jnp.asarray(a) for a in (
                    inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
                    inputs.edge_mask, inputs.char_ids, inputs.lengths,
                )
            )
            kwargs = {}
            if halo:
                kwargs = dict(
                    src_halo=jnp.asarray(inputs.src_halo),
                    send_idx=jnp.asarray(inputs.send_idx),
                )
            if contrib == "grouped":
                kwargs["rel_group_sizes"] = jnp.asarray(
                    inputs.rel_group_sizes
                )
            params = jax.tree_util.tree_map(jnp.asarray, base_params)
            opt_state = optimizer.init(params)
            rng = jax.random.PRNGKey(1)
            flops = per_device_flops(
                step, params, opt_state, arrays, rng, kwargs
            )
            params, opt_state, loss = step(
                params, opt_state, *arrays, rng, **kwargs
            )
            float(loss)  # sync
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                rng, sr = jax.random.split(rng)
                params, opt_state, loss = step(
                    params, opt_state, *arrays, sr, **kwargs
                )
                float(loss)
            dt = time.perf_counter() - t0
            eps = reps * E / dt
            if base_eps is None:
                base_eps, base_flops = eps, flops
            row = {
                "variant": variant,
                "devices": k,
                "edges": E,
                "nodes": N,
                "halo_width": inputs.halo_width if halo else None,
                "flops_per_device": flops,
                "flop_efficiency_vs_1dev": round(base_flops / (k * flops), 3),
                "fwd_bwd_edges_per_s": round(eps, 1),
                "step_ms": round(1e3 * dt / reps, 2),
                "wall_efficiency_vs_1dev": round(eps / (base_eps * k), 3),
                "collective_mib_per_dev_per_step": round(
                    wire_bytes_per_step(
                        inputs, k, inputs.char_ids.shape[0], n_params, halo
                    ) / 2**20, 2,
                ),
                "host_cores": host_cores,
                "loss": round(float(loss), 4),
            }
            results[(variant, k)] = row
            print(json.dumps(row))

    # Pod-scale scheduled-ppermute halo inside the composed step: same
    # exactness, per-round padded wire (parallel/halo.py).
    from graph_hypernetwork_forge_tpu.parallel.halo import (
        build_scheduled_halo_plan,
        scheduled_halo_bytes_per_device,
        scheduled_halo_padding_factor,
    )

    for k in (4, 8):
        mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
        inputs = prepare_composed_inputs(graph, feats, k, halo=True,
                                         scheduled=True)
        step = make_composed_train_step(
            mesh, config, optimizer, inputs.nodes_per_shard,
            num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
            scheduled_rounds=inputs.sched_round_perms,
        )
        arrays = tuple(
            jnp.asarray(a) for a in (
                inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
                inputs.edge_mask, inputs.char_ids, inputs.lengths,
            )
        )
        kwargs = dict(
            src_halo=jnp.asarray(inputs.src_halo),
            send_idx=tuple(jnp.asarray(t) for t in inputs.sched_send_tables),
        )
        params = jax.tree_util.tree_map(jnp.asarray, base_params)
        opt_state = optimizer.init(params)
        rng = jax.random.PRNGKey(1)
        flops = per_device_flops(step, params, opt_state, arrays, rng, kwargs)
        params, opt_state, loss = step(params, opt_state, *arrays, rng, **kwargs)
        float(loss)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            rng, sr = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, *arrays, sr, **kwargs
            )
            float(loss)
        dt = time.perf_counter() - t0
        splan = build_scheduled_halo_plan(
            graph.src, graph.dst, graph.rel_ids, graph.edge_mask, N, k
        )
        dplan = build_halo_plan(
            graph.src, graph.dst, graph.rel_ids, graph.edge_mask, N, k
        )
        row = {
            "variant": "halo-scheduled",
            "devices": k,
            "edges": E,
            "nodes": N,
            "num_rounds": splan.num_rounds,
            "flops_per_device": flops,
            "flop_efficiency_vs_1dev": round(
                results[("halo", 1)]["flops_per_device"] / (k * flops), 3
            ),
            "fwd_bwd_edges_per_s": round(reps * E / dt, 1),
            "step_ms": round(1e3 * dt / reps, 2),
            "exchange_mib_per_dev": round(
                scheduled_halo_bytes_per_device(splan, D) / 2**20, 4
            ),
            "exchange_mib_per_dev_dense_pairs": round(
                halo_bytes_per_device(dplan, D) / 2**20, 4
            ),
            "padding_factor": round(scheduled_halo_padding_factor(splan), 3),
            "host_cores": host_cores,
            "loss": round(float(loss), 4),
        }
        results[("halo-scheduled", k)] = row
        print(json.dumps(row))

    # 2D composition: edge sharding × Megatron TP in one program
    # (parallel/composed_tp.py). The wire-bytes story: the per-layer bank
    # all_gather rides the edge axis with [U, d_in/k_m, d_out] shards —
    # bank traffic ÷ k_m vs the 1D step — at the cost of one [cap, D]
    # activation psum(model) per layer (Megatron's standard trade).
    from graph_hypernetwork_forge_tpu.parallel.composed_tp import (
        make_composed_tp_train_step,
        shard_composed_tp_params,
    )

    def bank_bytes_1d(k_e, u_pad):
        return (k_e - 1) * (u_pad // k_e) * (2 * D * D + D) * 4

    def bank_bytes_2d(k_e, k_m, u_pad):
        return (k_e - 1) * (u_pad // k_e) * (2 * D * (D // k_m) + D) * 4

    for k_e, k_m in ((2, 2), (4, 2), (2, 4)):
        mesh = make_mesh((k_e, k_m), ("edge", "model"),
                         devices=jax.devices()[: k_e * k_m])
        inputs = prepare_composed_inputs(graph, feats, k_e, halo=True)
        step = make_composed_tp_train_step(
            mesh, config, optimizer, inputs.nodes_per_shard,
            halo_width=inputs.halo_width,
        )
        arrays = tuple(
            jnp.asarray(a) for a in (
                inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
                inputs.edge_mask, inputs.char_ids, inputs.lengths,
            )
        )
        kwargs = dict(
            src_halo=jnp.asarray(inputs.src_halo),
            send_idx=jnp.asarray(inputs.send_idx),
        )
        params = shard_composed_tp_params(
            jax.tree_util.tree_map(jnp.asarray, base_params), config, mesh
        )
        opt_state = optimizer.init(params)
        rng = jax.random.PRNGKey(1)
        flops = per_device_flops(step, params, opt_state, arrays, rng, kwargs)
        params, opt_state, loss = step(params, opt_state, *arrays, rng, **kwargs)
        float(loss)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            rng, sr = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, *arrays, sr, **kwargs
            )
            float(loss)
        dt = time.perf_counter() - t0
        u_pad = inputs.char_ids.shape[0]
        cap = inputs.src.shape[0] // k_e
        # Ring psum of the [cap, D] contribution partials per layer, fwd;
        # transposes to a broadcast-equivalent in bwd (x2).
        psum_act = 2 * L * 2 * (k_m - 1) * cap * D * 4 // k_m
        row = {
            "variant": "halo-tp2d",
            "devices": k_e * k_m,
            "k_edge": k_e,
            "k_model": k_m,
            "edges": E,
            "nodes": N,
            "halo_width": inputs.halo_width,
            "flops_per_device": flops,
            "fwd_bwd_edges_per_s": round(reps * E / dt, 1),
            "step_ms": round(1e3 * dt / reps, 2),
            "bank_wire_mib_per_dev_1d": round(
                2 * L * bank_bytes_1d(k_e, u_pad) / 2**20, 3
            ),
            "bank_wire_mib_per_dev_2d": round(
                2 * L * bank_bytes_2d(k_e, k_m, u_pad) / 2**20, 3
            ),
            "bank_wire_division": round(
                bank_bytes_1d(k_e, u_pad) / bank_bytes_2d(k_e, k_m, u_pad), 3
            ),
            "tp_activation_psum_mib_per_dev": round(psum_act / 2**20, 3),
            "host_cores": host_cores,
            "loss": round(float(loss), 4),
        }
        results[("halo-tp2d", (k_e, k_m))] = row
        print(json.dumps(row))

    plan = build_halo_plan(
        graph.src, graph.dst, graph.rel_ids, graph.edge_mask, N, 4
    )
    summary = {
        "summary": True,
        "north_star": "flop_efficiency_vs_1dev >= 0.8 at 4 devices (halo)",
        "halo_flop_efficiency_4dev": results[("halo", 4)][
            "flop_efficiency_vs_1dev"
        ],
        "dense_flop_efficiency_4dev": results[("dense", 4)][
            "flop_efficiency_vs_1dev"
        ],
        "halo_flop_efficiency_8dev": results[("halo", 8)][
            "flop_efficiency_vs_1dev"
        ],
        "halo_grouped_flop_efficiency_4dev": results[("halo-grouped", 4)][
            "flop_efficiency_vs_1dev"
        ],
        "halo_grouped_flops_per_device_4dev": results[("halo-grouped", 4)][
            "flops_per_device"
        ],
        "exchange_bytes_halo_vs_dense_4dev": round(
            halo_bytes_per_device(plan, D)
            / allgather_bytes_per_device(plan, D), 4,
        ),
        "tp2d_bank_wire_division_4x2": results[("halo-tp2d", (4, 2))][
            "bank_wire_division"
        ],
        "host_cores": host_cores,
        "note": (
            "wall-clock on a virtual CPU mesh is bounded by host cores "
            f"({host_cores} here); flops_per_device is the structural "
            "scaling metric real multi-chip hardware follows. Caveat for "
            "the halo-grouped variant: XLA:CPU lowers ragged_dot to a "
            "dense-expanded form, inflating its ABSOLUTE per-device flops "
            "~8x on this CPU mesh — on TPU it is the mosaic grouped-matmul "
            "custom call (benchmarks/results/kernels_r3.json measures the "
            "real contribution-stage costs on chip); the EFFICIENCY "
            "column (division with k) is the meaningful number for it"
        ),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
