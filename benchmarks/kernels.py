#!/usr/bin/env python3
"""Kernel microbenchmark: per-edge contribution backends at d=128.

Compares the algebraically identical implementations of the hot op
(per-edge ``x_src @ W_msg[rel] + bias`` / ``x_dst @ W_self[rel]``; reference
semantics ``models/hypergnn.py:195-228``):

- ``dense``   — all-relations batched matmul ``[2U, N, d]`` + vector gathers,
- ``grouped`` — relation-grouped ``jax.lax.ragged_dot`` (XLA's MoE grouped
  matmul; the committed default at relation-sparse scale),
- ``gather``  — per-edge ``[E, d, d]`` weight gather + matvec (the
  reference's own formulation; O(E·d²) HBM traffic),
- ``pallas``  — streaming single-relation-tile kernel
  (``ops/pallas/edge_transform.py``): the per-tile relation id is
  scalar-prefetched and drives the weight BlockSpec, so one ``[d, d]``
  weight pair streams per tile (VMEM high water O(TILE·d + d²)).

All backends consume the SAME group-padded sorted layout
(``encode_graph(sort_by_relation=True, group_pad=256)``) so outputs are
bit-comparable; the masked pad rows (~U·TILE/2 extra, ≤4% here) are charged
against every backend equally. d % 128 == 0 only for pallas — Mosaic
compiles sub-lane-width blocks pathologically slowly on this stack.

Each line reports edges/s for the *contribution* stage alone (forward).
Prints one JSON line per (config, backend). Usage: ``python
benchmarks/kernels.py [--small] [--bwd]``.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from graph_hypernetwork_forge_tpu.data.encoding import encode_graph  # noqa: E402
from graph_hypernetwork_forge_tpu.ops.message_passing import (  # noqa: E402
    _edge_contributions_dense,
    _edge_contributions_gather,
    _edge_contributions_grouped,
)
from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (  # noqa: E402
    GROUP_PAD,
    edge_transform_sorted,
    edge_transform_sorted_combined,
)

CONFIGS = [
    # (name, N, E, U, d)
    ("u50-d128", 10_000, 500_000, 50, 128),
    ("u200-d128", 100_000, 2_000_000, 200, 128),
    ("xl-d128", 50_000, 1_000_000, 237, 128),
    # d=64: ragged_dot vs the round-4 pair-packed kernel route (two
    # same-relation rows per 128-lane row, blockdiag banks).
    ("xl-d64", 50_000, 1_000_000, 237, 64),
]
SMALL = [("small-d128", 1_000, 50_000, 20, 128)]


def run(name, n, e, u, d, reps=5, with_bwd=False):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    texts = [f"relation type number {i}" for i in range(u)]
    etexts = [texts[i] for i in rng.integers(0, u, e)]
    graph = encode_graph(
        ei, etexts, n, sort_by_relation=True, group_pad=GROUP_PAD
    )
    e_pad = graph.src.shape[0]
    src = jnp.asarray(graph.src)
    dst = jnp.asarray(graph.dst)
    rel = jnp.asarray(graph.rel_ids)
    u_pad = graph.char_ids.shape[0]
    w_msg = jnp.asarray(
        0.01 * rng.standard_normal((u_pad, d, d)).astype(np.float32)
    )
    w_self = jnp.asarray(
        0.01 * rng.standard_normal((u_pad, d, d)).astype(np.float32)
    )
    bias = jnp.asarray(0.01 * rng.standard_normal((u_pad, d)).astype(np.float32))

    def bench(fn, label, fused=10):
        # Fuse `fused` iterations into one program (lax.scan, carry feeds a
        # perturbation into h to defeat CSE) so the ~30 ms host-fetch
        # round-trip on this tunneled stack is amortized out of the number.
        # Full-output reductions keep every edge's contribution live — a
        # [0, 0] probe would let XLA narrow/DCE per-edge work, and unevenly
        # across backends (ragged_dot is opaque; dense/gather are not).
        if with_bwd:
            base = fn

            def fn(h, src, dst, rel, w_msg, w_self, bias):
                def scalar(h, w_msg, w_self, bias):
                    m, s = base(h, src, dst, rel, w_msg, w_self, bias)
                    return jnp.sum(m * m) + jnp.sum(s), (m, s)

                grads, (m, s) = jax.grad(
                    scalar, argnums=(0, 1, 2, 3), has_aux=True
                )(h, w_msg, w_self, bias)
                # keep all grads live in the scan output
                m = m + 1e-30 * (
                    jnp.sum(grads[1]) + jnp.sum(grads[2]) + jnp.sum(grads[3])
                    + jnp.sum(grads[0])
                )
                return m, s

        def prog(h, src, dst, rel, w_msg, w_self, bias):
            def body(c, _):
                m, s = fn(h + c, src, dst, rel, w_msg, w_self, bias)
                return jnp.sum(m) * 1e-20, jnp.sum(m) + jnp.sum(s)

            _, ys = jax.lax.scan(body, jnp.float32(0.0), length=fused)
            return ys

        g = jax.jit(prog)
        np.asarray(g(h, src, dst, rel, w_msg, w_self, bias))  # compile+sync
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(g(h, src, dst, rel, w_msg, w_self, bias))
        dt = (time.perf_counter() - t0) / (reps * fused)
        print(
            json.dumps(
                {
                    "config": name,
                    "backend": label,
                    "mode": "fwd+bwd" if with_bwd else "fwd",
                    "edges_per_s": round(e / dt),
                    "ms": round(dt * 1e3, 3),
                }
            )
        )
        return jax.jit(fn)(h, src, dst, rel, w_msg, w_self, bias)

    ref = None
    if 2 * u_pad * n * d <= 2**28:  # dense materializes [2U, N, d]
        ref = bench(
            lambda *a: _edge_contributions_dense(*a, precision="highest"),
            "dense",
        )
    grp = bench(
        lambda *a: _edge_contributions_grouped(
            *a, precision="highest", rel_sorted=True
        ),
        "grouped",
    )
    if ref is None:
        ref = grp
    got = None
    if e_pad * d * d <= 2**28 and not with_bwd:  # gather: [E, d, d] x2
        bench(
            lambda *a: _edge_contributions_gather(*a, precision="highest"),
            "gather",
        )
    if jax.default_backend() == "tpu" and d % 128 == 0:
        def pallas_fn(h, src, dst, rel, w_msg, w_self, bias):
            return edge_transform_sorted(
                h[src], h[dst], rel, w_msg, w_self, bias
            )

        got = bench(pallas_fn, "pallas")  # precision=highest (parity mode)

        def pallas_bf16_fn(h, src, dst, rel, w_msg, w_self, bias):
            return edge_transform_sorted(
                h[src], h[dst], rel, w_msg, w_self, bias, 256, False, None
            )

        bench(pallas_bf16_fn, "pallas-bf16")

        def pallas_combined_fn(h, src, dst, rel, w_msg, w_self, bias):
            c = edge_transform_sorted_combined(
                h[src], h[dst], rel, w_msg, w_self, bias, None, 256, False,
            )
            return c, c  # keep the (msg, self) bench contract

        got_c = bench(pallas_combined_fn, "pallas-combined")
        err_c = float(jnp.max(jnp.abs(got_c[0] - (ref[0] + ref[1]))))
        print(json.dumps({
            "config": name, "pallas_combined_vs_ref_sum_max_err": err_c,
        }))
    if jax.default_backend() == "tpu" and d == 64:
        # Pair-packed route (ops/message_passing.py 'pallas_packed'):
        # groups are GROUP_PAD-aligned so pairs never cross a relation
        # boundary; blockdiag(W, W) reproduces both rows' x @ W exactly.
        def packed_fn(h, src, dst, rel, w_msg, w_self, bias):
            xs = h[src].reshape(e_pad // 2, 2 * d)
            xd = h[dst].reshape(e_pad // 2, 2 * d)
            z = jnp.zeros_like(w_msg)
            w2m = jnp.concatenate(
                [jnp.concatenate([w_msg, z], 2),
                 jnp.concatenate([z, w_msg], 2)], 1)
            w2s = jnp.concatenate(
                [jnp.concatenate([w_self, z], 2),
                 jnp.concatenate([z, w_self], 2)], 1)
            b2 = jnp.concatenate([bias, bias], -1)
            c = edge_transform_sorted_combined(
                xs, xd, rel[::2], w2m, w2s, b2, None, 128, False,
            ).reshape(e_pad, d)
            return c, c

        got_p = bench(packed_fn, "pallas-packed")
        if not with_bwd:
            err_p = float(jnp.max(jnp.abs(got_p[0] - (ref[0] + ref[1]))))
            print(json.dumps({
                "config": name, "packed_vs_ref_sum_max_err": err_p,
            }))
    if got is not None:
        err = float(
            jnp.max(jnp.abs(got[0] - ref[0])) + jnp.max(jnp.abs(got[1] - ref[1]))
        )
        print(json.dumps({"config": name, "pallas_vs_ref_max_err": err}))


def main():
    configs = SMALL if "--small" in sys.argv else CONFIGS
    with_bwd = "--bwd" in sys.argv
    for cfg in configs:
        run(*cfg, with_bwd=with_bwd)


if __name__ == "__main__":
    main()
