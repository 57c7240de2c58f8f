#!/usr/bin/env python3
"""Kernel microbenchmark: per-edge contribution backends at d=128.

Compares the three algebraically identical implementations of the hot op
(per-edge ``x_src @ W_msg[rel] + bias`` / ``x_dst @ W_self[rel]``; reference
semantics ``models/hypergnn.py:195-228``):

- ``dense``  — all-relations batched matmul ``[2U, N, d]`` + vector gathers,
- ``gather`` — per-edge ``[E, d, d]`` weight gather + matvec (the
  reference's own formulation; O(E·d²) HBM traffic),
- ``pallas`` — fused relation-sorted weight-select + tile matmul kernel
  (``ops/pallas/edge_transform.py``; d % 128 == 0 only — Mosaic compiles
  sub-lane-width blocks pathologically slowly on this stack).

Each line reports edges/s for the *contribution* stage alone (forward), plus
a roofline estimate: the gather backend moves ≥ 2·E·d²·4 B of weights, so
its ceiling is HBM-bandwidth-bound; dense/pallas move O(U·d² + N·d + E·d).

Prints one JSON line per (config, backend). Usage: ``python
benchmarks/kernels.py [--small]``.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from graph_hypernetwork_forge_tpu.ops.message_passing import (  # noqa: E402
    _edge_contributions_dense,
    _edge_contributions_gather,
    _edge_contributions_grouped,
)

CONFIGS = [
    # (name, N, E, U, d)
    ("u50-d128", 10_000, 500_000, 50, 128),
    ("u200-d128", 100_000, 2_000_000, 200, 128),
]
SMALL = [("small-d128", 1_000, 50_000, 20, 128)]


def run(name, n, e, u, d, reps=5):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    # Relation-sorted edge order (the layout the Pallas kernel wants and the
    # CSR builder produces); all backends consume the same layout.
    rel = jnp.asarray(np.sort(rng.integers(0, u, e)).astype(np.int32))
    w_msg = jnp.asarray(0.01 * rng.standard_normal((u, d, d)).astype(np.float32))
    w_self = jnp.asarray(0.01 * rng.standard_normal((u, d, d)).astype(np.float32))
    bias = jnp.asarray(0.01 * rng.standard_normal((u, d)).astype(np.float32))

    def bench(fn, label, fused=10):
        # Fuse `fused` iterations into one program (lax.scan, carry feeds a
        # perturbation into h to defeat CSE) so the ~30 ms host-fetch
        # round-trip on this tunneled stack is amortized out of the number.
        # Full-output reductions keep every edge's contribution live — a
        # [0, 0] probe would let XLA narrow/DCE per-edge work, and unevenly
        # across backends (ragged_dot is opaque; dense/gather are not).
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
                    "edges_per_s": round(e / dt),
                    "ms": round(dt * 1e3, 3),
                }
            )
        )
        return jax.jit(fn)(h, src, dst, rel, w_msg, w_self, bias)

    ref = bench(
        lambda *a: _edge_contributions_dense(*a, precision="highest"), "dense"
    )
    bench(
        lambda *a: _edge_contributions_grouped(*a, precision="highest"),
        "grouped",
    )
    got = None
    if e * d * d <= 2**33:  # gather materializes [E, d, d] x2 — cap memory
        bench(
            lambda *a: _edge_contributions_gather(*a, precision="highest"),
            "gather",
        )
    if jax.default_backend() == "tpu" and d % 128 == 0:
        from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
            edge_contributions_pallas,
        )

        got = bench(lambda *a: edge_contributions_pallas(*a), "pallas")
    if got is not None:
        err = float(
            jnp.max(jnp.abs(got[0] - ref[0])) + jnp.max(jnp.abs(got[1] - ref[1]))
        )
        print(json.dumps({"config": name, "pallas_vs_dense_max_err": err}))


def main():
    configs = SMALL if "--small" in sys.argv else CONFIGS
    for cfg in configs:
        run(*cfg)


if __name__ == "__main__":
    main()
