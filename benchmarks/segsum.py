#!/usr/bin/env python3
"""Microbenchmark: sorted segment-sum backends at [E, d].

Measures the reduction that dominates the xl step off-roofline cost
(``benchmarks/xl_breakdown.py``: 6-8 reductions of 12-18 ms each at
[1M, 128]): XLA's scatter-add lowering (with and without the sorted-indices
hint) vs the Pallas CSR kernel (``ops/pallas/segment_sum.py`` — chunked DMA
streaming + interval one-hot MXU accumulation; reference semantics it
accelerates: the mean-aggregation scatter at ``models/hypergnn.py:207-213``).

Protocol per CLAUDE.md: scan-fused iterations per program, full-output
reductions to defeat DCE, host-fetch synchronization. Prints one JSON line
per (config, backend). Usage: ``python benchmarks/segsum.py [--small]``.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (  # noqa: E402
    sorted_segment_sum_pallas,
)

# E sizes match the edge buckets (pad_bucket_edges: powers of two /
# 2^20-multiples — always chunk-aligned, so the kernel's tail pad is a
# no-op exactly as in production layouts).
CONFIGS = [
    # (name, E, N, d)
    ("e128k-d128", 131_072, 10_000, 128),
    ("e1m-d64", 1 << 20, 50_000, 64),
    ("e1m-d128", 1 << 20, 50_000, 128),
    ("e1m-d256", 1 << 20, 50_000, 256),
    ("e4m-d128", 1 << 22, 200_000, 128),
]
SMALL = [("small-d128", 65_536, 5_000, 128)]


def run(name, e, n, d, reps=5, fused=10):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
    ids = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))

    def bench(fn, label):
        def prog(x, ids):
            def body(c, _):
                # Loop-carried optimization_barrier ties x to the carry so
                # the (loop-invariant) reduction cannot be hoisted out of
                # the scan — WITHOUT the old `x + c` trick, whose extra
                # [E, d] read+write pass was wrongly attributed to the
                # kernel (round-3 README quoted the contaminated number).
                xb, cb = jax.lax.optimization_barrier((x, c))
                out = fn(xb, ids)
                return cb + jnp.sum(out) * 1e-20, jnp.sum(out * out)

            _, ys = jax.lax.scan(body, jnp.float32(0.0), length=fused)
            return ys

        g = jax.jit(prog)
        np.asarray(g(x, ids))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(g(x, ids))
        dt = (time.perf_counter() - t0) / (reps * fused)
        gbs = (e * d * 4 + n * d * 4) / dt / 1e9
        print(
            json.dumps(
                {
                    "config": name,
                    "backend": label,
                    "ms": round(dt * 1e3, 3),
                    "GB_per_s": round(gbs, 1),
                }
            ),
            flush=True,
        )
        return jax.jit(fn)(x, ids)

    ref = bench(
        lambda x, ids: jax.ops.segment_sum(x, ids, num_segments=n),
        "xla-unsorted",
    )
    bench(
        lambda x, ids: jax.ops.segment_sum(
            x, ids, num_segments=n, indices_are_sorted=True
        ),
        "xla-sorted-hint",
    )
    if jax.default_backend() == "tpu" and d % 128:
        # Sub-lane width: only the dispatcher path applies (column-pad to
        # 128 lanes + kernel), vs the XLA lowering above.
        from graph_hypernetwork_forge_tpu.ops.segment import (
            sorted_segment_sum,
        )

        splits = jnp.asarray(
            np.searchsorted(
                np.asarray(ids), np.arange(n + 1), side="left"
            ).astype(np.int32)
        )
        got3 = bench(
            lambda x, ids: sorted_segment_sum(x, ids, n, splits),
            "pallas-csr-dpad",
        )
        err3 = float(jnp.max(jnp.abs(got3 - ref)))
        print(
            json.dumps({"config": name, "dpad_vs_xla_max_err": err3}),
            flush=True,
        )
    if jax.default_backend() == "tpu" and d % 128 == 0:
        got = bench(
            lambda x, ids: sorted_segment_sum_pallas(x, ids, n), "pallas-csr"
        )
        err = float(jnp.max(jnp.abs(got - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        print(
            json.dumps({"config": name, "pallas_vs_xla_max_err": err,
                        "rel_err": rel}),
            flush=True,
        )
        bench(
            lambda x, ids: sorted_segment_sum_pallas(
                x, ids, n, 128, 256, False, "fast"
            ),
            "pallas-csr-bf16",
        )
        # The production path: CSR boundaries host-precomputed
        # (SortPlan.*_splits) — the in-jit searchsorted costs 23 ms alone
        # at [1M, 50k] and is pure static structure.
        splits = jnp.asarray(
            np.searchsorted(
                np.asarray(ids), np.arange(n + 1), side="left"
            ).astype(np.int32)
        )
        got2 = bench(
            lambda x, ids: sorted_segment_sum_pallas(
                x, ids, n, 128, 256, False, "exact", splits
            ),
            "pallas-csr-hostsplits",
        )
        err2 = float(jnp.max(jnp.abs(got2 - ref)))
        print(
            json.dumps({"config": name,
                        "hostsplits_vs_xla_max_err": err2}),
            flush=True,
        )


def main():
    configs = SMALL if "--small" in sys.argv else CONFIGS
    for cfg in configs:
        run(*cfg)


if __name__ == "__main__":
    main()
