#!/usr/bin/env python3
"""Microbenchmark: dual-interval CSR kernel vs the r4 single-stream paths.

Three comparisons at production shapes (host-precomputed splits, chunk-
aligned buckets, optimization_barrier harness as in segsum.py):

- d=64 single stream: packed64 (pair-packed rows, NO [E, 128] pad copy)
  vs the r4 column-pad path vs XLA sorted-hint.
- d=64 cotangent PAIR: one dual kernel pass vs two packed64 passes.
- d=128 cotangent PAIR: one dual (w=256) pass vs two single passes.

Usage: python benchmarks/segsum_dual.py [--out FILE]
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
    TILE_N,
    dual_sorted_segment_sum_pallas,
    sorted_segment_sum_pallas,
    sorted_segment_sum_packed64,
)

LINES = []


def emit(obj):
    s = json.dumps(obj)
    print(s, flush=True)
    LINES.append(s)


def bench(fn, args, label, cfg, bytes_moved, reps=5, fused=10):
    def prog(*a):
        def body(c, _):
            ab = jax.lax.optimization_barrier(a)
            out = fn(*ab)
            flat = [o for o in (out if isinstance(out, tuple) else (out,))]
            return c + sum(jnp.sum(o) for o in flat) * 1e-20, sum(
                jnp.sum(o * o) for o in flat
            )

        _, ys = jax.lax.scan(body, jnp.float32(0.0), length=fused)
        return ys

    g = jax.jit(prog)
    np.asarray(g(*args))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(g(*args))
    dt = (time.perf_counter() - t0) / (reps * fused)
    emit({"config": cfg, "backend": label, "ms": round(dt * 1e3, 3),
          "GB_per_s": round(bytes_moved / dt / 1e9, 1)})


def main():
    e, n = 1 << 20, 50_000
    rng = np.random.default_rng(0)
    ids_a = np.sort(rng.integers(0, n, e)).astype(np.int32)
    ids_b = np.sort(rng.integers(0, n, e)).astype(np.int32)
    sp = lambda ids: jnp.asarray(
        np.searchsorted(ids, np.arange(n + 1), side="left").astype(np.int32)
    )
    spa, spb = sp(ids_a), sp(ids_b)
    ja, jb = jnp.asarray(ids_a), jnp.asarray(ids_b)

    for d in (64, 128):
        xa = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
        xb = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
        cfg = f"e1m-d{d}"
        single_bytes = (e * d + n * d) * 4
        ref = jax.jit(
            lambda x: jax.ops.segment_sum(
                x, ja, num_segments=n, indices_are_sorted=True
            )
        )(xa)
        if d == 64:
            bench(
                lambda x: sorted_segment_sum_packed64(
                    x, ja, n, False, "exact", spa
                ),
                (xa,), "packed64", cfg, single_bytes,
            )
            got = jax.jit(
                lambda x: sorted_segment_sum_packed64(
                    x, ja, n, False, "exact", spa
                )
            )(xa)
            emit({"config": cfg, "packed64_rel_err": float(
                jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))})
            # r4 column-pad path for comparison
            bench(
                lambda x: sorted_segment_sum_pallas(
                    jnp.pad(x, ((0, 0), (0, 64))), ja, n, TILE_N, 1024,
                    False, "exact", spa,
                )[:, :64],
                (xa,), "colpad128", cfg, single_bytes,
            )
        else:
            bench(
                lambda x: sorted_segment_sum_pallas(
                    x, ja, n, TILE_N, 1024, False, "exact", spa
                ),
                (xa,), "single-csr", cfg, single_bytes,
            )
        bench(
            lambda x: jax.ops.segment_sum(
                x, ja, num_segments=n, indices_are_sorted=True
            ),
            (xa,), "xla-sorted-hint", cfg, single_bytes,
        )
        # Cotangent pair: one dual pass vs two singles.
        pair_bytes = 2 * single_bytes
        bench(
            lambda a, b: dual_sorted_segment_sum_pallas(
                a, b, n, spa, spb
            ),
            (xa, xb), "dual-1pass", cfg, pair_bytes,
        )
        da, db = jax.jit(
            lambda a, b: dual_sorted_segment_sum_pallas(a, b, n, spa, spb)
        )(xa, xb)
        refb = jax.jit(
            lambda x: jax.ops.segment_sum(
                x, jb, num_segments=n, indices_are_sorted=True
            )
        )(xb)
        emit({"config": cfg, "dual_rel_err_a": float(
            jnp.max(jnp.abs(da - ref)) / jnp.max(jnp.abs(ref))),
            "dual_rel_err_b": float(
            jnp.max(jnp.abs(db - refb)) / jnp.max(jnp.abs(refb)))})
        if d == 64:
            bench(
                lambda a, b: (
                    sorted_segment_sum_packed64(a, ja, n, False, "exact", spa),
                    sorted_segment_sum_packed64(b, jb, n, False, "exact", spb),
                ),
                (xa, xb), "two-packed64", cfg, pair_bytes,
            )
        else:
            bench(
                lambda a, b: (
                    sorted_segment_sum_pallas(
                        a, ja, n, TILE_N, 1024, False, "exact", spa
                    ),
                    sorted_segment_sum_pallas(
                        b, jb, n, TILE_N, 1024, False, "exact", spb
                    ),
                ),
                (xa, xb), "two-single", cfg, pair_bytes,
            )

    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
        with open(out, "w") as f:
            f.write("\n".join(LINES) + "\n")


if __name__ == "__main__":
    main()
