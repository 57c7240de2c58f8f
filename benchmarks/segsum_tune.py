#!/usr/bin/env python3
"""CSR segment-sum kernel tuning probe: chunk size × mode at [1M, 128].

Round-4 kernel-only measurement (``segsum.py`` with the loop-carried
optimization_barrier harness) puts the host-splits CSR kernel at ~5 ms =
113 GB/s — 3x off the ~340 GB/s copy roofline. The per-chunk cycle model
(VPU one-hot build + 3 exact-mode bf16 MXU passes ≈ 1.1k cycles per
256-row chunk) predicts the kernel is compute-pipeline-bound, not
bandwidth-bound. This probe measures the levers that model exposes:

- chunk size (256 → 512/1024): fewer loop iterations / DMA waits;
- mode "fast" (1 bf16 pass) vs "exact" (3 passes): bounds the MXU share.

Prints one JSON line per variant. Run on TPU only.
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

E, N, D = 1 << 20, 50_000, 128


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    ids_np = np.sort(rng.integers(0, N, E)).astype(np.int32)
    ids = jnp.asarray(ids_np)
    splits = jnp.asarray(
        np.searchsorted(ids_np, np.arange(N + 1), side="left").astype(np.int32)
    )
    ref = None

    for chunk in (256, 512, 1024):
        for mode in ("exact", "fast"):
            fn = lambda x, ids: sorted_segment_sum_pallas(  # noqa: E731
                x, ids, N, 128, chunk, False, mode, splits
            )

            def prog(x, ids):
                def body(c, _):
                    xb, cb = jax.lax.optimization_barrier((x, c))
                    out = fn(xb, ids)
                    return cb + jnp.sum(out) * 1e-20, jnp.sum(out * out)

                _, ys = jax.lax.scan(body, jnp.float32(0.0), length=10)
                return ys

            g = jax.jit(prog)
            np.asarray(g(x, ids))
            t0 = time.perf_counter()
            for _ in range(5):
                np.asarray(g(x, ids))
            dt = (time.perf_counter() - t0) / 50
            out = np.asarray(jax.jit(fn)(x, ids))
            if ref is None:
                ref = np.asarray(
                    jax.ops.segment_sum(x, ids, num_segments=N)
                )
            rel = float(
                np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
            )
            print(json.dumps({
                "chunk": chunk,
                "mode": mode,
                "ms": round(dt * 1e3, 3),
                "GB_per_s": round((E * D * 4 + N * D * 4) / dt / 1e9, 1),
                "rel_err_vs_xla": rel,
            }), flush=True)


if __name__ == "__main__":
    main()
