#!/usr/bin/env python3
"""Halo plan padding at k=8: dense [k,k,B] plan vs the pod-shaped
scheduled-ppermute plan (``parallel/halo.py``).

The dense plan pads every device pair's all_to_all block to the GLOBAL max
boundary B — on skewed graphs one hot pair inflates everyone's wire block.
The scheduled plan bin-packs pairs into ppermute rounds (first-fit
decreasing, matching-constrained, slack-bounded padding); ppermute ships
only listed pairs, so transmitted/true → ~1 and plan memory → O(Σ B_ij).
This script emits one JSON line per plan with wire bytes, plan memory, and
the padding factor, on (a) a preferential-attachment power-law graph (raw
and locality-relabeled — near-uniform boundaries, both plans similar) and
(b) the clustered-hotpair regime locality-relabeled production graphs live
in, where the dense cube pads 39x and the schedule is tight. CPU-only,
host-side arithmetic (no device work).
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from graph_hypernetwork_forge_tpu.parallel.halo import (  # noqa: E402
    build_halo_plan,
    build_scheduled_halo_plan,
    halo_bytes_per_device,
    halo_padding_factor,
    locality_relabel,
    scheduled_halo_bytes_per_device,
    scheduled_halo_padding_factor,
)

N, E, K, D = 16_384, 131_072, 8, 64


def powerlaw_graph(seed=0):
    """Preferential-attachment-style dst selection → power-law in-degree."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, E)
    # Hub pool with zipfian popularity.
    n_hubs = 256
    hubs = rng.permutation(N)[:n_hubs]
    zipf_p = 1.0 / np.arange(1, n_hubs + 1)
    zipf_p /= zipf_p.sum()
    use_hub = rng.random(E) < 0.5
    dst = np.where(
        use_hub, hubs[rng.choice(n_hubs, size=E, p=zipf_p)],
        rng.integers(0, N, E),
    )
    mask = np.ones(E, dtype=np.float32)
    rel = rng.integers(0, 16, E).astype(np.int32)
    return src.astype(np.int64), dst.astype(np.int64), rel, mask


def report(tag, src, dst, rel, mask):
    dense = build_halo_plan(src, dst, rel, mask, N, K)
    sched = build_scheduled_halo_plan(src, dst, rel, mask, N, K)
    assert (dense.pair_widths == sched.pair_widths).all()
    true_rows = int(dense.pair_widths.sum())
    rows = [
        {
            "graph": tag,
            "plan": "dense-a2a",
            "halo_width_B": int(dense.halo_width),
            "wire_mib_per_dev": round(
                halo_bytes_per_device(dense, D) / 2**20, 4
            ),
            "plan_memory_entries": int(dense.send_idx.size),
            "padding_factor": round(halo_padding_factor(dense), 3),
        },
        {
            "graph": tag,
            "plan": "scheduled-ppermute",
            "num_rounds": sched.num_rounds,
            "round_widths": [int(w) for w in sched.round_widths],
            "wire_mib_per_dev": round(
                scheduled_halo_bytes_per_device(sched, D) / 2**20, 4
            ),
            "plan_memory_entries": int(
                sum(t.size for t in sched.send_tables)
            ),
            "padding_factor": round(scheduled_halo_padding_factor(sched), 3),
        },
        {
            "graph": tag,
            "true_unique_boundary_rows": true_rows,
        },
    ]
    for r in rows:
        print(json.dumps(r), flush=True)
    return rows


def clustered_hotpair_graph(seed=1):
    """The locality-relabeled production regime: communities aligned with
    the partition + ring traffic + ONE hot cross-partition pair (a merged
    community straddling two devices) — the skew the [k,k,B] plan pads
    everyone for, and power-law in-degree within the hot flow."""
    rng = np.random.default_rng(seed)
    npp = N // K
    parts = []
    # Intra-partition bulk (no boundary contribution).
    s = rng.integers(0, N, E // 2)
    parts.append((s, (s // npp) * npp + rng.integers(0, npp, E // 2)))
    # Narrow ring traffic: few unique boundary rows per adjacent pair.
    ring_rows = rng.integers(0, 64, E // 4)
    s = (rng.integers(0, K, E // 4) * npp + ring_rows)
    parts.append((s, (s + npp) % N))
    # Hot pair 0 -> 1: wide boundary with zipfian (power-law) source reuse.
    hot = rng.permutation(npp)[: npp // 2]
    zipf_p = 1.0 / np.arange(1, hot.size + 1)
    zipf_p /= zipf_p.sum()
    s = hot[rng.choice(hot.size, size=E // 4, p=zipf_p)]
    parts.append((s, npp + rng.integers(0, npp, E // 4)))
    src = np.concatenate([p[0] for p in parts]).astype(np.int64)
    dst = np.concatenate([p[1] for p in parts]).astype(np.int64)
    rel = rng.integers(0, 16, src.size).astype(np.int32)
    mask = np.ones(src.size, dtype=np.float32)
    return src, dst, rel, mask


def main():
    src, dst, rel, mask = powerlaw_graph()
    report("powerlaw-raw", src, dst, rel, mask)
    perm = locality_relabel(src, dst, N)
    report("powerlaw-relabel", perm[src], perm[dst], rel, mask)
    src, dst, rel, mask = clustered_hotpair_graph()
    report("clustered-hotpair", src, dst, rel, mask)


if __name__ == "__main__":
    main()
