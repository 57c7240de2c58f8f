"""Link-prediction evaluation: MRR / Hits@K, including zero-shot relations.

The north-star quality metric (BASELINE.json): zero-shot link-prediction
MRR — test edges whose relation types were *never trained* are scored with
weights generated purely from their text. Ranking follows the standard KG
protocol: for each test edge (s → t), rank ``score(s, t)`` against
``score(s, v)`` for all candidate tails v (optionally filtering known true
edges), with ties counted optimistically-average as rank = 1 + #better +
#ties/2.

Scales to full datasets: test pairs are scored in fixed-shape chunks (the
``[B, N]`` score matrix never materializes — peak device memory is
``[chunk, N]``), and the filtered protocol's exclusion lists come from a
host-side CSR over the known edges (vectorized numpy; no O(B·N) Python
loops or dense ``[B, N]`` bool mask). Known tails are excluded by writing
``-inf`` through a padded scatter whose padding lands in a sacrificial
extra column, keeping every chunk's shapes static for XLA.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _csr_by_src(filter_edges: np.ndarray, num_nodes: int):
    """CSR (ptr, tails) of known edges keyed by source node."""
    src = np.asarray(filter_edges[0], dtype=np.int64)
    dst = np.asarray(filter_edges[1], dtype=np.int64)
    order = np.argsort(src, kind="stable")
    counts = np.bincount(src, minlength=num_nodes)
    ptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(counts, out=ptr[1:])
    return ptr, dst[order]


def _chunk_filter_pairs(ptr, tails, chunk_src):
    """(rows, cols) of known (pair-row, tail) entries for one chunk.

    Vectorized CSR expansion: for chunk pair i with source s, emits one
    (i, tail) entry per known edge (s → tail). The caller pads to a bucket
    length with ``col = -1`` sentinels (routed to a sacrificial column).
    """
    starts = ptr[chunk_src]
    lens = (ptr[chunk_src + 1] - starts).astype(np.int64)
    total = int(lens.sum())
    rows = np.repeat(np.arange(len(chunk_src), dtype=np.int32), lens)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    cols = tails[np.repeat(starts, lens) + offs].astype(np.int32)
    # Bucket to a power of two (bounds distinct compile shapes by log2).
    pad_len = max(64, int(1 << int(np.ceil(np.log2(max(total, 1))))))
    rows_p = np.zeros(pad_len, dtype=np.int32)
    cols_p = np.full(pad_len, -1, dtype=np.int32)
    rows_p[:total] = rows
    cols_p[:total] = cols
    return rows_p, cols_p


@partial(jax.jit, static_argnames=("num_nodes",))
def _chunk_ranks(
    embs: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    num_nodes: int,
):
    """Filtered ranks for one fixed-shape chunk of (src → dst) pairs.

    ``rows/cols`` list the (pair, tail) entries to exclude; padded entries
    have ``col == -1`` and are routed to a sacrificial extra column so the
    scatter shape stays static. The target's own score is restored after
    masking, preserving the optimistic-average tie handling of the
    unfiltered protocol.
    """
    scores = embs[src] @ embs.T  # [C, N]
    true_score = jnp.take_along_axis(scores, dst[:, None], axis=1)  # [C, 1]
    # Exclusions: known tails → -inf, via one scatter into [C, N + 1]
    # (padding writes land in column N and are dropped).
    cols = jnp.where(cols < 0, num_nodes, cols)
    ext = jnp.concatenate(
        [scores, jnp.zeros((scores.shape[0], 1), scores.dtype)], axis=1
    )
    ext = ext.at[rows, cols].set(-jnp.inf)
    scores = ext[:, :num_nodes]
    # Restore the target (it may itself be a known edge).
    scores = scores.at[jnp.arange(scores.shape[0]), dst].set(true_score[:, 0])
    better = jnp.sum(scores > true_score, axis=1)
    ties = jnp.sum(scores == true_score, axis=1) - 1  # exclude the target
    return 1.0 + better + 0.5 * jnp.maximum(ties, 0)


def evaluate_link_prediction(
    embs,
    eval_src: np.ndarray,
    eval_dst: np.ndarray,
    *,
    ks: tuple = (1, 3, 10),
    filter_edges: Optional[np.ndarray] = None,
    num_nodes: Optional[int] = None,
    chunk_size: int = 1024,
) -> Dict[str, float]:
    """Compute MRR/Hits@K for (src → dst) test pairs over all-node candidates.

    Args:
        embs: ``[N, d]`` node embeddings (output of the model).
        eval_src, eval_dst: ``[B]`` test pairs.
        filter_edges: optional ``[2, E_known]`` known-true edges to exclude
            from candidate sets (standard "filtered" protocol).
        chunk_size: pairs scored per device dispatch; peak device memory is
            ``chunk_size × N`` floats regardless of B.
    """
    embs = jnp.asarray(embs)
    n = int(embs.shape[0] if num_nodes is None else num_nodes)
    eval_src = np.asarray(eval_src, dtype=np.int64)
    eval_dst = np.asarray(eval_dst, dtype=np.int64)
    b = len(eval_src)

    ptr = tails = None
    if filter_edges is not None:
        ptr, tails = _csr_by_src(np.asarray(filter_edges), n)

    ranks = np.empty(b, dtype=np.float64)
    for lo in range(0, b, chunk_size):
        hi = min(lo + chunk_size, b)
        c = hi - lo
        # Pad the last chunk to the full chunk size (static shapes).
        src_c = np.zeros(min(chunk_size, max(b, 1)), dtype=np.int32)
        dst_c = np.zeros_like(src_c)
        src_c[:c] = eval_src[lo:hi]
        dst_c[:c] = eval_dst[lo:hi]
        if ptr is not None:
            rows, cols = _chunk_filter_pairs(ptr, tails, src_c)
        else:
            rows = np.zeros(1, dtype=np.int32)
            cols = np.full(1, -1, dtype=np.int32)
        r = _chunk_ranks(
            embs, jnp.asarray(src_c), jnp.asarray(dst_c),
            jnp.asarray(rows), jnp.asarray(cols), num_nodes=n,
        )
        ranks[lo:hi] = np.asarray(r)[:c]

    mrr = float(np.mean(1.0 / ranks))
    out = {"mrr": mrr}
    for k in ks:
        out[f"hits@{k}"] = float(np.mean(ranks <= k))
    return out
