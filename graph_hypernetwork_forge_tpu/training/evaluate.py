"""Link-prediction evaluation: MRR / Hits@K, including zero-shot relations.

The north-star quality metric (BASELINE.json): zero-shot link-prediction
MRR — test edges whose relation types were *never trained* are scored with
weights generated purely from their text. Ranking follows the standard KG
protocol: for each test edge (s → t), rank ``score(s, t)`` against
``score(s, v)`` for all candidate tails v (optionally filtering known true
edges), with ties counted optimistically-average as rank = 1 + #better +
#ties/2.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("ks",))
def _rank_metrics(
    embs: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    ks: tuple = (1, 3, 10),
    filter_mask: Optional[jax.Array] = None,
):
    """Ranks of true tails among all nodes → (MRR, {hits@k}).

    ``filter_mask [B, N]``: True entries are *excluded* candidates (known
    positives other than the target).
    """
    scores = embs[src] @ embs.T  # [B, N] dot-product scores
    true_score = jnp.take_along_axis(scores, dst[:, None], axis=1)  # [B, 1]
    if filter_mask is not None:
        scores = jnp.where(filter_mask, -jnp.inf, scores)
    better = jnp.sum(scores > true_score, axis=1)
    ties = jnp.sum(scores == true_score, axis=1) - 1  # exclude the target itself
    ranks = 1.0 + better + 0.5 * jnp.maximum(ties, 0)
    mrr = jnp.mean(1.0 / ranks)
    hits = {k: jnp.mean((ranks <= k).astype(jnp.float32)) for k in ks}
    return mrr, hits, ranks


def evaluate_link_prediction(
    embs,
    eval_src: np.ndarray,
    eval_dst: np.ndarray,
    *,
    ks: tuple = (1, 3, 10),
    filter_edges: Optional[np.ndarray] = None,
    num_nodes: Optional[int] = None,
) -> Dict[str, float]:
    """Compute MRR/Hits@K for (src → dst) test pairs over all-node candidates.

    Args:
        embs: ``[N, d]`` node embeddings (output of the model).
        eval_src, eval_dst: ``[B]`` test pairs.
        filter_edges: optional ``[2, E_known]`` known-true edges to exclude
            from candidate sets (standard "filtered" protocol).
    """
    embs = jnp.asarray(embs)
    n = embs.shape[0] if num_nodes is None else num_nodes
    src = jnp.asarray(eval_src, dtype=jnp.int32)
    dst = jnp.asarray(eval_dst, dtype=jnp.int32)

    filter_mask = None
    if filter_edges is not None:
        known = np.zeros((len(eval_src), n), dtype=bool)
        by_src: dict = {}
        for s, t in zip(filter_edges[0], filter_edges[1]):
            by_src.setdefault(int(s), []).append(int(t))
        for i, (s, t) in enumerate(zip(eval_src, eval_dst)):
            for tt in by_src.get(int(s), ()):
                if tt != int(t):
                    known[i, tt] = True
        filter_mask = jnp.asarray(known)

    mrr, hits, _ranks = _rank_metrics(embs, src, dst, ks=ks, filter_mask=filter_mask)
    out = {"mrr": float(mrr)}
    for k, v in hits.items():
        out[f"hits@{k}"] = float(v)
    return out
