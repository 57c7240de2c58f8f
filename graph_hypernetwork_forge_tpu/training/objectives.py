"""Training objectives.

Margin-ranking link-prediction loss matching the reference training loop
(``demo.py:89-96`` and ``tests/test_hypergnn.py:216-219``):

    loss = mean( max(0, margin - pos + neg) )

with positives scored on real edges and negatives on corrupted tails.
Padded edges are excluded through ``edge_mask`` (mask-weighted mean equals
the reference's plain mean over real edges).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graph_hypernetwork_forge_tpu.models.hypergnn import score_triple


def margin_ranking_loss(
    pos_scores: jax.Array,
    neg_scores: jax.Array,
    margin: float = 1.0,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    per_edge = jnp.clip(margin - pos_scores + neg_scores, a_min=0.0)
    if edge_mask is None:
        return jnp.mean(per_edge)
    return jnp.sum(per_edge * edge_mask) / jnp.maximum(jnp.sum(edge_mask), 1.0)


def link_prediction_loss(
    embs: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    neg_dst: jax.Array,
    margin: float = 1.0,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Margin-ranking loss over (src→dst) positives vs (src→neg_dst) negatives."""
    pos = score_triple(embs[src], embs[dst])
    neg = score_triple(embs[src], embs[neg_dst])
    return margin_ranking_loss(pos, neg, margin=margin, edge_mask=edge_mask)
