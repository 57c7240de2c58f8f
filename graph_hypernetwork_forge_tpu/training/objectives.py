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
    per_edge = jnp.maximum(margin - pos_scores + neg_scores, 0.0)
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


def multi_negative_loss(
    embs: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    neg_dst: jax.Array,
    margin: float = 1.0,
    edge_mask: Optional[jax.Array] = None,
    adversarial_temperature: float = 0.0,
) -> jax.Array:
    """Margin-ranking loss averaged over K corrupted tails per positive.

    ``neg_dst [B, K]`` holds K negative tail candidates per positive pair;
    the per-pair loss is the mean hinge over its K negatives (the K=1
    column case reduces exactly to :func:`link_prediction_loss`). More
    negatives per positive sharpen the ranking gradient — the standard
    KG-embedding recipe the reference's single-permutation scheme
    (``demo.py:93``) is the K=1 special case of.

    ``adversarial_temperature`` > 0 enables RotatE-style self-adversarial
    weighting: each negative's hinge is weighted by
    ``softmax(T * stop_grad(neg_score))`` over its K candidates, so
    gradient mass concentrates on the HARDEST (highest-scoring) negatives
    instead of being diluted over easy ones. This is the standard fix when
    uniform corrupted tails saturate the margin (train loss → 0 while
    ranking stalls — exactly the large-candidate-set regime). ``T = 0``
    recovers the uniform mean.
    """
    from graph_hypernetwork_forge_tpu.ops.scoring import score_candidate_sets

    pos = score_triple(embs[src], embs[dst])  # [B]
    neg = score_candidate_sets(embs, src, neg_dst)  # [B, K]
    hinge = jnp.maximum(margin - pos[:, None] + neg, 0.0)  # [B, K]
    if adversarial_temperature > 0.0:
        w = jax.nn.softmax(
            adversarial_temperature * jax.lax.stop_gradient(neg), axis=1
        )
        per_pair = jnp.sum(w * hinge, axis=1)
    else:
        per_pair = jnp.mean(hinge, axis=1)
    if edge_mask is None:
        return jnp.mean(per_pair)
    return jnp.sum(per_pair * edge_mask) / jnp.maximum(jnp.sum(edge_mask), 1.0)


def link_prediction_loss_sorted(
    embs: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    sort_plan,
    roll_shift: jax.Array,
    margin: float = 1.0,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Sort-free margin-ranking loss over all positives.

    Numerically the same objective as :func:`link_prediction_loss` with
    negatives formed by *permuting the positive tails* — the corrupted-tail
    family the reference draws from (``demo.py:93`` uses ``torch.randperm``
    over dst). Here the permutation is a single random rotation ``dst[(i +
    k) % E]`` per step: one member of that family, NOT uniform over all E!
    permutations (all pairs share the shift, so within-step negatives are
    correlated). The payoff is that the whole loss (forward AND backward)
    lowers without a single device sort:

    - the ``embs[src]`` / ``embs[dst]`` gathers route their cotangents
      through the :class:`SortPlan` permutations
      (``ops/segment.take_rows_sorted`` → sorted-hint segment-sums),
    - the rotation is ``jnp.roll``, whose transpose is the inverse roll —
      no scatter at all for the negative term.

    With edge padding, a rotated slot can land on a padded entry (tail =
    node 0); the positive-side ``edge_mask`` still governs which pairs
    enter the mean, matching the masked-mean semantics of
    :func:`margin_ranking_loss`.
    """
    from graph_hypernetwork_forge_tpu.ops.segment import take_rows_pair

    n = embs.shape[0]
    # Fused gather pair: the (src-sorted, dst-sorted) cotangent reductions
    # of BOTH gathers run in one dual-interval CSR kernel pass (and at
    # d=64 skip the [E, 128] pad copies) — the loss stage was measured at
    # 42.6 ms/step at xl with two separate reduce passes
    # (benchmarks/results/xl_breakdown_r4.json).
    pos_h, pos_t = take_rows_pair(
        n, embs, src, dst,
        sort_plan.src_perm, sort_plan.src_sorted, sort_plan.src_splits,
        sort_plan.dst_perm, sort_plan.dst_sorted, sort_plan.dst_splits,
    )
    neg_t = jnp.roll(pos_t, -roll_shift, axis=0)
    pos = jnp.sum(pos_h * pos_t, axis=-1)
    neg = jnp.sum(pos_h * neg_t, axis=-1)
    return margin_ranking_loss(pos, neg, margin=margin, edge_mask=edge_mask)
