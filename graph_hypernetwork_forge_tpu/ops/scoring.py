"""Link-prediction scoring ops (the SDDMM-style candidate scoring tier).

Generalizes the reference's pairwise ``score_triple`` dot product
(``models/hypergnn.py:304-318``) to the shapes large-scale link prediction
actually needs:

- :func:`score_pairs` — the reference contract (``[B, d] × [B, d] → [B]``).
- :func:`score_candidate_sets` — per-query candidate lists
  (``[B, d] × [B, K, d] → [B, K]``): the sampled-softmax / negative-batch
  shape. This is an SDDMM (sampled dense-dense matmul) over the candidate
  sparsity pattern; on TPU it is a batched row-dot that XLA fuses with the
  gathers.
- :func:`score_all_tails` — full-vocabulary ranking (``[B, d] × [N, d] →
  [B, N]``), one MXU matmul; used by the MRR evaluator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graph_hypernetwork_forge_tpu.utils.initializers import resolve_precision


def score_pairs(head: jax.Array, tail: jax.Array) -> jax.Array:
    """Dot-product score; ``[d] → scalar`` or ``[B, d] → [B]``."""
    return jnp.sum(head * tail, axis=-1)


def score_candidate_sets(
    embs: jax.Array,
    src: jax.Array,
    candidates: jax.Array,
    precision: str = "highest",
) -> jax.Array:
    """Scores of each candidate tail per query: ``[B, K]``.

    Args:
        embs: ``[N, d]`` node embeddings.
        src: ``[B]`` query head indices.
        candidates: ``[B, K]`` candidate tail indices per query.
    """
    prec = resolve_precision(precision)
    heads = embs[src]  # [B, d]
    tails = embs[candidates]  # [B, K, d]
    return jnp.einsum("bd,bkd->bk", heads, tails, precision=prec)


def score_all_tails(
    embs: jax.Array, src: jax.Array, precision: str = "highest"
) -> jax.Array:
    """Scores against every node as tail: ``[B, N]`` (one MXU matmul)."""
    prec = resolve_precision(precision)
    return jnp.dot(embs[src], embs.T, precision=prec)
