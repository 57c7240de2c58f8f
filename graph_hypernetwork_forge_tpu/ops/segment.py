"""Segment reductions (scatter-free mean aggregation building blocks).

TPU-native replacement for the reference's ``Tensor.scatter_add_`` mean
aggregation (reference: ``models/hypergnn.py:207-213``). XLA lowers
``jax.ops.segment_sum`` to a deterministic scatter-add on TPU; the
count-clamp semantics (``cnt.clamp(min=1)``) are preserved exactly so that
isolated nodes aggregate to zero, matching the reference quirk documented in
SURVEY.md §2.1 #4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets keyed by ``segment_ids``."""
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_count(
    segment_ids: jax.Array,
    num_segments: int,
    weights: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Count (or weighted-count) of entries per segment → ``[num_segments]``."""
    ones = (
        jnp.ones(segment_ids.shape, dtype=jnp.float32) if weights is None else weights
    )
    return jax.ops.segment_sum(
        ones,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean_clamped(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    weights: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Mean per segment with count clamped to >= 1 (empty segments → 0).

    Mirrors ``cnt.clamp(min=1.0); agg / cnt`` at reference
    ``models/hypergnn.py:212-213``. Returns ``(mean [S, d], clamped_count [S])``
    so callers can reuse the count for the self-loop normalization
    (reference ``models/hypergnn.py:220``).
    """
    if weights is not None:
        data = data * weights[:, None]
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    cnt = segment_count(segment_ids, num_segments, weights, indices_are_sorted)
    cnt = jnp.maximum(cnt, 1.0)
    return total / cnt[:, None], cnt
