"""Segment reductions and sort-free gather/scatter building blocks.

TPU-native replacement for the reference's ``Tensor.scatter_add_`` mean
aggregation (reference: ``models/hypergnn.py:207-213``). XLA lowers every
unsorted ``jax.ops.segment_sum`` / scatter-add on TPU to a full key SORT of
the E indices — measured 20 ms for a [1M, 128] segment-sum on this stack,
12 ms with the sorted-indices hint, vs a ~0.7 ms HBM-bandwidth floor. The
count-clamp semantics (``cnt.clamp(min=1)``) are preserved exactly so that
isolated nodes aggregate to zero, matching the reference quirk documented in
SURVEY.md §2.1 #4.

The sort-free discipline implemented here:

- Graph structure is static per training run, so every permutation that
  orders edges by dst (or src) is computed ONCE on the host
  (:class:`~graph_hypernetwork_forge_tpu.data.encoding.SortPlan`) and enters
  jit as plain int32 operands.
- :func:`permute_rows` applies a host-precomputed *bijective* permutation
  with a custom VJP: because the map is a bijection, the cotangent is a
  gather by the inverse permutation — XLA's default VJP for ``x[perm]``
  would be a scatter-add (a device sort) since it cannot know the indices
  are unique.
- :func:`take_rows_sorted` gathers table rows by arbitrary indices with a
  custom VJP that routes the cotangent through the precomputed permutation
  to *sorted* index order, then reduces with ``indices_are_sorted=True`` —
  replacing the unsorted scatter XLA would otherwise emit for ``h[src]``-
  style gathers in the backward pass.

Together these turn every scatter in the message-passing forward AND
backward into (gather → sorted-hint segment-sum), with zero in-jit sorts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets keyed by ``segment_ids``.

    bf16 data (speed mode) is upcast so the reduction accumulates in f32 —
    the convert fuses into the scatter read, wire bytes stay bf16.
    """
    if data.dtype == jnp.bfloat16:
        data = data.astype(jnp.float32)
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


# ---------------------------------------------------------------------------
# Sort-free primitives over host-precomputed permutations.
# ---------------------------------------------------------------------------


def _float0_like(a):
    return np.zeros(a.shape, dtype=jax.dtypes.float0)


# Past this row count the Pallas CSR reduction beats XLA's sorted-hint
# segment-sum, PROVIDED the CSR row boundaries come host-precomputed:
# measured at [1M, 128] the kernel runs ~3 ms vs XLA's 11 ms, but an
# in-jit searchsorted for the boundaries alone costs 23 ms — so the
# dispatcher only routes to Pallas when the caller supplies splits
# (``SortPlan.dst_splits`` / ``src_splits`` / ``rel_splits``).
_PALLAS_SEGSUM_MIN_ROWS = 65_536


def sorted_segment_sum(
    values_sorted: jax.Array,
    ids_sorted: jax.Array,
    num_segments: int,
    splits: jax.Array | None = None,
) -> jax.Array:
    """Sorted-input segment-sum, routed to the fastest backend.

    On TPU with d % 128 == 0, enough rows, AND host-precomputed CSR row
    boundaries (``splits``, ``[num_segments + 1]``), uses the Pallas CSR
    reduction (``ops/pallas/segment_sum.py`` — double-buffered chunk DMA +
    interval one-hot MXU accumulation; measured 3.5x the XLA sorted-hint
    lowering at [1M, 128]); otherwise
    ``jax.ops.segment_sum(indices_are_sorted=True)``.
    """
    d = values_sorted.shape[-1] if values_sorted.ndim == 2 else 0
    if (
        splits is not None
        and jax.default_backend() == "tpu"
        and d >= 64
        and values_sorted.shape[0] >= _PALLAS_SEGSUM_MIN_ROWS
        and splits.shape[0] >= num_segments + 1
    ):
        from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
            TILE_N,
            sorted_segment_sum_pallas,
        )

        # Largest chunk that divides the row count avoids the tail-pad
        # copy entirely (edge buckets are powers of two / 256-multiples)
        # and amortizes per-iteration loop + DMA overhead: measured
        # 4.8 -> 4.24 ms at [1M, 128] for 1024 vs 256
        # (benchmarks/results/segsum_tune_r4.json).
        e_rows = values_sorted.shape[0]
        chunk = next(
            (c for c in (1024, 512, 256) if e_rows % c == 0), 256
        )
        d_pad = -(-d // 128) * 128
        if d == 64 and e_rows % 2 == 0:
            # Pair-packed d=64 path: NO [E, 128] pad materialization and
            # half the kernel HBM bytes — even/odd edge rows ride the
            # low/high lanes of a [E/2, 128] view with integer-transformed
            # interval sets (ops/pallas/segment_sum.py dual kernel).
            from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
                sorted_segment_sum_packed64,
            )

            return sorted_segment_sum_packed64(
                values_sorted, ids_sorted, num_segments,
                splits=splits[: num_segments + 1],
            )
        if d_pad != d:
            # Sub-lane widths wedge Mosaic, so pad the column axis to the
            # 128-lane width (measured neutral-to-winning vs the XLA
            # lowering depending on d % 128).
            out = sorted_segment_sum_pallas(
                jnp.pad(values_sorted, ((0, 0), (0, d_pad - d))),
                ids_sorted, num_segments, TILE_N, chunk,
                splits=splits[: num_segments + 1],
            )
            return out[:, :d]
        return sorted_segment_sum_pallas(
            values_sorted, ids_sorted, num_segments, TILE_N, chunk,
            splits=splits[: num_segments + 1],
        )
    if values_sorted.dtype == jnp.bfloat16:
        # Speed-mode (bf16 activation storage): XLA's segment_sum would
        # accumulate in bf16 — upcast so the reduction accumulates in f32
        # (the convert fuses into the scatter read; wire bytes stay bf16).
        values_sorted = values_sorted.astype(jnp.float32)
    return jax.ops.segment_sum(
        values_sorted, ids_sorted, num_segments=num_segments,
        indices_are_sorted=True,
    )


@jax.custom_vjp
def permute_rows(x: jax.Array, perm: jax.Array, inv_perm: jax.Array) -> jax.Array:
    """``x[perm]`` for a bijective ``perm``, with a gather-only VJP.

    ``inv_perm`` must satisfy ``inv_perm[perm[i]] == i``. The backward pass
    is ``g[inv_perm]`` — exactly the scatter-add XLA would emit for the
    default VJP, but expressed as a gather because the permutation is
    bijective (one contribution per output row). Both directions are pure
    HBM-bandwidth gathers; no device sort is ever emitted.
    """
    return jnp.take(x, perm, axis=0, unique_indices=True)


def _permute_rows_fwd(x, perm, inv_perm):
    return permute_rows(x, perm, inv_perm), (perm, inv_perm)


def _permute_rows_bwd(res, g):
    perm, inv_perm = res
    dx = jnp.take(g, inv_perm, axis=0, unique_indices=True)
    return dx, _float0_like(perm), _float0_like(inv_perm)


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def take_rows_sorted(
    num_rows: int,
    table: jax.Array,
    idx: jax.Array,
    perm_to_sorted: jax.Array | None,
    idx_sorted: jax.Array,
    splits: jax.Array | None = None,
) -> jax.Array:
    """``table[idx]`` whose VJP reduces with sorted indices (no device sort).

    Args:
        num_rows: static number of table rows (``table.shape[0]``).
        table: ``[num_rows, ...]`` rows to gather (the differentiable input).
        idx: ``[E]`` gather indices in the caller's edge order.
        perm_to_sorted: ``[E]`` host-precomputed permutation such that
            ``idx[perm_to_sorted]`` is non-decreasing, or None when ``idx``
            is already sorted (then the cotangent skips the re-permute).
        idx_sorted: ``[E]`` the sorted indices ``idx[perm_to_sorted]``.
        splits: optional ``[num_rows + 1]`` host-precomputed CSR boundaries
            of ``idx_sorted`` (``SortPlan.src_splits`` et al.) — routes the
            cotangent reduction to the Pallas CSR kernel when profitable.

    The forward is a plain gather. The backward permutes the cotangent into
    sorted-index order (a gather — ``perm_to_sorted`` is bijective) and
    accumulates with ``segment_sum(..., indices_are_sorted=True)``, avoiding
    the full key sort XLA emits for an unsorted scatter-add.
    """
    return jnp.take(table, idx, axis=0)


def _take_rows_sorted_fwd(num_rows, table, idx, perm_to_sorted, idx_sorted,
                          splits=None):
    out = jnp.take(table, idx, axis=0)
    # dtype carrier: residuals must be JAX types, so thread the table dtype
    # via a zero-size array.
    proto = jnp.zeros((0,), table.dtype)
    return out, (idx, perm_to_sorted, idx_sorted, splits, proto)


def _take_rows_sorted_bwd(num_rows, res, g):
    idx, perm_to_sorted, idx_sorted, splits, proto = res
    if perm_to_sorted is not None:
        g = jnp.take(g, perm_to_sorted, axis=0, unique_indices=True)
    dtable = sorted_segment_sum(g, idx_sorted, num_rows, splits)
    dtable = dtable.astype(proto.dtype)
    dperm = None if perm_to_sorted is None else _float0_like(perm_to_sorted)
    dsplits = None if splits is None else _float0_like(splits)
    return (dtable, _float0_like(idx), dperm, _float0_like(idx_sorted),
            dsplits)


take_rows_sorted.defvjp(_take_rows_sorted_fwd, _take_rows_sorted_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def take_rows_pair(
    num_rows: int,
    table: jax.Array,
    idx_a: jax.Array,
    idx_b: jax.Array,
    perm_a: jax.Array | None,
    sorted_a: jax.Array,
    splits_a: jax.Array | None,
    perm_b: jax.Array | None,
    sorted_b: jax.Array,
    splits_b: jax.Array | None,
) -> tuple[jax.Array, jax.Array]:
    """``(table[idx_a], table[idx_b])`` with a joint summed-cotangent VJP.

    The per-layer gather pair (``h[src]``, ``h[dst]``) and the loss's
    (head, tail) gathers both produce a (src-sorted, dst-sorted) cotangent
    pair in the backward; this op reduces both against ONE ``dtable``
    without materializing two separate ``[num_rows, d]`` gradients that
    XLA then adds. Each stream reduces through the dispatcher
    (:func:`sorted_segment_sum` — the pad-free packed64 kernel at d=64).
    Arguments mirror two :func:`take_rows_sorted` calls; the forward is
    two plain gathers.
    """
    return jnp.take(table, idx_a, axis=0), jnp.take(table, idx_b, axis=0)


def _take_rows_pair_fwd(num_rows, table, idx_a, idx_b, perm_a, sorted_a,
                        splits_a, perm_b, sorted_b, splits_b):
    out = (jnp.take(table, idx_a, axis=0), jnp.take(table, idx_b, axis=0))
    proto = jnp.zeros((0,), table.dtype)
    res = (idx_a, idx_b, perm_a, sorted_a, splits_a, perm_b, sorted_b,
           splits_b, proto)
    return out, res


def _take_rows_pair_bwd(num_rows, res, g):
    (idx_a, idx_b, perm_a, sorted_a, splits_a, perm_b, sorted_b, splits_b,
     proto) = res
    ga, gb = g
    if perm_a is not None:
        ga = jnp.take(ga, perm_a, axis=0, unique_indices=True)
    if perm_b is not None:
        gb = jnp.take(gb, perm_b, axis=0, unique_indices=True)
    # Two single-stream reduces (d=64 routes to the pad-free packed64
    # kernel). The one-pass dual-interval kernel was measured NO faster
    # (d64: 4.04 vs 4.01 ms; d128: 3.74 vs 3.12 ms at [1M] rows,
    # benchmarks/results/segsum_dual_r5.json) — its lane-masked folds do
    # 2x the MXU work and at chunk=1024 the kernels are bandwidth-, not
    # per-chunk-, bound, so fusing passes buys nothing.
    dtable = sorted_segment_sum(
        ga, sorted_a, num_rows, splits_a
    ) + sorted_segment_sum(gb, sorted_b, num_rows, splits_b)
    dtable = dtable.astype(proto.dtype)
    maybe_f0 = lambda a: None if a is None else _float0_like(a)
    return (dtable, _float0_like(idx_a), _float0_like(idx_b),
            maybe_f0(perm_a), _float0_like(sorted_a), maybe_f0(splits_a),
            maybe_f0(perm_b), _float0_like(sorted_b), maybe_f0(splits_b))


take_rows_pair.defvjp(_take_rows_pair_fwd, _take_rows_pair_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def sorted_segment_sum_by_plan(
    values: jax.Array,
    perm_to_sorted: jax.Array,
    inv_perm: jax.Array,
    ids_sorted: jax.Array,
    num_segments: int,
    splits: jax.Array | None = None,
) -> jax.Array:
    """Segment-sum of unsorted rows via a precomputed sort permutation.

    Equivalent to ``segment_sum(values, ids, num_segments)`` where
    ``ids[perm_to_sorted] == ids_sorted``; runs as one bandwidth-bound
    gather plus one sorted-hint reduction. The joint VJP is ONE table
    gather: ``dvalues[i] = g[ids_sorted[inv_perm[i]]]`` — the naive
    composition (sorted-take then inverse-permute) costs two ``[E, d]``
    gather passes; composing the INDICES instead costs one ``[E]`` int
    gather plus the single ``[E, d]`` gather.
    """
    values_sorted = permute_rows(values, perm_to_sorted, inv_perm)
    return sorted_segment_sum(values_sorted, ids_sorted, num_segments, splits)


def _ssbp_fwd(values, perm_to_sorted, inv_perm, ids_sorted, num_segments,
              splits=None):
    out = sorted_segment_sum_by_plan(
        values, perm_to_sorted, inv_perm, ids_sorted, num_segments, splits
    )
    proto = jnp.zeros((0,), values.dtype)
    return out, (perm_to_sorted, inv_perm, ids_sorted, splits, proto)


def _ssbp_bwd(num_segments, res, g):
    perm_to_sorted, inv_perm, ids_sorted, splits, proto = res
    idx = jnp.take(ids_sorted, inv_perm, axis=0)  # ids in caller edge order
    dvalues = jnp.take(g, idx, axis=0).astype(proto.dtype)
    dsplits = None if splits is None else _float0_like(splits)
    return (dvalues, _float0_like(perm_to_sorted), _float0_like(inv_perm),
            _float0_like(ids_sorted), dsplits)


sorted_segment_sum_by_plan.defvjp(_ssbp_fwd, _ssbp_bwd)
