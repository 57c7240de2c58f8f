"""Pallas TPU kernel: sorted segment-sum at HBM-bandwidth speed.

XLA's ``jax.ops.segment_sum`` on TPU costs 11-18 ms for a ``[1M, 128]``
reduction even with the ``indices_are_sorted`` hint (~50 GB/s effective),
vs a ~0.7 ms HBM roofline (read E·d floats, write N·d). With 6-8 such
reductions per xl train step (aggregation tails + gather cotangents), this
is the single largest off-roofline cost (``benchmarks/xl_breakdown.py``).

This kernel computes the reduction as a CSR-style pass over the dst-sorted
edge rows:

- the grid runs over NODE tiles (``TILE_N`` output rows per program);
- per-node row boundaries come from ONE in-jit ``searchsorted`` over the
  static sorted ids (no sort): ``starts/ends [T, TILE_N]`` ride in as
  normal VMEM-blocked inputs, and a scalar-prefetched ``row_start [T+1]``
  bounds each tile's chunk loop;
- the kernel streams the tile's edge rows from HBM in CHUNK-aligned
  slices with DOUBLE-BUFFERED async DMA (chunk ci+1 is in flight while ci
  folds) and accumulates each chunk with MXU matmuls:
  ``out += interval_onehot ᵀ @ chunk``, where
  ``interval_onehot[r, j] = starts[j] <= r < ends[j]`` is built by two
  VPU compares against the global row index — no per-edge id traffic at
  all, and rows outside the tile's range (shared boundary chunks) match
  no interval, so no extra masking is needed.

This is the classic one-hot segmented-matmul trick: the vector scatter
becomes systolic-array work.

Exactness (``mode="exact"``): one-hot entries are exactly representable in
bf16, so only the DATA operand needs precision recovery — the chunk is
split into three bf16 terms (``c = c1 + c2 + c3`` capturing the full f32
mantissa) and folded with three native-rate bf16 MXU passes accumulating
in f32. This matches the error class of ``precision=HIGHEST`` (summation-
order-level, measured rel err ~2e-7 vs XLA) at half the passes — HIGHEST
would split BOTH operands (6 passes) although the one-hot side is already
exact. ``mode="fast"`` does one bf16 pass (data rounded to bf16) for
speed-mode runs that opt out of the f32 parity gate.

The backward of a sorted segment-sum is a row gather — pure XLA.

Constraints: d % 128 == 0 (Mosaic lane width — sub-128 blocks wedge this
stack's compiler), ids non-decreasing. Guarded by the dispatcher in
``ops/segment.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 128 output rows per program: the minimum lane-safe one-hot width, halving
# the MXU work per edge row vs 256 (FLOPs scale with E·TILE_N·d).
TILE_N = 128
CHUNK = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(tile_n, chunk, d, mode, in_dtype=jnp.float32):
    # bf16 input rows are already exact operands for the one-hot matmul —
    # a single native-rate pass accumulating in f32 (better than XLA's
    # bf16-accumulating segment_sum); f32 rows use the 3-term split below.
    bf16_in = in_dtype == jnp.bfloat16

    def kernel(rs_ref, starts_ref, ends_ref, x_ref, out_ref, xs, sem):
        t = pl.program_id(0)
        start = rs_ref[t]
        end = rs_ref[t + 1]
        out_ref[:] = jnp.zeros_like(out_ref)
        # [tile_n] row bounds per node; kept 3-D blocked (1, 1, tile_n) to
        # satisfy Mosaic's sublane-divisibility rule.
        starts = starts_ref[0, 0]
        ends = ends_ref[0, 0]
        c0 = start // chunk     # chunk-aligned streaming window
        c1 = pl.cdiv(end, chunk)

        def dma(ci, slot):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(pl.multiple_of(ci * chunk, chunk), chunk)],
                xs.at[slot],
                sem.at[slot],
            )

        @pl.when(c0 < c1)
        def _():
            dma(c0, 0).start()

        def body(ci, _):
            slot = jax.lax.rem(ci - c0, 2)

            @pl.when(ci + 1 < c1)
            def _():
                dma(ci + 1, 1 - slot).start()

            dma(ci, slot).wait()
            rows = ci * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, tile_n), 0
            )
            onehot = (
                (rows >= starts[None, :]) & (rows < ends[None, :])
            ).astype(jnp.bfloat16)
            c = xs[slot]
            dims = (((0,), (0,)), ((), ()))

            def fold(term):
                return jax.lax.dot_general(
                    onehot, term, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )

            if bf16_in:
                out_ref[:] += fold(c)
            elif mode == "fast":
                out_ref[:] += fold(c.astype(jnp.bfloat16))
            else:
                c1_ = c.astype(jnp.bfloat16)
                r1 = c - c1_.astype(jnp.float32)
                c2_ = r1.astype(jnp.bfloat16)
                c3_ = (r1 - c2_.astype(jnp.float32)).astype(jnp.bfloat16)
                out_ref[:] += fold(c1_) + fold(c2_) + fold(c3_)
            return 0

        jax.lax.fori_loop(c0, c1, body, 0)

    return kernel


def _impl(x_sorted, ids_sorted, num_segments, tile_n, chunk, interpret,
          mode, splits=None):
    e, d = x_sorted.shape
    n_pad = _round_up(max(num_segments, 1), tile_n)
    t = n_pad // tile_n
    if splits is None:
        # Per-node edge-row boundaries: binary search over the static
        # sorted ids — no device sort anywhere. NOTE: in-jit searchsorted
        # measures 23 ms at [1M rows, 50k nodes] on this stack (4x the
        # kernel itself) — production callers pass host-precomputed
        # ``SortPlan.*_splits`` instead; this path exists for standalone /
        # test use.
        ids32 = ids_sorted.astype(jnp.int32)
        bounds = jnp.arange(n_pad + 1, dtype=jnp.int32)
        splits = jnp.searchsorted(ids32, bounds, side="left")
    splits = splits.astype(jnp.int32)
    if splits.shape[0] != n_pad + 1:
        # Extend with the total row count (trailing segments are empty).
        splits = jnp.pad(
            splits, (0, n_pad + 1 - splits.shape[0]), mode="edge"
        )
    starts = splits[:-1].reshape(t, 1, tile_n)
    ends = splits[1:].reshape(t, 1, tile_n)
    row_start = splits[:: tile_n]  # [t + 1] tile-level chunk-loop bounds
    # Chunk-aligned DMA slices must stay in bounds; rows past the real ids
    # have global index >= every interval end, so they fold to zero. Edge
    # buckets are chunk-multiples in practice, making this pad a no-op
    # (an [E, d] pad copy costs ~5 ms at [1M, 128] — avoid materializing).
    e_pad = _round_up(max(e, 1), chunk)
    x_p = (
        x_sorted if e_pad == e
        else jnp.pad(x_sorted, ((0, e_pad - e), (0, 0)))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 1, tile_n), lambda i, rs: (i, 0, 0)),
            pl.BlockSpec((1, 1, tile_n), lambda i, rs: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i, rs: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d), x_p.dtype),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    passes = 1 if (mode == "fast" or x_p.dtype == jnp.bfloat16) else 3
    out = pl.pallas_call(
        _make_kernel(tile_n, chunk, d, mode, x_p.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e * tile_n * d * passes,
            bytes_accessed=e * d * x_p.dtype.itemsize + n_pad * d * 4,
            transcendentals=0,
        ),
    )(row_start, starts, ends, x_p)
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def sorted_segment_sum_pallas(
    x_sorted, ids_sorted, num_segments, tile_n=TILE_N, chunk=CHUNK,
    interpret=False, mode="exact", splits=None,
):
    """Segment-sum of rows grouped by non-decreasing ``ids_sorted``.

    Drop-in for ``jax.ops.segment_sum(..., indices_are_sorted=True)`` on
    sorted inputs with d % 128 == 0 (see module docstring). ``ids_sorted``
    is graph structure — not differentiated; the backward is a row gather.

    ``splits``: optional ``[num_segments + 1]`` CSR row boundaries of
    ``ids_sorted`` (``SortPlan.dst_splits`` et al.). Pass them whenever the
    graph structure is static — the in-jit ``searchsorted`` fallback costs
    4x the kernel itself at [1M, 50k].
    """
    return _impl(
        x_sorted, ids_sorted, num_segments, tile_n, chunk, interpret, mode,
        splits,
    )


def _fwd(x_sorted, ids_sorted, num_segments, tile_n, chunk, interpret, mode,
         splits=None):
    out = _impl(
        x_sorted, ids_sorted, num_segments, tile_n, chunk, interpret, mode,
        splits,
    )
    return out, (ids_sorted, splits, jnp.zeros((0,), x_sorted.dtype))


def _bwd(num_segments, tile_n, chunk, interpret, mode, res, g):
    import numpy as np

    ids_sorted, splits, proto = res
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    dsplits = None if splits is None else f0(splits)
    dx = jnp.take(g, ids_sorted, axis=0).astype(proto.dtype)
    return dx, f0(ids_sorted), dsplits


sorted_segment_sum_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Dual-interval lane-masked CSR kernel.
#
# Generalizes the kernel above to a [R, W] buffer whose LOW (0:W/2) and
# HIGH (W/2:W) lane halves carry two *different* logical row streams, each
# reduced under its own per-node interval set. Two production shapes fall
# out of one kernel:
#
# - ``packed64``: a single [E, 64] stream viewed as [E/2, 128] row pairs
#   (even edges in low lanes, odd edges in high lanes). The d=64 case no
#   longer materializes an [E, 128] zero-pad copy (measured ~5 ms at
#   [1M, 128]) and streams HALF the HBM bytes of the padded form; the
#   interval sets are exact integer transforms of the same CSR splits
#   (low: [ceil(s/2), ceil(e/2)), high: [floor(s/2), floor(e/2))).
# - ``dual``: two independent [E, dh] streams (dh ∈ {64, 128}) reduced in
#   ONE pass — the (src-sorted, dst-sorted) cotangent pair every layer
#   backward and the loss backward produce. Halves chunk-loop iterations
#   vs two single-stream passes (the kernel is per-chunk-cost-bound:
#   benchmarks/results/segsum_roofline_r4.md).
#
# MXU cost is unchanged vs the padded baseline (6 folds per chunk on half
# the chunks == 3 folds on all chunks); DMA bytes and per-chunk overhead
# halve. Lane masks are applied to the folded [tile_n, W] accumulators
# (garbage lanes from the "wrong" interval set are zeroed), and the cheap
# [N, W]-level epilogues (halves-add for packed64, halves-split for dual)
# run in XLA outside the kernel.
# ---------------------------------------------------------------------------


def _make_dual_kernel(tile_n, chunk, w, mode, in_dtype=jnp.float32):
    bf16_in = in_dtype == jnp.bfloat16
    half = w // 2

    def kernel(rsA_ref, rsB_ref, sA_ref, eA_ref, sB_ref, eB_ref, x_ref,
               out_ref, xs, sem):
        t = pl.program_id(0)
        start = jnp.minimum(rsA_ref[t], rsB_ref[t])
        end = jnp.maximum(rsA_ref[t + 1], rsB_ref[t + 1])
        out_ref[:] = jnp.zeros_like(out_ref)
        sA = sA_ref[0, 0]
        eA = eA_ref[0, 0]
        sB = sB_ref[0, 0]
        eB = eB_ref[0, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_n, w), 1)
        m_a = (lane < half).astype(jnp.float32)
        m_b = 1.0 - m_a
        c0 = start // chunk
        c1 = pl.cdiv(end, chunk)

        def dma(ci, slot):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(pl.multiple_of(ci * chunk, chunk), chunk)],
                xs.at[slot],
                sem.at[slot],
            )

        @pl.when(c0 < c1)
        def _():
            dma(c0, 0).start()

        def body(ci, _):
            slot = jax.lax.rem(ci - c0, 2)

            @pl.when(ci + 1 < c1)
            def _():
                dma(ci + 1, 1 - slot).start()

            dma(ci, slot).wait()
            rows = ci * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, tile_n), 0
            )
            oh_a = (
                (rows >= sA[None, :]) & (rows < eA[None, :])
            ).astype(jnp.bfloat16)
            oh_b = (
                (rows >= sB[None, :]) & (rows < eB[None, :])
            ).astype(jnp.bfloat16)
            c = xs[slot]
            dims = (((0,), (0,)), ((), ()))

            def fold(oh, term):
                return jax.lax.dot_general(
                    oh, term, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )

            if bf16_in:
                acc_a = fold(oh_a, c)
                acc_b = fold(oh_b, c)
            elif mode == "fast":
                cb = c.astype(jnp.bfloat16)
                acc_a = fold(oh_a, cb)
                acc_b = fold(oh_b, cb)
            else:
                c1_ = c.astype(jnp.bfloat16)
                r1 = c - c1_.astype(jnp.float32)
                c2_ = r1.astype(jnp.bfloat16)
                c3_ = (r1 - c2_.astype(jnp.float32)).astype(jnp.bfloat16)
                acc_a = fold(oh_a, c1_) + fold(oh_a, c2_) + fold(oh_a, c3_)
                acc_b = fold(oh_b, c1_) + fold(oh_b, c2_) + fold(oh_b, c3_)
            out_ref[:] += acc_a * m_a + acc_b * m_b
            return 0

        jax.lax.fori_loop(c0, c1, body, 0)

    return kernel


def _dual_impl(y, splits_a, splits_b, num_segments, tile_n, chunk, interpret,
               mode):
    """Shared lowering: ``y [R, W]``, per-stream CSR splits in ROW coords.

    ``splits_a`` / ``splits_b`` are ``[num_segments + 1]`` non-decreasing
    row boundaries of the low-lane / high-lane stream respectively. Returns
    ``[num_segments, W]`` with stream A sums in the low lanes and stream B
    sums in the high lanes.
    """
    r, w = y.shape
    n_pad = _round_up(max(num_segments, 1), tile_n)
    t = n_pad // tile_n

    def prep(splits):
        s = splits.astype(jnp.int32)
        if s.shape[0] != n_pad + 1:
            s = jnp.pad(s, (0, n_pad + 1 - s.shape[0]), mode="edge")
        return s

    sa = prep(splits_a)
    sb = prep(splits_b)
    starts_a = sa[:-1].reshape(t, 1, tile_n)
    ends_a = sa[1:].reshape(t, 1, tile_n)
    starts_b = sb[:-1].reshape(t, 1, tile_n)
    ends_b = sb[1:].reshape(t, 1, tile_n)
    rs_a = sa[::tile_n]
    rs_b = sb[::tile_n]
    r_pad = _round_up(max(r, 1), chunk)
    y_p = y if r_pad == r else jnp.pad(y, ((0, r_pad - r), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 1, tile_n), lambda i, ra, rb: (i, 0, 0)),
            pl.BlockSpec((1, 1, tile_n), lambda i, ra, rb: (i, 0, 0)),
            pl.BlockSpec((1, 1, tile_n), lambda i, ra, rb: (i, 0, 0)),
            pl.BlockSpec((1, 1, tile_n), lambda i, ra, rb: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # y stays in HBM
        ],
        out_specs=pl.BlockSpec((tile_n, w), lambda i, ra, rb: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, w), y_p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    passes = 1 if (mode == "fast" or y_p.dtype == jnp.bfloat16) else 3
    out = pl.pallas_call(
        _make_dual_kernel(tile_n, chunk, w, mode, y_p.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, w), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * r * tile_n * w * passes,
            bytes_accessed=r * w * y_p.dtype.itemsize + n_pad * w * 4,
            transcendentals=0,
        ),
    )(rs_a, rs_b, starts_a, ends_a, starts_b, ends_b, y_p)
    return out[:num_segments]


def _pick_chunk(rows: int) -> int:
    return next((c for c in (1024, 512, 256) if rows % c == 0), 256)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_segment_sum_packed64(
    x_sorted, ids_sorted, num_segments, interpret=False, mode="exact",
    splits=None,
):
    """d=64 sorted segment-sum with NO [E, 128] pad materialization.

    ``x_sorted [E, 64]`` (E even) is viewed as ``[E/2, 128]`` row pairs and
    reduced by the dual-interval kernel: even edge rows ride the low lanes
    with intervals ``[ceil(s/2), ceil(e/2))``, odd rows the high lanes with
    ``[floor(s/2), floor(e/2))``; the halves-add epilogue restores
    ``[N, 64]``. Same exactness class as the padded form (3-term bf16
    split, f32 accumulate). ``splits [num_segments + 1]`` is REQUIRED
    (host-precomputed, ``SortPlan.*_splits``).
    """
    return _packed64_impl(x_sorted, splits, num_segments, interpret, mode)


def _packed64_impl(x_sorted, splits, num_segments, interpret, mode):
    e, d = x_sorted.shape
    assert d == 64 and e % 2 == 0, (e, d)
    y = x_sorted.reshape(e // 2, 128)
    s = splits.astype(jnp.int32)[: num_segments + 1]
    lo = (s + 1) // 2   # even edges (low lanes)
    hi = s // 2         # odd edges (high lanes)
    out = _dual_impl(
        y, lo, hi, num_segments, TILE_N, _pick_chunk(e // 2), interpret, mode,
    )
    return out[:, :64] + out[:, 64:]


def _packed64_fwd(x_sorted, ids_sorted, num_segments, interpret, mode,
                  splits=None):
    out = _packed64_impl(x_sorted, splits, num_segments, interpret, mode)
    return out, (ids_sorted, splits, jnp.zeros((0,), x_sorted.dtype))


def _packed64_bwd(num_segments, interpret, mode, res, g):
    import numpy as np

    ids_sorted, splits, proto = res
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    dx = jnp.take(g, ids_sorted, axis=0).astype(proto.dtype)
    return dx, f0(ids_sorted), f0(splits)


sorted_segment_sum_packed64.defvjp(_packed64_fwd, _packed64_bwd)


def dual_sorted_segment_sum_pallas(
    xa_sorted, xb_sorted, num_segments, splits_a, splits_b,
    interpret=False, mode="exact",
):
    """Two independent sorted segment-sums fused into ONE kernel pass.

    ``xa_sorted`` / ``xb_sorted`` are ``[E, dh]`` row streams (dh ∈ {64,
    128}), each already sorted by its own segment ids whose CSR boundaries
    are ``splits_a`` / ``splits_b`` (``[num_segments + 1]``, host-
    precomputed). Returns ``(sum_a [N, dh], sum_b [N, dh])``. This is the
    (src-sorted, dst-sorted) cotangent-pair shape of every layer backward
    and of the link-prediction loss backward.

    MEASURED NEGATIVE RESULT (kept for the record, not used in
    production): at [1M] rows this one-pass form is NO faster than two
    single-stream passes (d64: 4.04 vs 4.01 ms; d128: 3.74 vs 3.12 ms —
    benchmarks/results/segsum_dual_r5.json). The lane-masked folds do 2x
    the MXU MACs (each interval set folds both lane halves), and at
    chunk=1024 the kernel is bandwidth-bound, not per-chunk-bound, so
    halving chunk iterations buys nothing. The same dual-interval
    machinery IS the production win in
    :func:`sorted_segment_sum_packed64` (one stream pair-packed into both
    halves — same MACs as the padded form, half the bytes, no pad copy).
    """
    e, dh = xa_sorted.shape
    assert xb_sorted.shape == (e, dh), (xa_sorted.shape, xb_sorted.shape)
    y = jnp.concatenate([xa_sorted, xb_sorted], axis=1)  # [E, 2*dh]
    sa = splits_a.astype(jnp.int32)[: num_segments + 1]
    sb = splits_b.astype(jnp.int32)[: num_segments + 1]
    out = _dual_impl(
        y, sa, sb, num_segments, TILE_N, _pick_chunk(e), interpret, mode,
    )
    return out[:, :dh], out[:, dh:]
