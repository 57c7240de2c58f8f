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
