"""Pallas TPU kernel: sorted segment-sum at HBM-bandwidth speed.

XLA's ``jax.ops.segment_sum`` on TPU costs 12-18 ms for a ``[1M, 128]``
reduction even with the ``indices_are_sorted`` hint, vs a ~0.7 ms HBM
roofline (read E·d floats, write N·d). With 6-8 such reductions per xl
train step (aggregation tails + gather cotangents), this is the single
largest off-roofline cost (``benchmarks/xl_breakdown.py``).

This kernel computes the reduction as a CSR-style pass over the dst-sorted
edge rows:

- the grid runs over NODE tiles (``TILE_N`` output rows per program);
- per-node row boundaries come from ONE in-jit ``searchsorted`` over the
  static sorted ids (no sort): ``starts/ends [T, TILE_N]`` ride in as
  normal VMEM-blocked inputs, and a scalar-prefetched ``row_start [T+1]``
  bounds each tile's chunk loop;
- the kernel streams the tile's edge rows from HBM in CHUNK-aligned
  slices with explicit async DMA and accumulates each chunk with ONE MXU
  matmul: ``out += interval_onehot ᵀ @ chunk``, where
  ``interval_onehot[r, j] = starts[j] <= r < ends[j]`` is built by two
  VPU compares against the global row index — no per-edge id traffic at
  all, and rows outside the tile's range (shared boundary chunks) match
  no interval, so no extra masking is needed.

This is the classic one-hot segmented-matmul trick: the vector scatter
becomes systolic-array work (~2·TILE_N MACs/edge-element — noise next to
MXU throughput).

Exactness: one-hot entries are exactly 0/1 and the dot runs at
``precision="highest"`` (f32-exact products), so the result differs from
``jax.ops.segment_sum`` only by f32 summation order (the same class of
difference as any reduction reorder; parity gates at 3e-5 are unaffected).

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

TILE_N = 256
CHUNK = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(tile_n, chunk, d, precision):
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

        def body(ci, _):
            off = pl.multiple_of(ci * chunk, chunk)
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(off, chunk)], xs, sem
            )
            cp.start()
            cp.wait()
            rows = off + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, tile_n), 0
            )
            onehot = (
                (rows >= starts[None, :]) & (rows < ends[None, :])
            ).astype(jnp.float32)
            out_ref[:] += jax.lax.dot_general(
                onehot, xs[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(c0, c1, body, 0)

    return kernel


def _impl(x_sorted, ids_sorted, num_segments, tile_n, chunk, interpret,
          precision):
    e, d = x_sorted.shape
    n_pad = _round_up(max(num_segments, 1), tile_n)
    t = n_pad // tile_n
    ids32 = ids_sorted.astype(jnp.int32)
    # Per-node edge-row boundaries: binary search over the static sorted
    # ids — no device sort anywhere.
    bounds = jnp.arange(n_pad + 1, dtype=jnp.int32)
    splits = jnp.searchsorted(ids32, bounds, side="left").astype(jnp.int32)
    starts = splits[:-1].reshape(t, 1, tile_n)
    ends = splits[1:].reshape(t, 1, tile_n)
    row_start = splits[:: tile_n]  # [t + 1] tile-level chunk-loop bounds
    # Pad rows so the last chunk-aligned DMA slice is in bounds (padded
    # rows' global index >= end matches no node interval).
    e_pad = _round_up(e, chunk) + chunk
    x_p = jnp.pad(x_sorted, ((0, e_pad - e), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 1, tile_n), lambda i, rs: (i, 0, 0)),
            pl.BlockSpec((1, 1, tile_n), lambda i, rs: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i, rs: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((chunk, d), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(tile_n, chunk, d, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e * tile_n * d,
            bytes_accessed=e * d * 4 + n_pad * d * 4,
            transcendentals=0,
        ),
    )(row_start, starts, ends, x_p)
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def sorted_segment_sum_pallas(
    x_sorted, ids_sorted, num_segments, tile_n=TILE_N, chunk=CHUNK,
    interpret=False, precision=jax.lax.Precision.HIGHEST,
):
    """Segment-sum of rows grouped by non-decreasing ``ids_sorted``.

    Drop-in for ``jax.ops.segment_sum(..., indices_are_sorted=True)`` on
    sorted inputs with d % 128 == 0 (see module docstring). ``ids_sorted``
    is graph structure — not differentiated; the backward is a row gather.
    """
    return _impl(
        x_sorted, ids_sorted, num_segments, tile_n, chunk, interpret,
        precision,
    )


def _fwd(x_sorted, ids_sorted, num_segments, tile_n, chunk, interpret,
         precision):
    out = _impl(
        x_sorted, ids_sorted, num_segments, tile_n, chunk, interpret,
        precision,
    )
    return out, ids_sorted


def _bwd(num_segments, tile_n, chunk, interpret, precision, ids_sorted, g):
    import numpy as np

    dids = np.zeros(ids_sorted.shape, dtype=jax.dtypes.float0)
    return jnp.take(g, ids_sorted, axis=0), dids


sorted_segment_sum_pallas.defvjp(_fwd, _bwd)
