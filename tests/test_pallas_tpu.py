"""Real-chip pallas lane: the production kernels COMPILED through Mosaic.

The default suite runs the pallas kernels in interpret mode on CPU
(`tests/test_pallas_kernels.py`) — exact for semantics, blind to Mosaic
lowering regressions (layout rules, DMA scheduling, precision handling on
bf16 operands). This opt-in lane runs the same exactness asserts compiled
on the TPU:

    GHF_TPU_TESTS=1 python -m pytest -m tpu tests/test_pallas_tpu.py -q

Shapes here are ALL d=128 / 128-multiple tiles: sub-128-lane pallas blocks
wedge this stack's Mosaic compiler for minutes (CLAUDE.md) — never compile
one. Row counts stay small so the lane costs a few compiles, not minutes
of device time. Reference semantics under test: the per-edge transform and
mean-aggregation scatter of
/root/reference/graph_hypernetwork_forge/models/hypergnn.py:201-213.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("GHF_TPU_TESTS", "") != "1"
        or jax.default_backend() != "tpu",
        reason="real-chip lane: needs GHF_TPU_TESTS=1 and a TPU backend",
    ),
]

D = 128
E = 1024  # rows; multiple of both the group pad and the kernel chunk


def _case(seed=0, u=4, n=96):
    from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
    from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
        GROUP_PAD,
    )

    rng = np.random.default_rng(seed)
    ei = np.stack([rng.integers(0, n, E), rng.integers(0, n, E)])
    texts = [f"relation kind {i}" for i in range(u)]
    etexts = [texts[i] for i in rng.integers(0, u, E)]
    graph = encode_graph(
        ei, etexts, n, sort_by_relation=True, with_sort_plan=True,
        group_pad=GROUP_PAD,
    )
    u_pad = graph.char_ids.shape[0]
    h = rng.standard_normal((n, D)).astype(np.float32)
    w_msg = 0.1 * rng.standard_normal((u_pad, D, D)).astype(np.float32)
    w_self = 0.1 * rng.standard_normal((u_pad, D, D)).astype(np.float32)
    bias = 0.1 * rng.standard_normal((u_pad, D)).astype(np.float32)
    return graph, h, w_msg, w_self, bias


def test_edge_transform_combined_compiled_exact():
    from graph_hypernetwork_forge_tpu.ops.message_passing import (
        _edge_contributions_gather,
    )
    from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
        edge_transform_sorted_combined,
    )

    graph, h, w_msg, w_self, bias = _case()
    src, dst, rel, mask = (jnp.asarray(a) for a in graph.arrays[:4])
    x_src = jnp.asarray(h)[src]
    x_dst = jnp.asarray(h)[dst]
    got = edge_transform_sorted_combined(
        x_src, x_dst, rel, jnp.asarray(w_msg), jnp.asarray(w_self),
        jnp.asarray(bias), jnp.asarray(graph.sort_plan.rel_splits),
    )
    msg, selfc = _edge_contributions_gather(
        jnp.asarray(h), src, dst, rel, jnp.asarray(w_msg),
        jnp.asarray(w_self), jnp.asarray(bias),
        jax.lax.Precision.HIGHEST,
    )
    want = np.asarray(msg) + np.asarray(selfc)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_edge_transform_combined_compiled_vjp():
    from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
        edge_transform_sorted_combined,
    )

    graph, h, w_msg, w_self, bias = _case(seed=1)
    src, dst, rel, mask = (jnp.asarray(a) for a in graph.arrays[:4])
    x_src = jnp.asarray(h)[src]
    x_dst = jnp.asarray(h)[dst]
    splits = jnp.asarray(graph.sort_plan.rel_splits)
    args = (x_src, x_dst, jnp.asarray(w_msg), jnp.asarray(w_self),
            jnp.asarray(bias))

    def f_pallas(xs, xd, wm, ws, bb):
        return jnp.sum(
            edge_transform_sorted_combined(xs, xd, rel, wm, ws, bb, splits)
            ** 2
        )

    def f_ref(xs, xd, wm, ws, bb):
        gs = jnp.asarray(np.diff(np.asarray(splits)).astype(np.int32))
        hi = jax.lax.Precision.HIGHEST  # default is bf16-class on TPU
        out = (
            jax.lax.ragged_dot(xs, wm, gs, precision=hi)
            + jax.lax.ragged_dot(xd, ws, gs, precision=hi)
            + bb[rel]
        )
        return jnp.sum(out ** 2)

    g_pallas = jax.grad(f_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_pallas, g_ref):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-5
        )


def test_segment_sum_compiled_exact_and_hostsplits():
    from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
        sorted_segment_sum_pallas,
    )

    rng = np.random.default_rng(2)
    n = 200
    x = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    ids = np.sort(rng.integers(0, n, E)).astype(np.int32)
    want = np.asarray(
        jax.ops.segment_sum(x, jnp.asarray(ids), num_segments=n)
    )
    got = np.asarray(sorted_segment_sum_pallas(x, jnp.asarray(ids), n))
    np.testing.assert_allclose(got, want, atol=1e-4)
    rel = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-9)
    assert rel < 1e-5, f"exact mode drifted: rel err {rel}"

    splits = jnp.asarray(
        np.searchsorted(ids, np.arange(n + 1), side="left").astype(np.int32)
    )
    got2 = np.asarray(
        sorted_segment_sum_pallas(
            x, jnp.asarray(ids), n, 128, 256, False, "exact", splits
        )
    )
    np.testing.assert_allclose(got2, want, atol=1e-4)


def test_segment_sum_compiled_bf16_input():
    """Speed-mode path: bf16 rows, f32 accumulation, no HIGHEST request on
    bf16 operands (the Mosaic 'Bad lhs type' regression class)."""
    from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
        sorted_segment_sum_pallas,
    )

    rng = np.random.default_rng(3)
    n = 100
    x32 = rng.standard_normal((E, D)).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    ids = np.sort(rng.integers(0, n, E)).astype(np.int32)
    got = np.asarray(sorted_segment_sum_pallas(x, jnp.asarray(ids), n))
    want = np.asarray(
        jax.ops.segment_sum(
            x.astype(jnp.float32), jnp.asarray(ids), num_segments=n
        )
    )
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)
