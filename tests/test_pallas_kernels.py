"""Pallas kernel tests (interpret mode on CPU; compiled on TPU).

The streaming edge-transform kernel (``ops/pallas/edge_transform.py``)
requires the group-padded sorted layout (single-relation tiles,
``encode_graph(sort_by_relation=True, group_pad=T)``). Each test validates
against the jnp gather oracle, including the custom VJP — the property
tests the build plan requires for every kernel (SURVEY.md §7.2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
from graph_hypernetwork_forge_tpu.ops.message_passing import (
    _edge_contributions_gather,
    relational_message_passing,
)
from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
    GROUP_PAD,
    edge_contributions_pallas_sorted,
    edge_transform_sorted,
)

INTERPRET = jax.default_backend() != "tpu"
# The kernel tile must DIVIDE the encode-time group pad (group boundaries
# stay tile-aligned); the canonical layout uses GROUP_PAD for both.
TILE = GROUP_PAD


def make_case(seed=0, n=64, e=500, u=7, d_in=16, tile=TILE, plan=True):
    """Group-padded sorted graph + random weights (d_out = d_in)."""
    rng = np.random.default_rng(seed)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    texts = [f"relation kind {i}" for i in range(u)]
    etexts = [texts[i] for i in rng.integers(0, u, e)]
    graph = encode_graph(
        ei, etexts, n, sort_by_relation=True, with_sort_plan=plan,
        group_pad=tile,
    )
    u_pad = graph.char_ids.shape[0]
    h = rng.standard_normal((n, d_in)).astype(np.float32)
    w_msg = 0.1 * rng.standard_normal((u_pad, d_in, d_in)).astype(np.float32)
    w_self = 0.1 * rng.standard_normal((u_pad, d_in, d_in)).astype(np.float32)
    bias = 0.1 * rng.standard_normal((u_pad, d_in)).astype(np.float32)
    return graph, h, w_msg, w_self, bias


class TestGroupPaddedLayout:
    def test_tiles_are_single_relation(self):
        graph, *_ = make_case(0)
        assert graph.group_pad == TILE
        rel = graph.rel_ids.reshape(-1, TILE)
        assert (rel == rel[:, :1]).all()
        assert (np.diff(graph.rel_ids) >= 0).all()

    def test_real_edges_preserved(self):
        rng = np.random.default_rng(3)
        n, e, u = 40, 333, 5
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        texts = [f"r{i}" for i in range(u)]
        etexts = [texts[i] for i in rng.integers(0, u, e)]
        plain = encode_graph(ei, etexts, n, sort_by_relation=True)
        padded = encode_graph(
            ei, etexts, n, sort_by_relation=True, group_pad=TILE
        )
        real_p = padded.edge_mask > 0
        real_s = plain.edge_mask > 0
        # Same multiset of (src, dst, rel) real edges, same relative order.
        np.testing.assert_array_equal(padded.src[real_p], plain.src[real_s])
        np.testing.assert_array_equal(padded.dst[real_p], plain.dst[real_s])
        np.testing.assert_array_equal(
            padded.rel_ids[real_p], plain.rel_ids[real_s]
        )
        assert padded.num_edges == e
        assert padded.src.shape[0] % TILE == 0


class TestEdgeTransformSorted:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_reference(self, seed):
        graph, h, w_msg, w_self, bias = make_case(seed)
        src, dst, rel = (
            jnp.asarray(graph.src), jnp.asarray(graph.dst),
            jnp.asarray(graph.rel_ids),
        )
        got_msg, got_selfc = edge_transform_sorted(
            jnp.asarray(h)[src], jnp.asarray(h)[dst], rel,
            jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
            TILE, INTERPRET,
        )
        want_msg, want_selfc = _edge_contributions_gather(
            jnp.asarray(h), src, dst, rel,
            jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
            jax.lax.Precision.HIGHEST,
        )
        np.testing.assert_allclose(
            np.asarray(got_msg), np.asarray(want_msg), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_selfc), np.asarray(want_selfc), atol=1e-5, rtol=1e-5
        )

    def test_vjp_matches_reference(self):
        graph, h, w_msg, w_self, bias = make_case(3)
        rel = jnp.asarray(graph.rel_ids)
        mask = jnp.asarray(graph.edge_mask)
        x_src = jnp.asarray(h)[jnp.asarray(graph.src)]
        x_dst = jnp.asarray(h)[jnp.asarray(graph.dst)]
        args = (x_src, x_dst, jnp.asarray(w_msg), jnp.asarray(w_self),
                jnp.asarray(bias))

        def loss_pallas(x_src, x_dst, w_msg, w_self, bias):
            m, s = edge_transform_sorted(
                x_src, x_dst, rel, w_msg, w_self, bias, TILE, INTERPRET,
            )
            return jnp.sum(m * m * mask[:, None]) + jnp.sum(s * mask[:, None])

        def loss_ref(x_src, x_dst, w_msg, w_self, bias):
            m = (
                jnp.einsum("ed,edo->eo", x_src, w_msg[rel],
                           precision=jax.lax.Precision.HIGHEST)
                + bias[rel]
            )
            s = jnp.einsum("ed,edo->eo", x_dst, w_self[rel],
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(m * m * mask[:, None]) + jnp.sum(s * mask[:, None])

        got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=2e-4, rtol=1e-4
            )


class TestEdgeTransformCombined:
    def test_matches_two_output_sum(self):
        from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
            edge_transform_sorted_combined,
        )

        graph, h, w_msg, w_self, bias = make_case(8)
        src, dst, rel = (
            jnp.asarray(graph.src), jnp.asarray(graph.dst),
            jnp.asarray(graph.rel_ids),
        )
        got = edge_transform_sorted_combined(
            jnp.asarray(h)[src], jnp.asarray(h)[dst], rel,
            jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
            None, TILE, INTERPRET,
        )
        m, s = edge_transform_sorted(
            jnp.asarray(h)[src], jnp.asarray(h)[dst], rel,
            jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
            TILE, INTERPRET,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(m + s), atol=1e-5, rtol=1e-5
        )

    @pytest.mark.parametrize("with_splits", [False, True])
    def test_vjp_matches_reference(self, with_splits):
        from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
            edge_transform_sorted_combined,
        )

        graph, h, w_msg, w_self, bias = make_case(9, plan=True)
        rel = jnp.asarray(graph.rel_ids)
        mask = jnp.asarray(graph.edge_mask)
        splits = (
            jnp.asarray(graph.sort_plan.rel_splits) if with_splits else None
        )
        x_src = jnp.asarray(h)[jnp.asarray(graph.src)]
        x_dst = jnp.asarray(h)[jnp.asarray(graph.dst)]
        args = (x_src, x_dst, jnp.asarray(w_msg), jnp.asarray(w_self),
                jnp.asarray(bias))

        def loss_pallas(x_src, x_dst, w_msg, w_self, bias):
            c = edge_transform_sorted_combined(
                x_src, x_dst, rel, w_msg, w_self, bias, splits, TILE,
                INTERPRET,
            )
            return jnp.sum(c * c * mask[:, None])

        def loss_ref(x_src, x_dst, w_msg, w_self, bias):
            c = (
                jnp.einsum("ed,edo->eo", x_src, w_msg[rel],
                           precision=jax.lax.Precision.HIGHEST)
                + bias[rel]
                + jnp.einsum("ed,edo->eo", x_dst, w_self[rel],
                             precision=jax.lax.Precision.HIGHEST)
            )
            return jnp.sum(c * c * mask[:, None])

        got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=2e-4, rtol=1e-4
            )


class TestPallasBackendIntegration:
    def test_message_passing_matches_gather_backend(self):
        """Full layer through backend='pallas' (sort-plan routed gathers)
        == the gather parity oracle, forward and backward."""
        graph, h, w_msg, w_self, bias = make_case(5, plan=True)
        arrays = (
            jnp.asarray(graph.src), jnp.asarray(graph.dst),
            jnp.asarray(graph.rel_ids), jnp.asarray(graph.edge_mask),
        )
        plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
        n = graph.num_nodes

        def run(backend, use_plan):
            def f(h, w_msg, w_self, bias):
                out = relational_message_passing(
                    h, arrays[0], arrays[1], arrays[2], w_msg, w_self, bias,
                    num_nodes=n, edge_mask=arrays[3], backend=backend,
                    rel_sorted=(backend == "pallas"),
                    sort_plan=plan if use_plan else None,
                )
                return jnp.sum(out * out), out

            (loss, out), grads = jax.value_and_grad(
                f, argnums=(0, 1, 2, 3), has_aux=True
            )(jnp.asarray(h), jnp.asarray(w_msg), jnp.asarray(w_self),
              jnp.asarray(bias))
            return out, grads

        out_p, grads_p = run("pallas", True)
        out_g, grads_g = run("gather", False)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_g), atol=1e-5, rtol=1e-5
        )
        for a, b in zip(grads_p, grads_g):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
            )

    def test_sorted_entry_without_plan(self):
        graph, h, w_msg, w_self, bias = make_case(6, plan=False)
        got = edge_contributions_pallas_sorted(
            jnp.asarray(h), jnp.asarray(graph.src), jnp.asarray(graph.dst),
            jnp.asarray(graph.rel_ids), jnp.asarray(w_msg),
            jnp.asarray(w_self), jnp.asarray(bias), interpret=INTERPRET,
            tile_e=TILE,
        )
        want = _edge_contributions_gather(
            jnp.asarray(h), jnp.asarray(graph.src), jnp.asarray(graph.dst),
            jnp.asarray(graph.rel_ids), jnp.asarray(w_msg),
            jnp.asarray(w_self), jnp.asarray(bias),
            jax.lax.Precision.HIGHEST,
        )
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-5
            )


class TestSortedSegmentSumPallas:
    """CSR-style Pallas segment-sum vs jax.ops.segment_sum (interpret on
    CPU): exact reduction, ragged segment boundaries, empty segments,
    masked pad rows, and the gather backward."""

    def _case(self, seed=0, e=2000, n=300, d=128, skew=False):
        rng = np.random.default_rng(seed)
        if skew:
            ids = np.sort(
                np.minimum(
                    (rng.pareto(1.0, e) * 10).astype(np.int64), n - 1
                )
            )
        else:
            ids = np.sort(rng.integers(0, n, e))
        x = rng.standard_normal((e, d)).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(ids.astype(np.int32)), n

    @pytest.mark.parametrize("skew", [False, True])
    def test_matches_segment_sum(self, skew):
        from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
            sorted_segment_sum_pallas,
        )

        x, ids, n = self._case(skew=skew)
        got = sorted_segment_sum_pallas(x, ids, n, 256, 256, INTERPRET)
        want = jax.ops.segment_sum(
            x, ids, num_segments=n, indices_are_sorted=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5
        )

    def test_empty_trailing_segments_and_zero_pad_rows(self):
        from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
            sorted_segment_sum_pallas,
        )

        x, ids, n = self._case(seed=3, e=700, n=900)
        # Masked pad rows at the sorted front (dst 0), like the encoder's.
        x = x.at[:50].set(0.0)
        got = sorted_segment_sum_pallas(x, ids, n, 256, 256, INTERPRET)
        want = jax.ops.segment_sum(x, ids, num_segments=n)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5
        )

    def test_host_splits_match_in_jit_searchsorted(self):
        # Production path: CSR boundaries come host-precomputed
        # (SortPlan.*_splits) — must be numerically identical to the
        # standalone in-jit searchsorted path.
        from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
            sorted_segment_sum_pallas,
        )

        x, ids, n = self._case(seed=7, e=1500, n=277)
        splits = jnp.asarray(
            np.searchsorted(
                np.asarray(ids), np.arange(n + 1), side="left"
            ).astype(np.int32)
        )
        got = sorted_segment_sum_pallas(
            x, ids, n, 128, 256, INTERPRET, "exact", splits
        )
        want = jax.ops.segment_sum(x, ids, num_segments=n)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5
        )

    def test_fast_mode_is_bf16_class(self):
        from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
            sorted_segment_sum_pallas,
        )

        x, ids, n = self._case(seed=11, e=1200, n=150)
        got = sorted_segment_sum_pallas(x, ids, n, 128, 256, INTERPRET,
                                        "fast")
        want = jax.ops.segment_sum(x, ids, num_segments=n)
        scale = float(jnp.max(jnp.abs(want)))
        err = float(jnp.max(jnp.abs(got - want)))
        assert err / scale < 3e-2      # bf16-class, not garbage
        assert err / scale > 1e-6      # and genuinely single-pass

    def test_backward_is_gather(self):
        from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
            sorted_segment_sum_pallas,
        )

        x, ids, n = self._case(seed=5, e=600, n=200)
        w = jnp.asarray(
            np.random.default_rng(9).standard_normal((n, 128)).astype(
                np.float32
            )
        )

        def f_pallas(x):
            return jnp.sum(
                sorted_segment_sum_pallas(x, ids, n, 256, 256, INTERPRET) * w
            )

        def f_ref(x):
            return jnp.sum(
                jax.ops.segment_sum(x, ids, num_segments=n) * w
            )

        np.testing.assert_allclose(
            np.asarray(jax.grad(f_pallas)(x)),
            np.asarray(jax.grad(f_ref)(x)),
            atol=1e-4, rtol=1e-5,
        )


class TestPairPackedBackend:
    """Pair-packed d=64 path: two same-relation rows per 128-lane row with
    block-diagonal banks — must equal the gather oracle exactly (fwd and
    every gradient), since blockdiag(W, W) reproduces both rows' x @ W and
    the packed output reshape is a bijection."""

    def _case(self, seed=0, n=48, e=300, u=5):
        rng = np.random.default_rng(seed)
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        texts = [f"relation kind {i}" for i in range(u)]
        etexts = [texts[i] for i in rng.integers(0, u, e)]
        graph = encode_graph(
            ei, etexts, n, sort_by_relation=True, with_sort_plan=True,
            group_pad=GROUP_PAD,
        )
        u_pad = graph.char_ids.shape[0]
        d = 64
        h = rng.standard_normal((n, d)).astype(np.float32)
        w_msg = 0.1 * rng.standard_normal((u_pad, d, d)).astype(np.float32)
        w_self = 0.1 * rng.standard_normal((u_pad, d, d)).astype(np.float32)
        bias = 0.1 * rng.standard_normal((u_pad, d)).astype(np.float32)
        return graph, h, w_msg, w_self, bias

    def test_matches_gather_backend(self):
        graph, h, w_msg, w_self, bias = self._case()
        plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
        args = (
            jnp.asarray(h), jnp.asarray(graph.src), jnp.asarray(graph.dst),
            jnp.asarray(graph.rel_ids), jnp.asarray(w_msg),
            jnp.asarray(w_self), jnp.asarray(bias),
        )
        got = relational_message_passing(
            *args, edge_mask=jnp.asarray(graph.edge_mask),
            backend="pallas_packed", rel_sorted=True, group_padded=True,
            sort_plan=plan,
        )
        want = relational_message_passing(
            *args, edge_mask=jnp.asarray(graph.edge_mask),
            backend="gather",
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5
        )

    def test_gradients_match_gather_backend(self):
        graph, h, w_msg, w_self, bias = self._case(seed=3)
        plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
        mask = jnp.asarray(graph.edge_mask)
        arrs = (
            jnp.asarray(graph.src), jnp.asarray(graph.dst),
            jnp.asarray(graph.rel_ids),
        )

        def loss(backend, h_, wm, ws, bb):
            kw = {}
            if backend == "pallas_packed":
                kw = dict(rel_sorted=True, group_padded=True, sort_plan=plan)
            out = relational_message_passing(
                h_, *arrs, wm, ws, bb, edge_mask=mask, backend=backend, **kw
            )
            return jnp.sum(out ** 2)

        inputs = (
            jnp.asarray(h), jnp.asarray(w_msg), jnp.asarray(w_self),
            jnp.asarray(bias),
        )
        g_packed = jax.grad(
            lambda *a: loss("pallas_packed", *a), argnums=(0, 1, 2, 3)
        )(*inputs)
        g_ref = jax.grad(
            lambda *a: loss("gather", *a), argnums=(0, 1, 2, 3)
        )(*inputs)
        for a, b in zip(g_packed, g_ref):
            scale = max(1.0, float(jnp.max(jnp.abs(b))))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-5
            )

    def test_rejects_bad_layout(self):
        graph, h, w_msg, w_self, bias = self._case(seed=1)
        with pytest.raises(ValueError):
            relational_message_passing(
                jnp.asarray(h), jnp.asarray(graph.src),
                jnp.asarray(graph.dst), jnp.asarray(graph.rel_ids),
                jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
                backend="pallas_packed", rel_sorted=False,
            )


class TestDualIntervalSegmentSum:
    """Dual-interval lane-masked CSR kernel: the packed64 (pad-free d=64)
    and dual-stream (two cotangents, one pass) wrappers vs the
    jax.ops.segment_sum oracle (interpret mode on CPU)."""

    @staticmethod
    def _sorted_ids(rng, e, n, skew):
        if skew == "uniform":
            ids = np.sort(rng.integers(0, n, e))
        elif skew == "hot":
            # Hot node 0 + sparse tail: exercises long and empty segments.
            ids = np.sort(
                np.where(rng.random(e) < 0.5, 0, rng.integers(0, n, e))
            )
        else:  # singletons at odd offsets: partial-pair boundary coverage
            ids = np.sort(rng.integers(0, n, e))
            ids[: e // 2] = np.arange(e // 2) % n
            ids = np.sort(ids)
        return ids.astype(np.int32)

    @pytest.mark.parametrize("skew", ["uniform", "hot", "odd"])
    @pytest.mark.parametrize("e,n", [(1024, 300), (1538, 97)])
    def test_packed64_matches_segment_sum(self, skew, e, n):
        from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
            sorted_segment_sum_packed64,
        )

        rng = np.random.default_rng(hash((skew, e, n)) % 2**31)
        ids = self._sorted_ids(rng, e, n, skew)
        x = jnp.asarray(rng.standard_normal((e, 64)).astype(np.float32))
        splits = jnp.asarray(
            np.searchsorted(ids, np.arange(n + 1), side="left").astype(
                np.int32
            )
        )
        got = sorted_segment_sum_packed64(
            x, jnp.asarray(ids), n, INTERPRET, "exact", splits
        )
        want = jax.ops.segment_sum(x, jnp.asarray(ids), num_segments=n)
        # Summation-order error class of the 3-term bf16 split (documented
        # rel ~2e-7 of the segment magnitude; hot segments reach |sum|~50).
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-6, atol=2e-5
        )

    def test_packed64_backward_is_gather(self):
        from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
            sorted_segment_sum_packed64,
        )

        rng = np.random.default_rng(5)
        e, n = 512, 40
        ids = np.sort(rng.integers(0, n, e)).astype(np.int32)
        x = jnp.asarray(rng.standard_normal((e, 64)).astype(np.float32))
        splits = jnp.asarray(
            np.searchsorted(ids, np.arange(n + 1)).astype(np.int32)
        )
        w = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
        g1 = jax.grad(
            lambda xx: jnp.sum(
                sorted_segment_sum_packed64(
                    xx, jnp.asarray(ids), n, INTERPRET, "exact", splits
                )
                * w
            )
        )(x)
        g2 = jax.grad(
            lambda xx: jnp.sum(
                jax.ops.segment_sum(xx, jnp.asarray(ids), num_segments=n) * w
            )
        )(x)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-6, atol=1e-6
        )

    @pytest.mark.parametrize("dh", [64, 128])
    def test_dual_matches_two_segment_sums(self, dh):
        from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
            dual_sorted_segment_sum_pallas,
        )

        rng = np.random.default_rng(11 + dh)
        e, n = 1024, 200
        ids_a = np.sort(rng.integers(0, n, e)).astype(np.int32)
        ids_b = np.sort(
            np.where(rng.random(e) < 0.3, 3, rng.integers(0, n, e))
        ).astype(np.int32)
        xa = jnp.asarray(rng.standard_normal((e, dh)).astype(np.float32))
        xb = jnp.asarray(rng.standard_normal((e, dh)).astype(np.float32))
        sp = lambda ids: jnp.asarray(
            np.searchsorted(ids, np.arange(n + 1)).astype(np.int32)
        )
        got_a, got_b = dual_sorted_segment_sum_pallas(
            xa, xb, n, sp(ids_a), sp(ids_b), interpret=INTERPRET
        )
        want_a = jax.ops.segment_sum(xa, jnp.asarray(ids_a), num_segments=n)
        want_b = jax.ops.segment_sum(xb, jnp.asarray(ids_b), num_segments=n)
        np.testing.assert_allclose(
            np.asarray(got_a), np.asarray(want_a), rtol=5e-6, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_b), np.asarray(want_b), rtol=5e-6, atol=2e-5
        )

    def test_dual_bf16_inputs_accumulate_f32(self):
        from graph_hypernetwork_forge_tpu.ops.pallas.segment_sum import (
            dual_sorted_segment_sum_pallas,
        )

        rng = np.random.default_rng(7)
        e, n = 512, 64
        ids = np.sort(rng.integers(0, n, e)).astype(np.int32)
        xa = jnp.asarray(
            rng.standard_normal((e, 64)).astype(np.float32)
        ).astype(jnp.bfloat16)
        sp = jnp.asarray(np.searchsorted(ids, np.arange(n + 1)).astype(np.int32))
        got_a, got_b = dual_sorted_segment_sum_pallas(
            xa, xa, n, sp, sp, interpret=INTERPRET
        )
        want = jax.ops.segment_sum(
            xa.astype(jnp.float32), jnp.asarray(ids), num_segments=n
        )
        assert got_a.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(want), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_b), np.asarray(want), atol=1e-5)


class TestTakeRowsPair:
    def test_forward_and_grad_match_two_take_rows(self):
        from graph_hypernetwork_forge_tpu.ops.segment import (
            take_rows_pair,
            take_rows_sorted,
        )

        rng = np.random.default_rng(3)
        n, e, d = 50, 400, 64
        table = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        idx_a = rng.integers(0, n, e)
        idx_b = rng.integers(0, n, e)

        def plan(idx):
            perm = np.argsort(idx, kind="stable")
            srt = idx[perm]
            splits = np.searchsorted(srt, np.arange(n + 1)).astype(np.int32)
            return (
                jnp.asarray(perm.astype(np.int32)),
                jnp.asarray(srt.astype(np.int32)),
                jnp.asarray(splits),
            )

        pa, sa, spa = plan(idx_a)
        pb, sb, spb = plan(idx_b)
        ia, ib = jnp.asarray(idx_a), jnp.asarray(idx_b)
        w = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))

        def f_pair(t):
            xa, xb = take_rows_pair(n, t, ia, ib, pa, sa, spa, pb, sb, spb)
            return jnp.sum(xa * w) + jnp.sum(xb * w ** 2)

        def f_two(t):
            xa = take_rows_sorted(n, t, ia, pa, sa, spa)
            xb = take_rows_sorted(n, t, ib, pb, sb, spb)
            return jnp.sum(xa * w) + jnp.sum(xb * w ** 2)

        np.testing.assert_allclose(
            float(f_pair(table)), float(f_two(table)), rtol=1e-6
        )
        g1 = jax.grad(f_pair)(table)
        g2 = jax.grad(f_two)(table)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-6, atol=1e-6
        )
