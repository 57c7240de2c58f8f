"""Unit tests for segment ops and the relational message-passing core."""

from dataclasses import replace as dataclasses_replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hypernetwork_forge_tpu.ops.message_passing import (
    relational_message_passing,
)
from graph_hypernetwork_forge_tpu.ops.segment import (
    segment_count,
    segment_mean_clamped,
    segment_sum,
)


def make_random_case(seed, n=12, e=40, u=5, d_in=8, d_out=8):
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n, d_in)).astype(np.float32)
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    rel = rng.integers(0, u, size=e).astype(np.int32)
    w_msg = rng.standard_normal((u, d_in, d_out)).astype(np.float32) * 0.1
    w_self = rng.standard_normal((u, d_in, d_out)).astype(np.float32) * 0.1
    bias = rng.standard_normal((u, d_out)).astype(np.float32) * 0.1
    return h, src, dst, rel, w_msg, w_self, bias


def numpy_oracle(h, src, dst, rel, w_msg, w_self, bias):
    """Straightforward per-edge loop oracle of the reference semantics
    (models/hypergnn.py:160-230)."""
    n, d_in = h.shape
    d_out = w_msg.shape[-1]
    agg = np.zeros((n, d_out), dtype=np.float64)
    wself_sum = np.zeros((n, d_in, d_out), dtype=np.float64)
    cnt = np.zeros(n, dtype=np.float64)
    for s, t, r in zip(src, dst, rel):
        agg[t] += h[s] @ w_msg[r] + bias[r]
        wself_sum[t] += w_self[r]
        cnt[t] += 1
    c = np.maximum(cnt, 1.0)
    agg = agg / c[:, None]
    self_out = np.einsum("nd,ndo->no", h.astype(np.float64), wself_sum / c[:, None, None])
    return (agg + self_out).astype(np.float32)


class TestSegmentOps:
    def test_segment_sum_basic(self):
        data = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
        ids = jnp.asarray([0, 2, 0])
        out = segment_sum(data, ids, 3)
        np.testing.assert_allclose(
            np.asarray(out), [[6.0, 8.0], [0.0, 0.0], [3.0, 4.0]]
        )

    def test_segment_count_weighted(self):
        ids = jnp.asarray([0, 0, 1, 2])
        w = jnp.asarray([1.0, 0.0, 1.0, 1.0])
        out = segment_count(ids, 3, weights=w)
        np.testing.assert_allclose(np.asarray(out), [1.0, 1.0, 1.0])

    def test_segment_mean_clamped_empty_segment(self):
        data = jnp.asarray([[2.0], [4.0]])
        ids = jnp.asarray([0, 0])
        mean, cnt = segment_mean_clamped(data, ids, 3)
        np.testing.assert_allclose(np.asarray(mean), [[3.0], [0.0], [0.0]])
        np.testing.assert_allclose(np.asarray(cnt), [2.0, 1.0, 1.0])


class TestMessagePassing:
    @pytest.mark.parametrize("backend", ["dense", "grouped", "gather"])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_oracle(self, backend, seed):
        case = make_random_case(seed)
        want = numpy_oracle(*case)
        h, src, dst, rel, w_msg, w_self, bias = (jnp.asarray(x) for x in case)
        got = relational_message_passing(
            h, src, dst, rel, w_msg, w_self, bias, backend=backend
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("backend", ["dense", "grouped", "gather"])
    def test_non_square(self, backend):
        case = make_random_case(3, d_in=8, d_out=16)
        want = numpy_oracle(*case)
        got = relational_message_passing(
            *(jnp.asarray(x) for x in case), backend=backend
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)

    def test_edge_mask_matches_subgraph(self):
        """Masked-out edges behave exactly as if absent."""
        h, src, dst, rel, w_msg, w_self, bias = make_random_case(4, e=20)
        keep = 12
        want = numpy_oracle(
            h, src[:keep], dst[:keep], rel[:keep], w_msg, w_self, bias
        )
        mask = np.zeros(20, dtype=np.float32)
        mask[:keep] = 1.0
        got = relational_message_passing(
            jnp.asarray(h),
            jnp.asarray(src),
            jnp.asarray(dst),
            jnp.asarray(rel),
            jnp.asarray(w_msg),
            jnp.asarray(w_self),
            jnp.asarray(bias),
            edge_mask=jnp.asarray(mask),
            backend="dense",
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)

    def test_isolated_nodes_zero(self):
        """Nodes with no in-edges produce exactly zero (the reference quirk)."""
        h, src, dst, rel, w_msg, w_self, bias = make_random_case(5, n=10, e=6)
        dst = np.minimum(dst, 4).astype(np.int32)  # nodes 5..9 isolated
        got = np.asarray(
            relational_message_passing(
                jnp.asarray(h),
                jnp.asarray(src),
                jnp.asarray(dst),
                jnp.asarray(rel),
                jnp.asarray(w_msg),
                jnp.asarray(w_self),
                jnp.asarray(bias),
                backend="dense",
            )
        )
        np.testing.assert_array_equal(got[5:], np.zeros_like(got[5:]))

    def test_grad_flows(self):
        case = make_random_case(6)
        h, src, dst, rel, w_msg, w_self, bias = (jnp.asarray(x) for x in case)

        def loss(h, w_msg, w_self, bias):
            out = relational_message_passing(
                h, src, dst, rel, w_msg, w_self, bias, backend="dense"
            )
            return jnp.sum(out**2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(h, w_msg, w_self, bias)
        for g in grads:
            assert bool(jnp.any(g != 0))
            assert bool(jnp.all(jnp.isfinite(g)))


class TestGroupedBackend:
    def test_empty_relation_groups(self):
        """Relations with zero edges must not perturb the ragged matmul."""
        h, src, dst, rel, w_msg, w_self, bias = make_random_case(3, u=6)
        rel = np.where(rel == 2, 5, rel).astype(np.int32)  # relation 2 unused
        args = (h, src, dst, rel, w_msg, w_self, bias)
        expected = numpy_oracle(*[np.asarray(a) for a in args])
        out = relational_message_passing(
            *(jnp.asarray(x) for x in args), backend="grouped"
        )
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)

    def test_masked_matches_dense(self):
        h, src, dst, rel, w_msg, w_self, bias = make_random_case(4)
        mask = (np.arange(len(src)) % 3 != 0).astype(np.float32)
        args = tuple(jnp.asarray(x) for x in (h, src, dst, rel, w_msg, w_self, bias))
        dense = relational_message_passing(
            *args, edge_mask=jnp.asarray(mask), backend="dense"
        )
        grouped = relational_message_passing(
            *args, edge_mask=jnp.asarray(mask), backend="grouped"
        )
        np.testing.assert_allclose(
            np.asarray(grouped), np.asarray(dense), atol=2e-5
        )

    def test_rel_sorted_fast_path(self):
        """Pre-sorted edges + rel_sorted=True == the sorting path exactly."""
        h, src, dst, rel, w_msg, w_self, bias = make_random_case(6)
        order = np.argsort(rel, kind="stable")
        src, dst, rel = src[order], dst[order], rel[order]
        args = tuple(jnp.asarray(x) for x in (h, src, dst, rel, w_msg, w_self, bias))
        fast = relational_message_passing(*args, backend="grouped", rel_sorted=True)
        slow = relational_message_passing(*args, backend="grouped")
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-6)
        expected = numpy_oracle(h, src, dst, rel, w_msg, w_self, bias)
        np.testing.assert_allclose(np.asarray(fast), expected, atol=2e-5)

    def test_encode_graph_sort_by_relation(self):
        """Host-side relation sorting preserves model outputs."""
        from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
        from graph_hypernetwork_forge_tpu.models.hypergnn import (
            HyperGNNConfig, apply_hypergnn, init_hypergnn,
        )

        rng = np.random.default_rng(0)
        n, e = 14, 30
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int64)
        texts = ["alpha rel", "beta rel", "gamma rel"]
        etexts = [texts[i] for i in rng.integers(0, 3, e)]
        feats = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

        g_plain = encode_graph(ei, etexts, n)
        g_sorted = encode_graph(ei, etexts, n, sort_by_relation=True)
        assert g_sorted.rel_sorted
        assert np.all(np.diff(g_sorted.rel_ids) >= 0)

        cfg = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16,
                             num_layers=2, backend="grouped")
        cfg_fast = dataclasses_replace(cfg, rel_sorted=True)
        params = init_hypergnn(cfg, jax.random.PRNGKey(1))
        out_plain = apply_hypergnn(
            cfg, params, feats, *(jnp.asarray(a) for a in g_plain.arrays)
        )
        out_fast = apply_hypergnn(
            cfg_fast, params, feats, *(jnp.asarray(a) for a in g_sorted.arrays)
        )
        np.testing.assert_allclose(
            np.asarray(out_fast), np.asarray(out_plain), atol=2e-5
        )

    def test_grad_matches_dense(self):
        h, src, dst, rel, w_msg, w_self, bias = make_random_case(5)
        args = tuple(jnp.asarray(x) for x in (h, src, dst, rel, w_msg, w_self, bias))

        def loss(backend):
            def f(h, w_msg, w_self, bias):
                out = relational_message_passing(
                    h, args[1], args[2], args[3], w_msg, w_self, bias,
                    backend=backend,
                )
                return jnp.sum(out**2)
            return jax.grad(f, argnums=(0, 1, 2, 3))(
                args[0], args[4], args[5], args[6]
            )

        for a, b in zip(loss("grouped"), loss("dense")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4
            )


class TestChunkedBackend:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_oracle(self, seed):
        case = make_random_case(seed, e=100)
        want = numpy_oracle(*case)
        got = relational_message_passing(
            *(jnp.asarray(x) for x in case), backend="chunked"
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)

    def test_masked_matches_dense(self):
        h, src, dst, rel, w_msg, w_self, bias = make_random_case(7, e=50)
        mask = np.zeros(50, dtype=np.float32)
        mask[:31] = 1.0
        args = [jnp.asarray(x) for x in (h, src, dst, rel, w_msg, w_self, bias)]
        want = relational_message_passing(
            *args, edge_mask=jnp.asarray(mask), backend="dense"
        )
        got = relational_message_passing(
            *args, edge_mask=jnp.asarray(mask), backend="chunked"
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_grad_flows_through_chunked(self):
        case = make_random_case(8, e=70)
        h, src, dst, rel, w_msg, w_self, bias = (jnp.asarray(x) for x in case)

        def loss(h, w_msg, w_self, bias):
            out = relational_message_passing(
                h, src, dst, rel, w_msg, w_self, bias, backend="chunked"
            )
            return jnp.sum(out**2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(h, w_msg, w_self, bias)
        ref = jax.grad(
            lambda h, a, b, c: jnp.sum(
                relational_message_passing(
                    h, src, dst, rel, a, b, c, backend="dense"
                )
                ** 2
            ),
            argnums=(0, 1, 2, 3),
        )(h, w_msg, w_self, bias)
        for g, w in zip(grads, ref):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4
            )


class TestResolveBackend:
    """Pure backend-resolution logic incl. the TPU kernel upgrades (the
    device-dependent picks are unit-tested by injecting the platform)."""

    def test_packed_pick_requires_all_conditions(self):
        from graph_hypernetwork_forge_tpu.ops.message_passing import (
            resolve_backend,
        )

        base = dict(rel_sorted=True, group_padded=True, has_sort_plan=True,
                    platform="tpu")
        # xl-shaped: auto -> grouped -> packed upgrade at d=64, >=65k rows.
        assert resolve_backend(
            "auto", 50_000, 237, 1_048_576, 64, 64, **base
        ) == "pallas_packed"
        # d=128 goes to the streaming kernel instead.
        assert resolve_backend(
            "auto", 50_000, 237, 1_048_576, 128, 128, **base
        ) == "pallas"
        # Below the measured crossover (packed_crossover_r5.json: packed
        # wins from E=16,384): ragged keeps the bench-config regime.
        assert resolve_backend(
            "auto", 1_000, 50, 16_384, 64, 64, **base
        ) == "pallas_packed"
        assert resolve_backend(
            "auto", 1_000, 50, 10_240, 64, 64, **base
        ) == "grouped"
        # Each missing precondition falls back to grouped.
        for missing in (
            dict(platform="cpu"),
            dict(rel_sorted=False),
            dict(group_padded=False),
            dict(has_sort_plan=False),
        ):
            kw = {**base, **missing}
            got = resolve_backend("auto", 50_000, 237, 1_048_576, 64, 64, **kw)
            assert got != "pallas_packed", missing

    def test_explicit_backend_is_untouched(self):
        from graph_hypernetwork_forge_tpu.ops.message_passing import (
            resolve_backend,
        )

        assert resolve_backend(
            "dense", 50_000, 237, 1_048_576, 64, 64, rel_sorted=True,
            group_padded=True, has_sort_plan=True, platform="tpu",
        ) == "dense"
