"""Sort-free aggregation path (SortPlan): exactness vs the gather oracle.

The SortPlan machinery (host-precomputed dst/src permutations + custom-VJP
permute/gather ops, ``ops/segment.py``) must be numerically identical to the
plain backends in BOTH the forward pass and every gradient — it only changes
how XLA lowers the reductions (sorted-hint segment-sums instead of full key
sorts). Reference semantics under test: mean aggregation + averaged-W_self
self-loop of ``/root/reference/graph_hypernetwork_forge/models/hypergnn.py:160-230``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hypernetwork_forge_tpu.data.encoding import (
    build_sort_plan,
    encode_graph,
    validate_graph_for_config,
)
from graph_hypernetwork_forge_tpu.models.hypergnn import HyperGNNConfig
from graph_hypernetwork_forge_tpu.ops.message_passing import (
    relational_message_passing,
)
from graph_hypernetwork_forge_tpu.ops.segment import (
    permute_rows,
    sorted_segment_sum_by_plan,
    take_rows_sorted,
)


def _random_graph(seed=0, n=37, e=211, u=9, d=8):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    rel = np.sort(rng.integers(0, u, size=e)).astype(np.int32)  # rel-sorted
    mask = (rng.random(e) > 0.1).astype(np.float32)
    h = rng.standard_normal((n, d)).astype(np.float32)
    w_msg = rng.standard_normal((u, d, d)).astype(np.float32) * 0.1
    w_self = rng.standard_normal((u, d, d)).astype(np.float32) * 0.1
    bias = rng.standard_normal((u, d)).astype(np.float32) * 0.1
    plan = build_sort_plan(src, dst, rel, mask, n, u)
    return h, src, dst, rel, mask, w_msg, w_self, bias, plan


class TestPrimitives:
    def test_permute_rows_fwd_and_vjp(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((17, 5)).astype(np.float32))
        perm = np.argsort(rng.random(17)).astype(np.int32)
        inv = np.empty(17, dtype=np.int32)
        inv[perm] = np.arange(17)
        out = permute_rows(x, jnp.asarray(perm), jnp.asarray(inv))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])
        # VJP equals the VJP of plain x[perm].
        g = jnp.asarray(rng.standard_normal((17, 5)).astype(np.float32))
        _, vjp = jax.vjp(lambda a: permute_rows(a, jnp.asarray(perm), jnp.asarray(inv)), x)
        _, vjp_ref = jax.vjp(lambda a: a[perm], x)
        np.testing.assert_allclose(
            np.asarray(vjp(g)[0]), np.asarray(vjp_ref(g)[0]), rtol=0, atol=0
        )

    def test_take_rows_sorted_matches_plain_gather(self):
        rng = np.random.default_rng(2)
        table = jnp.asarray(rng.standard_normal((11, 4)).astype(np.float32))
        idx = rng.integers(0, 11, size=40).astype(np.int32)
        perm = np.argsort(idx, kind="stable").astype(np.int32)
        idx_sorted = idx[perm]
        out = take_rows_sorted(
            11, table, jnp.asarray(idx), jnp.asarray(perm), jnp.asarray(idx_sorted)
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[idx])
        g = jnp.asarray(rng.standard_normal((40, 4)).astype(np.float32))
        _, vjp = jax.vjp(
            lambda t: take_rows_sorted(
                11, t, jnp.asarray(idx), jnp.asarray(perm), jnp.asarray(idx_sorted)
            ),
            table,
        )
        _, vjp_ref = jax.vjp(lambda t: t[idx], table)
        np.testing.assert_allclose(
            np.asarray(vjp(g)[0]), np.asarray(vjp_ref(g)[0]), rtol=1e-6, atol=1e-6
        )

    def test_sorted_segment_sum_by_plan(self):
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 9, size=50).astype(np.int32)
        vals = jnp.asarray(rng.standard_normal((50, 3)).astype(np.float32))
        perm = np.argsort(ids, kind="stable").astype(np.int32)
        inv = np.empty(50, dtype=np.int32)
        inv[perm] = np.arange(50)
        out = sorted_segment_sum_by_plan(
            vals, jnp.asarray(perm), jnp.asarray(inv), jnp.asarray(ids[perm]), 9
        )
        ref = jax.ops.segment_sum(vals, jnp.asarray(ids), num_segments=9)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestMessagePassingWithPlan:
    @pytest.mark.parametrize("backend", ["grouped", "dense"])
    def test_forward_matches_oracle(self, backend):
        h, src, dst, rel, mask, w_msg, w_self, bias, plan = _random_graph()
        args = (jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst),
                jnp.asarray(rel), jnp.asarray(w_msg), jnp.asarray(w_self),
                jnp.asarray(bias))
        kw = dict(edge_mask=jnp.asarray(mask), num_nodes=h.shape[0])
        out_plan = relational_message_passing(
            *args, backend=backend, rel_sorted=(backend == "grouped"),
            sort_plan=plan, **kw,
        )
        out_ref = relational_message_passing(*args, backend="gather", **kw)
        np.testing.assert_allclose(
            np.asarray(out_plan), np.asarray(out_ref), atol=3e-5
        )

    def test_gradients_match_oracle(self):
        h, src, dst, rel, mask, w_msg, w_self, bias, plan = _random_graph(seed=7)

        def loss(h_, wm, ws, b, *, backend, sp, rs):
            out = relational_message_passing(
                jnp.asarray(h_), jnp.asarray(src), jnp.asarray(dst),
                jnp.asarray(rel), wm, ws, b,
                num_nodes=h.shape[0], edge_mask=jnp.asarray(mask),
                backend=backend, rel_sorted=rs, sort_plan=sp,
            )
            return jnp.sum(jnp.sin(out))

        grads_plan = jax.grad(
            lambda *a: loss(*a, backend="grouped", sp=plan, rs=True),
            argnums=(0, 1, 2, 3),
        )(jnp.asarray(h), jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias))
        grads_ref = jax.grad(
            lambda *a: loss(*a, backend="gather", sp=None, rs=False),
            argnums=(0, 1, 2, 3),
        )(jnp.asarray(h), jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias))
        for gp, gr in zip(grads_plan, grads_ref):
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=3e-5)

    def test_isolated_nodes_zero_with_plan(self):
        # Nodes with no in-edges must output exactly zero pre-residual
        # (reference quirk, models/hypergnn.py:207-226).
        h, src, dst, rel, mask, w_msg, w_self, bias, _ = _random_graph(n=12, e=20, u=3)
        dst = np.where(dst >= 6, dst % 6, dst).astype(np.int32)  # nodes 6..11 isolated
        plan = build_sort_plan(src, dst, rel, mask, 12, 3)
        out = relational_message_passing(
            jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
            jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
            num_nodes=12, edge_mask=jnp.asarray(mask),
            backend="grouped", rel_sorted=True, sort_plan=plan,
        )
        np.testing.assert_array_equal(np.asarray(out)[6:], 0.0)


class TestEncodeGraphPlan:
    def test_encode_graph_builds_consistent_plan(self):
        rng = np.random.default_rng(5)
        n, e, u = 20, 90, 5
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        texts = [f"rel {i}" for i in range(u)]
        etexts = [texts[i] for i in rng.integers(0, u, e)]
        g = encode_graph(ei, etexts, n, sort_by_relation=True, with_sort_plan=True)
        p = g.sort_plan
        assert p is not None
        # Permutations are bijective and produce sorted ids.
        np.testing.assert_array_equal(np.sort(p.dst_perm), np.arange(len(g.dst)))
        assert np.all(np.diff(p.dst_sorted) >= 0)
        assert np.all(np.diff(p.src_sorted) >= 0)
        np.testing.assert_array_equal(p.dst_perm[p.inv_dst_perm], np.arange(len(g.dst)))
        # in_degree counts only real (masked) edges.
        deg = np.zeros(n, dtype=np.float32)
        np.add.at(deg, g.dst, g.edge_mask)
        np.testing.assert_array_equal(p.in_degree, deg)
        # rel_counts sums to E_pad and matches bincount of stored rel_ids.
        np.testing.assert_array_equal(
            p.rel_counts, np.bincount(g.rel_ids, minlength=len(p.rel_counts))
        )

    def test_validate_guard(self):
        rng = np.random.default_rng(6)
        ei = np.stack([rng.integers(0, 5, 10), rng.integers(0, 5, 10)])
        etexts = [f"r{i % 3}" for i in range(10)]
        g_unsorted = encode_graph(ei, etexts, 5)
        cfg = HyperGNNConfig(
            text_dim=8, node_feat_dim=4, hidden_dim=8, rel_sorted=True
        )
        with pytest.raises(ValueError, match="relation-sorted"):
            validate_graph_for_config(g_unsorted, cfg)
        g_sorted = encode_graph(ei, etexts, 5, sort_by_relation=True)
        validate_graph_for_config(g_sorted, cfg)  # no raise

    def test_full_model_with_plan_matches_without(self):
        from graph_hypernetwork_forge_tpu.models.hypergnn import (
            apply_hypergnn,
            init_hypergnn,
        )

        rng = np.random.default_rng(8)
        n, e, u = 16, 60, 4
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        texts = [f"relation {i}" for i in range(u)]
        etexts = [texts[i] for i in rng.integers(0, u, e)]
        g = encode_graph(ei, etexts, n, sort_by_relation=True, with_sort_plan=True)
        feats = jnp.asarray(rng.standard_normal((n, 6)).astype(np.float32))
        cfg = HyperGNNConfig(
            text_dim=16, node_feat_dim=6, hidden_dim=16, num_layers=2,
            backend="grouped", rel_sorted=True,
        )
        params = init_hypergnn(cfg, jax.random.PRNGKey(0))
        arrays = tuple(jnp.asarray(a) for a in g.arrays)
        out_plan = apply_hypergnn(cfg, params, feats, *arrays, sort_plan=g.sort_plan)
        out_ref = apply_hypergnn(cfg, params, feats, *arrays)
        np.testing.assert_allclose(
            np.asarray(out_plan), np.asarray(out_ref), atol=3e-5
        )


class TestSortFreeTraining:
    def _setup(self):
        rng = np.random.default_rng(11)
        n, e, u, d = 24, 120, 5, 16
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        texts = [f"relation number {i}" for i in range(u)]
        etexts = [texts[i] for i in rng.integers(0, u, e)]
        g = encode_graph(ei, etexts, n, sort_by_relation=True, with_sort_plan=True)
        feats = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        cfg = HyperGNNConfig(
            text_dim=16, node_feat_dim=d, hidden_dim=d, num_layers=2,
            backend="grouped", rel_sorted=True,
        )
        return g, feats, cfg

    def test_roll_mode_loss_decreases(self):
        import optax
        from graph_hypernetwork_forge_tpu.models.hypergnn import init_hypergnn
        from graph_hypernetwork_forge_tpu.training.train import make_train_step

        g, feats, cfg = self._setup()
        params = init_hypergnn(cfg, jax.random.PRNGKey(0))
        opt = optax.adam(1e-2)
        step = make_train_step(cfg, opt, neg_mode="roll")
        opt_state = opt.init(params)
        arrays = tuple(jnp.asarray(a) for a in g.arrays)
        rng = jax.random.PRNGKey(2)
        losses = []
        for _ in range(15):
            rng, sr = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, feats, *arrays, sr, sort_plan=g.sort_plan
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] <= losses[0]

    def test_multi_step_matches_single_step_roll(self):
        import optax
        from graph_hypernetwork_forge_tpu.models.hypergnn import init_hypergnn
        from graph_hypernetwork_forge_tpu.training.train import (
            make_multi_step,
            make_train_step,
        )

        g, feats, cfg = self._setup()
        params = init_hypergnn(cfg, jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        arrays = tuple(jnp.asarray(a) for a in g.arrays)
        rng = jax.random.PRNGKey(3)
        k = 4

        multi = make_multi_step(cfg, opt, k, neg_mode="roll")
        p_m, _, losses_m = multi(
            params, opt.init(params), feats, *arrays, rng, sort_plan=g.sort_plan
        )

        single = make_train_step(cfg, opt, neg_mode="roll")
        p_s, s_state = params, opt.init(params)
        losses_s = []
        for sr in jax.random.split(rng, k):
            p_s, s_state, loss = single(
                p_s, s_state, feats, *arrays, sr, sort_plan=g.sort_plan
            )
            losses_s.append(float(loss))
        np.testing.assert_allclose(np.asarray(losses_m), losses_s, atol=1e-5)

    def test_roll_requires_plan(self):
        import optax
        from graph_hypernetwork_forge_tpu.training.train import make_train_step

        g, feats, cfg = self._setup()
        with pytest.raises(ValueError):
            make_train_step(cfg, optax.adam(1e-3), neg_mode="roll",
                            num_pos_samples=8)


class TestSortFreeHLO:
    """Structural lock on the flagship optimization: the SortPlan train
    step must compile to an HLO module with ZERO sort ops (XLA lowers every
    unsorted scatter/argsort to a full key sort on TPU — the 4x runtime /
    25x compile win documented in README). The unsorted grouped path is the
    control: it MUST contain a sort, proving the assertion has teeth.

    Reference semantics being de-sorted: mean aggregation + averaged W_self
    of /root/reference/graph_hypernetwork_forge/models/hypergnn.py:207-220.
    """

    def _lowered_text(self, cfg, g, feats, neg_mode, sort_plan):
        import optax
        from graph_hypernetwork_forge_tpu.models.hypergnn import init_hypergnn
        from graph_hypernetwork_forge_tpu.training.train import make_train_step

        params = init_hypergnn(cfg, jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        step = make_train_step(cfg, opt, neg_mode=neg_mode)
        opt_state = opt.init(params)
        arrays = tuple(jnp.asarray(a) for a in g.arrays)
        lowered = step.lower(
            params, opt_state, feats, *arrays, jax.random.PRNGKey(1),
            sort_plan=sort_plan,
        )
        return lowered.compile().as_text()

    def test_sort_plan_step_compiles_sort_free(self):
        rng = np.random.default_rng(11)
        n, e, u, d = 24, 120, 5, 16
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        texts = [f"relation number {i}" for i in range(u)]
        etexts = [texts[i] for i in rng.integers(0, u, e)]
        g = encode_graph(ei, etexts, n, sort_by_relation=True,
                         with_sort_plan=True)
        feats = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        cfg = HyperGNNConfig(
            text_dim=16, node_feat_dim=d, hidden_dim=d, num_layers=2,
            backend="grouped", rel_sorted=True,
        )
        hlo = self._lowered_text(cfg, g, feats, "roll", g.sort_plan)
        assert "sort(" not in hlo, (
            "SortPlan train step regressed: compiled HLO contains a sort"
        )

        # Control: the same graph through the unsorted grouped path (in-jit
        # argsort per layer) must contain a sort — otherwise the assertion
        # above is vacuous.
        cfg_unsorted = HyperGNNConfig(
            text_dim=16, node_feat_dim=d, hidden_dim=d, num_layers=2,
            backend="grouped", rel_sorted=False,
        )
        hlo_ctrl = self._lowered_text(cfg_unsorted, g, feats, "uniform", None)
        assert "sort(" in hlo_ctrl, "control lost its sort; test is vacuous"
