"""Training machinery tests: single step vs scan-fused multi-step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
from graph_hypernetwork_forge_tpu.models.hypergnn import (
    HyperGNNConfig,
    init_hypergnn,
)
from graph_hypernetwork_forge_tpu.training import make_multi_step, make_train_step


def setup():
    rng = np.random.default_rng(0)
    n, e, u = 16, 48, 4
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    ei = np.stack(
        [rng.integers(0, n, size=e), rng.integers(0, n, size=e)]
    ).astype(np.int64)
    texts = [f"rel {i}" for i in range(u)]
    etexts = [texts[i] for i in rng.integers(0, u, size=e)]
    graph = encode_graph(ei, etexts, n)
    return feats, graph


class TestMultiStep:
    def test_matches_sequential_single_steps(self):
        """K scan-fused steps must equal K individually dispatched steps
        given the same per-step rngs."""
        feats, graph = setup()
        config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16)
        optimizer = optax.adam(1e-3)
        arrays = tuple(jnp.asarray(a) for a in graph.arrays)
        feats_j = jnp.asarray(feats)
        k = 4
        root = jax.random.PRNGKey(3)
        step_rngs = jax.random.split(root, k)

        # Sequential single steps (no donation side effects: fresh copies).
        params = jax.tree_util.tree_map(
            jnp.array, init_hypergnn(config, jax.random.PRNGKey(0))
        )
        opt_state = optimizer.init(params)
        step = make_train_step(config, optimizer)
        losses_seq = []
        for i in range(k):
            params, opt_state, loss = step(
                params, opt_state, feats_j, *arrays, step_rngs[i]
            )
            losses_seq.append(float(loss))
        params_seq = params

        # Scan-fused.
        params = jax.tree_util.tree_map(
            jnp.array, init_hypergnn(config, jax.random.PRNGKey(0))
        )
        opt_state = optimizer.init(params)
        multi = make_multi_step(config, optimizer, k)
        params_scan, _, losses_scan = multi(
            params, opt_state, feats_j, *arrays, root
        )

        np.testing.assert_allclose(
            np.asarray(losses_scan), losses_seq, atol=1e-6, rtol=1e-6
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(params_seq),
            jax.tree_util.tree_leaves(params_scan),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
            )


class TestMultiNegative:
    def test_k1_equals_single_negative_loss(self):
        from graph_hypernetwork_forge_tpu.training import (
            link_prediction_loss,
            multi_negative_loss,
        )

        rng = np.random.default_rng(1)
        n, b, d = 12, 20, 8
        embs = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        src = jnp.asarray(rng.integers(0, n, b))
        dst = jnp.asarray(rng.integers(0, n, b))
        neg = jnp.asarray(rng.integers(0, n, b))
        want = link_prediction_loss(embs, src, dst, neg)
        got = multi_negative_loss(embs, src, dst, neg[:, None])
        np.testing.assert_allclose(float(got), float(want), atol=1e-6)

    def test_train_step_k8_decreases_loss(self):
        feats, graph = setup()
        config = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=16, num_layers=2
        )
        params = init_hypergnn(config, jax.random.PRNGKey(0))
        optimizer = optax.adam(1e-2)
        opt_state = optimizer.init(params)
        step = make_train_step(config, optimizer, num_negatives=8)
        feats_j = jnp.asarray(feats)
        arrays = tuple(jnp.asarray(a) for a in graph.arrays)
        rng = jax.random.PRNGKey(7)
        losses = []
        for _ in range(15):
            rng, sr = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, feats_j, *arrays, sr)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] <= losses[0]

    def test_invalid_num_negatives(self):
        import pytest

        config = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=16, num_layers=1
        )
        optimizer = optax.adam(1e-3)
        with pytest.raises(ValueError):
            make_train_step(config, optimizer, num_negatives=0)
        with pytest.raises(ValueError):
            make_train_step(
                config, optimizer, num_negatives=4, neg_mode="roll"
            )
        with pytest.raises(ValueError):
            make_train_step(
                config, optimizer, num_negatives=1,
                adversarial_temperature=1.0,
            )

    def test_adversarial_weighting(self):
        """T=0 is the uniform mean; T→∞ approaches the max-hinge negative;
        weights follow stop_grad(neg_score) softmax exactly."""
        from graph_hypernetwork_forge_tpu.training import multi_negative_loss

        rng = np.random.default_rng(5)
        n, b, k, d = 14, 9, 6, 8
        embs = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        src = jnp.asarray(rng.integers(0, n, b))
        dst = jnp.asarray(rng.integers(0, n, b))
        neg = jnp.asarray(rng.integers(0, n, (b, k)))

        uniform = multi_negative_loss(embs, src, dst, neg)
        t0 = multi_negative_loss(embs, src, dst, neg,
                                 adversarial_temperature=0.0)
        np.testing.assert_allclose(float(t0), float(uniform), atol=1e-7)

        # Manual softmax-weighted oracle at T = 2.
        e_np = np.asarray(embs)
        pos = (e_np[np.asarray(src)] * e_np[np.asarray(dst)]).sum(-1)
        negs = (e_np[np.asarray(src)][:, None, :]
                * e_np[np.asarray(neg)]).sum(-1)
        hinge = np.maximum(1.0 - pos[:, None] + negs, 0.0)
        z = np.exp(2.0 * (negs - negs.max(axis=1, keepdims=True)))
        w = z / z.sum(axis=1, keepdims=True)
        want = (w * hinge).sum(axis=1).mean()
        got = multi_negative_loss(embs, src, dst, neg,
                                  adversarial_temperature=2.0)
        np.testing.assert_allclose(float(got), want, rtol=1e-5)

        # Large T → hardest (highest-scoring) negative dominates.
        hard = multi_negative_loss(embs, src, dst, neg,
                                   adversarial_temperature=200.0)
        want_hard = hinge[np.arange(b), negs.argmax(axis=1)].mean()
        np.testing.assert_allclose(float(hard), want_hard, rtol=1e-4)


def test_zero_shot_mrr_regression_floor():
    """Quality floor: a 200-step multi-negative run on the tiny synthetic
    KG must reach filtered MRR >= 0.06 (measured 0.105-0.117 across init
    seeds at this fixed data seed; the floor is ~55% of the min, so only a
    real training/objective/eval regression trips it). Guards the
    zero-shot pipeline end to end: text -> generated weights -> message
    passing -> ranking (reference objective demo.py:79-98)."""
    import optax

    from graph_hypernetwork_forge_tpu.data.datasets import (
        generate_synthetic_kg,
    )
    from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
    from graph_hypernetwork_forge_tpu.models.hypergnn import (
        HyperGNNConfig,
        apply_hypergnn,
        init_hypergnn,
    )
    from graph_hypernetwork_forge_tpu.training.evaluate import (
        evaluate_link_prediction,
    )
    from graph_hypernetwork_forge_tpu.training.train import make_train_step

    kg = generate_synthetic_kg(200, 1000, 12, seed=0, zero_shot_fraction=0.2)
    train_ei, train_texts = kg.split_edges("train")
    test_ei, _ = kg.split_edges("test")
    graph = encode_graph(
        train_ei, train_texts, kg.num_nodes, sort_by_relation=True
    )
    config = HyperGNNConfig(
        text_dim=32, node_feat_dim=64, hidden_dim=32, num_layers=2,
        rel_sorted=True,
    )
    params = init_hypergnn(config, jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = make_train_step(config, opt, num_negatives=8)
    feats = jnp.asarray(kg.node_features)
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)
    rng = jax.random.PRNGKey(1)
    for _ in range(200):
        rng, sr = jax.random.split(rng)
        params, opt_state, _ = step(params, opt_state, feats, *arrays, sr)
    full = encode_graph(
        kg.edge_index, kg.edge_texts, kg.num_nodes, sort_by_relation=True
    )
    embs = apply_hypergnn(
        config, params, feats, *(jnp.asarray(a) for a in full.arrays)
    )
    m = evaluate_link_prediction(
        embs, test_ei[0], test_ei[1], filter_edges=kg.edge_index
    )
    assert m["mrr"] >= 0.06, m


class TestFusedSortedLoss:
    """link_prediction_loss_sorted's analytic VJP vs plain autodiff."""

    def _case(self, seed=0, n=60, e=500, d=16):
        from graph_hypernetwork_forge_tpu.data.encoding import encode_graph

        rng = np.random.default_rng(seed)
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        texts = [f"rel {i}" for i in range(7)]
        etexts = [texts[i] for i in rng.integers(0, 7, e)]
        graph = encode_graph(
            ei, etexts, n, sort_by_relation=True, with_sort_plan=True
        )
        plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
        embs = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        return graph, plan, embs

    @pytest.mark.parametrize("with_mask", [True, False])
    def test_value_and_grad_match_plain_autodiff(self, with_mask):
        from graph_hypernetwork_forge_tpu.training.objectives import (
            link_prediction_loss_sorted,
        )

        graph, plan, embs = self._case()
        src = jnp.asarray(graph.src)
        dst = jnp.asarray(graph.dst)
        mask = jnp.asarray(graph.edge_mask) if with_mask else None
        shift = jnp.int32(137)

        def fused(x):
            return link_prediction_loss_sorted(
                x, src, dst, plan, shift, margin=1.0, edge_mask=mask
            )

        def plain(x):
            pos_h = x[src]
            pos_t = x[dst]
            neg_t = jnp.roll(pos_t, -shift, axis=0)
            pos = jnp.sum(pos_h * pos_t, axis=-1)
            neg = jnp.sum(pos_h * neg_t, axis=-1)
            per_edge = jnp.maximum(1.0 - pos + neg, 0.0)
            m = jnp.ones_like(per_edge) if mask is None else mask
            return jnp.sum(per_edge * m) / jnp.maximum(jnp.sum(m), 1.0)

        np.testing.assert_allclose(
            float(fused(embs)), float(plain(embs)), rtol=1e-6
        )
        g1 = jax.grad(fused)(embs)
        g2 = jax.grad(plain)(embs)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
        )

    def test_grad_under_jit_and_zero_shift_wraparound(self):
        from graph_hypernetwork_forge_tpu.training.objectives import (
            link_prediction_loss_sorted,
        )

        graph, plan, embs = self._case(seed=3)
        src = jnp.asarray(graph.src)
        dst = jnp.asarray(graph.dst)
        mask = jnp.asarray(graph.edge_mask)
        e = int(src.shape[0])

        @jax.jit
        def gradf(x, shift):
            return jax.grad(
                lambda y: link_prediction_loss_sorted(
                    y, src, dst, plan, shift, edge_mask=mask
                )
            )(x)

        for shift in (0, 1, e - 1, e + 5):
            g1 = gradf(embs, jnp.int32(shift))

            def plain(x):
                pos_h = x[src]
                pos_t = x[dst]
                neg_t = jnp.roll(pos_t, -shift, axis=0)
                pos = jnp.sum(pos_h * pos_t, axis=-1)
                neg = jnp.sum(pos_h * neg_t, axis=-1)
                per_edge = jnp.maximum(1.0 - pos + neg, 0.0)
                return jnp.sum(per_edge * mask) / jnp.maximum(
                    jnp.sum(mask), 1.0
                )

            g2 = jax.grad(plain)(embs)
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5,
                err_msg=f"shift={shift}",
            )
