"""HyperGNN behavioral contract (mirrors reference tests/test_hypergnn.py:
construction, forward, zero-shot, training, score_triple)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graph_hypernetwork_forge_tpu import HyperGNN
from graph_hypernetwork_forge_tpu.models.hypergnn import apply_hypergnn
from graph_hypernetwork_forge_tpu.training import train


def simple_kg():
    """5-node KG with 2 relation types."""
    edge_index = np.asarray([[0, 1, 2, 3], [1, 2, 3, 4]], dtype=np.int64)
    edge_texts = ["knows", "knows", "works with", "knows"]
    node_features = np.random.default_rng(7).standard_normal((5, 8)).astype(
        np.float32
    )
    return node_features, edge_index, edge_texts


class TestHyperGNNConstruction:
    def test_basic_construction(self):
        model = HyperGNN(text_dim=32, node_feat_dim=8, hidden_dim=16, num_layers=1)
        assert model.num_layers == 1
        assert len(model.weight_generators) == 1
        assert len(model.layer_norms) == 1

    def test_two_layer_construction(self, small_model):
        assert small_model.num_layers == 2
        assert len(small_model.weight_generators) == 2

    def test_invalid_num_layers(self):
        with pytest.raises(ValueError):
            HyperGNN(text_dim=32, node_feat_dim=8, hidden_dim=16, num_layers=0)

    def test_num_parameters_positive(self, small_model):
        assert small_model.num_parameters() > 0

    def test_num_parameters_matches_reference_formula(self):
        """Demo config must reproduce the reference's exact parameter count
        (692,518; BASELINE.md, printed by reference demo.py:57)."""
        model = HyperGNN(text_dim=64, node_feat_dim=16, hidden_dim=32, num_layers=2)
        assert model.num_parameters() == 692_518


class TestHyperGNNForward:
    def test_output_shape_toy_kg(self, small_model, toy_kg):
        out = small_model(toy_kg.node_features, toy_kg.edge_index, toy_kg.edge_texts)
        assert out.shape == (toy_kg.num_nodes, small_model.hidden_dim)

    def test_no_nan_untrained(self, small_model, toy_kg):
        out = small_model(toy_kg.node_features, toy_kg.edge_index, toy_kg.edge_texts)
        assert not bool(jnp.isnan(out).any()), "NaN in output"
        assert not bool(jnp.isinf(out).any()), "Inf in output"

    def test_simple_kg_output_shape(self):
        model = HyperGNN(text_dim=32, node_feat_dim=8, hidden_dim=16, num_layers=2)
        feats, ei, texts = simple_kg()
        out = model(feats, ei, texts)
        assert out.shape == (5, 16)

    def test_single_node_single_edge(self):
        model = HyperGNN(text_dim=32, node_feat_dim=8, hidden_dim=16, num_layers=1)
        feats = np.random.default_rng(0).standard_normal((2, 8)).astype(np.float32)
        edge_index = np.asarray([[0], [1]], dtype=np.int64)
        out = model(feats, edge_index, ["knows"])
        assert out.shape == (2, 16)

    def test_single_layer_model(self):
        model = HyperGNN(text_dim=32, node_feat_dim=8, hidden_dim=16, num_layers=1)
        feats, ei, texts = simple_kg()
        out = model(feats, ei, texts)
        assert out.shape == (5, 16)

    def test_edge_text_count_mismatch_raises(self, small_model, toy_kg):
        with pytest.raises(ValueError):
            small_model(
                toy_kg.node_features, toy_kg.edge_index, toy_kg.edge_texts[:-1]
            )

    def test_isolated_nodes_finite(self, small_model):
        """Nodes with no incoming edges must stay finite (zero pre-residual)."""
        feats = np.random.default_rng(1).standard_normal((6, 16)).astype(np.float32)
        edge_index = np.asarray([[0], [1]], dtype=np.int64)  # nodes 2..5 isolated
        out = small_model(feats, edge_index, ["knows"])
        assert out.shape == (6, small_model.hidden_dim)
        assert not bool(jnp.isnan(out).any())

    def test_backend_equivalence(self, toy_kg):
        """dense and gather message-passing backends agree bitwise-closely."""
        key = jax.random.PRNGKey(3)
        dense = HyperGNN(
            text_dim=32, node_feat_dim=16, hidden_dim=16, backend="dense", key=key
        )
        gather = HyperGNN(
            text_dim=32, node_feat_dim=16, hidden_dim=16, backend="gather", key=key
        )
        out_d = dense(toy_kg.node_features, toy_kg.edge_index, toy_kg.edge_texts)
        out_g = gather(toy_kg.node_features, toy_kg.edge_index, toy_kg.edge_texts)
        np.testing.assert_allclose(
            np.asarray(out_d), np.asarray(out_g), atol=1e-5, rtol=1e-5
        )


class TestZeroShot:
    def test_unseen_relation_no_crash(self, small_model, toy_kg):
        new_rel = "is grandmother of"
        assert new_rel not in toy_kg.relation_types
        new_edge_index = np.concatenate(
            [toy_kg.edge_index, np.asarray([[0], [4]], dtype=np.int64)], axis=1
        )
        new_texts = toy_kg.edge_texts + [new_rel]
        out = small_model(toy_kg.node_features, new_edge_index, new_texts)
        assert out.shape == (toy_kg.num_nodes, small_model.hidden_dim)
        assert not bool(jnp.isnan(out).any())

    def test_all_unseen_relations(self, small_model):
        feats = np.random.default_rng(2).standard_normal((4, 16)).astype(np.float32)
        edge_index = np.asarray([[0, 1, 2], [1, 2, 3]], dtype=np.int64)
        edge_texts = ["brand new rel A", "brand new rel B", "brand new rel A"]
        out = small_model(feats, edge_index, edge_texts)
        assert out.shape == (4, small_model.hidden_dim)
        assert not bool(jnp.isnan(out).any())

    def test_single_char_relation(self, small_model):
        feats = np.random.default_rng(3).standard_normal((3, 16)).astype(np.float32)
        edge_index = np.asarray([[0, 1], [1, 2]], dtype=np.int64)
        out = small_model(feats, edge_index, ["a", "b"])
        assert out.shape == (3, small_model.hidden_dim)

    def test_no_per_relation_parameters(self, small_model, toy_kg):
        """The zero-shot invariant: parameter count must not depend on the
        number of relation types seen (relation identity enters only through
        text; reference models/weight_generator.py:19-21)."""
        n_before = small_model.num_parameters()
        _ = small_model(toy_kg.node_features, toy_kg.edge_index, toy_kg.edge_texts)
        assert small_model.num_parameters() == n_before


class TestTraining:
    def test_backward_no_error(self, small_model, toy_kg):
        graph = small_model.preprocess(
            toy_kg.edge_index, toy_kg.edge_texts, toy_kg.num_nodes
        )
        arrays = tuple(jnp.asarray(a) for a in graph.arrays)
        feats = jnp.asarray(toy_kg.node_features, dtype=jnp.float32)

        def loss(params):
            out = apply_hypergnn(small_model.config, params, feats, *arrays)
            return jnp.sum(out)

        grads = jax.grad(loss)(small_model.params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)

    def test_parameters_update(self, small_model, toy_kg):
        graph = small_model.preprocess(
            toy_kg.edge_index, toy_kg.edge_texts, toy_kg.num_nodes
        )
        arrays = tuple(jnp.asarray(a) for a in graph.arrays)
        feats = jnp.asarray(toy_kg.node_features, dtype=jnp.float32)
        opt = optax.sgd(0.1)
        opt_state = opt.init(small_model.params)

        def loss(params):
            return jnp.sum(apply_hypergnn(small_model.config, params, feats, *arrays))

        grads = jax.grad(loss)(small_model.params)
        updates, _ = opt.update(grads, opt_state, small_model.params)
        new_params = optax.apply_updates(small_model.params, updates)

        before = jax.tree_util.tree_leaves(small_model.params)
        after = jax.tree_util.tree_leaves(new_params)
        changed = sum(
            0 if np.allclose(np.asarray(b), np.asarray(a)) else 1
            for b, a in zip(before, after)
        )
        assert changed > 0, "No parameters changed after an optimizer step"

    def test_loss_decreases(self, toy_kg):
        model = HyperGNN(text_dim=32, node_feat_dim=16, hidden_dim=16, num_layers=2)
        graph = model.preprocess(
            toy_kg.edge_index, toy_kg.edge_texts, toy_kg.num_nodes
        )
        _, losses = train(
            model.config,
            model.params,
            toy_kg.node_features,
            graph,
            num_steps=15,
            learning_rate=1e-2,
        )
        assert losses[-1] <= losses[0] * 2, "Loss does not appear to decrease"


class TestScoreTriple:
    def test_score_scalar(self, small_model):
        a = np.random.default_rng(0).standard_normal(16).astype(np.float32)
        b = np.random.default_rng(1).standard_normal(16).astype(np.float32)
        s = small_model.score_triple(a, b)
        assert s.shape == ()

    def test_score_batched(self, small_model):
        a = np.random.default_rng(0).standard_normal((4, 16)).astype(np.float32)
        b = np.random.default_rng(1).standard_normal((4, 16)).astype(np.float32)
        s = small_model.score_triple(a, b)
        assert s.shape == (4,)

    def test_identical_embeddings_positive(self, small_model):
        a = np.random.default_rng(0).standard_normal(16).astype(np.float32)
        s = small_model.score_triple(a, a)
        assert float(s) > 0
