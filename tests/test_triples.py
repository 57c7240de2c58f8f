"""Real-dataset ingestion: triples files → SyntheticKG → full pipeline.

The committed ``tests/fixtures/tiny_kg`` miniature exercises the exact
format FB15k-237/WN18RR ship (``head\\trel\\ttail`` + relation-text map);
the loader must round-trip through encoding, training, and the filtered
evaluator — the wiring that makes every committed quality number
reproducible on the real benchmarks the moment their files are present.
Data contract being generalized:
/root/reference/graph_hypernetwork_forge/data/knowledge_graph.py:41-86.
"""

import os

import jax
import numpy as np
import pytest

from graph_hypernetwork_forge_tpu.data.triples import (
    load_triples_dataset,
    read_triples,
    save_triples_dataset,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_kg")


class TestLoader:
    def test_loads_fixture(self):
        kg = load_triples_dataset(FIXTURE, feat_dim=8, seed=0)
        # 6 people + 2 orgs + 2 cities + 2 skills + 2 countries
        assert kg.num_nodes == 14
        assert kg.num_edges == 22 + 2 + 5
        assert len(kg.splits["train"]) == 22
        assert len(kg.splits["valid"]) == 2
        assert len(kg.splits["test"]) == 5
        assert kg.node_features.shape == (kg.num_nodes, 8)
        # Relation texts come from the map, not the tokens.
        assert "works at the organization" in kg.relation_texts

    def test_zero_shot_relations_derived(self):
        kg = load_triples_dataset(FIXTURE)
        # 'is_colleague_of' appears only in test → zero-shot by derivation.
        zs_texts = {kg.relation_texts[r] for r in kg.zero_shot_relations}
        assert zs_texts == {"is a colleague of"}

    def test_deterministic(self):
        a = load_triples_dataset(FIXTURE, seed=3)
        b = load_triples_dataset(FIXTURE, seed=3)
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        np.testing.assert_array_equal(a.node_features, b.node_features)
        assert a.edge_texts == b.edge_texts

    def test_missing_dir_and_bad_lines(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_triples_dataset(str(tmp_path))
        bad = tmp_path / "train.txt"
        bad.write_text("only_two\tfields\n")
        with pytest.raises(ValueError):
            read_triples(str(bad))

    def test_round_trip_save_load(self, tmp_path):
        kg = load_triples_dataset(FIXTURE, feat_dim=4, seed=1)
        out = str(tmp_path / "export")
        save_triples_dataset(out, kg)
        kg2 = load_triples_dataset(out, feat_dim=4, seed=1)
        np.testing.assert_array_equal(kg.edge_index, kg2.edge_index)
        assert kg.edge_texts == kg2.edge_texts
        assert [
            kg.relation_texts[r] for r in kg.zero_shot_relations
        ] == [kg2.relation_texts[r] for r in kg2.zero_shot_relations]
        for name in ("train", "valid", "test"):
            np.testing.assert_array_equal(kg.splits[name], kg2.splits[name])


class TestPipeline:
    def test_train_and_filtered_eval_round_trip(self):
        """Fixture → encode → short training → filtered MRR, end to end."""
        import jax.numpy as jnp
        import optax

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

        kg = load_triples_dataset(FIXTURE, feat_dim=8, seed=0)
        train_ei, train_texts = kg.split_edges("train")
        graph = encode_graph(train_ei, train_texts, kg.num_nodes)
        config = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=16, num_layers=2
        )
        params = init_hypergnn(config, jax.random.PRNGKey(0))
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        step = make_train_step(config, opt)
        feats = jnp.asarray(kg.node_features)
        arrays = tuple(jnp.asarray(a) for a in graph.arrays)
        rng = jax.random.PRNGKey(1)
        for _ in range(10):
            rng, sr = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, feats, *arrays, sr)
        assert np.isfinite(float(loss))

        # Zero-shot eval: the test split's unseen relation flows through
        # the full-graph forward purely from its text.
        full = encode_graph(kg.edge_index, kg.edge_texts, kg.num_nodes)
        embs = apply_hypergnn(
            config, params, feats, *(jnp.asarray(a) for a in full.arrays)
        )
        test_ei, test_texts = kg.split_edges("test")
        m = evaluate_link_prediction(
            embs, test_ei[0], test_ei[1], filter_edges=kg.edge_index
        )
        assert 0.0 <= m["mrr"] <= 1.0
        assert np.isfinite(m["hits@10"])
