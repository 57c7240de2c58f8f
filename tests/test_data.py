"""Tests for the data layer: ToyKG, encoding, synthetic datasets, sampler."""

import numpy as np
import pytest

from graph_hypernetwork_forge_tpu.data import ToyKnowledgeGraph, encode_graph
from graph_hypernetwork_forge_tpu.data.datasets import (
    fb15k237_like,
    generate_synthetic_kg,
    make_relation_vocabulary,
    wn18rr_zero_shot_like,
)
from graph_hypernetwork_forge_tpu.data.encoding import dedup_texts
from graph_hypernetwork_forge_tpu.data.sampling import NeighborSampler


class TestToyKnowledgeGraph:
    def test_counts(self, toy_kg):
        assert toy_kg.num_nodes == 8
        assert toy_kg.num_edges == 11
        assert len(toy_kg.relation_types) == 7

    def test_repr(self, toy_kg):
        assert (
            repr(toy_kg)
            == "ToyKnowledgeGraph(nodes=8, edges=11, relation_types=7)"
        )

    def test_features_deterministic(self):
        a = ToyKnowledgeGraph(feat_dim=16)
        b = ToyKnowledgeGraph(feat_dim=16)
        np.testing.assert_array_equal(a.node_features, b.node_features)

    def test_edge_index_shape(self, toy_kg):
        assert toy_kg.edge_index.shape == (2, 11)
        assert toy_kg.edge_index.dtype == np.int64


class TestEncoding:
    def test_dedup_order_preserving(self):
        uniq, ids = dedup_texts(["b", "a", "b", "c", "a"])
        assert uniq == ["b", "a", "c"]
        assert ids.tolist() == [0, 1, 0, 2, 1]

    def test_encode_graph_padding(self):
        ei = np.asarray([[0, 1, 2], [1, 2, 0]], dtype=np.int64)
        g = encode_graph(ei, ["x", "y", "x"], num_nodes=3)
        assert g.num_edges == 3
        assert g.num_relations == 2
        assert g.src.shape[0] % 64 == 0
        assert g.edge_mask[:3].tolist() == [1.0, 1.0, 1.0]
        assert g.edge_mask[3:].sum() == 0
        assert g.char_ids.shape[0] % 8 == 0

    def test_mismatch_raises(self):
        ei = np.asarray([[0], [1]], dtype=np.int64)
        with pytest.raises(ValueError):
            encode_graph(ei, ["x", "y"], num_nodes=2)

    def test_zero_edges_ok(self):
        g = encode_graph(np.zeros((2, 0), dtype=np.int64), [], num_nodes=4)
        assert g.num_edges == 0
        assert float(g.edge_mask.sum()) == 0.0


class TestSyntheticDatasets:
    def test_vocabulary_distinct(self):
        texts = make_relation_vocabulary(100, seed=1)
        assert len(texts) == len(set(texts)) == 100

    def test_generate_deterministic(self):
        a = generate_synthetic_kg(100, 400, 12, seed=3)
        b = generate_synthetic_kg(100, 400, 12, seed=3)
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        np.testing.assert_array_equal(a.node_features, b.node_features)

    def test_zero_shot_split_isolation(self):
        """Zero-shot relations must appear ONLY in the test split."""
        kg = generate_synthetic_kg(
            200, 1000, 20, seed=0, zero_shot_fraction=0.25
        )
        assert len(kg.zero_shot_relations) == 5
        zs_texts = {kg.relation_texts[r] for r in kg.zero_shot_relations}
        for split in ("train", "valid"):
            _, texts = kg.split_edges(split)
            assert not zs_texts & set(texts), f"zero-shot rel leaked into {split}"
        _, test_texts = kg.split_edges("test")
        assert zs_texts & set(test_texts)

    def test_splits_partition_edges(self):
        kg = generate_synthetic_kg(100, 500, 10, seed=1, zero_shot_fraction=0.2)
        all_idx = np.concatenate([kg.splits[s] for s in ("train", "valid", "test")])
        assert len(all_idx) == kg.num_edges
        assert len(np.unique(all_idx)) == kg.num_edges

    def test_named_configs_scaled(self):
        kg = fb15k237_like(scale=0.01)
        assert kg.num_nodes == 145
        assert len(kg.relation_texts) == 237
        kg2 = wn18rr_zero_shot_like(scale=0.01)
        assert len(kg2.zero_shot_relations) == 3


class TestNeighborSampler:
    def test_sample_contains_seed_in_edges(self):
        kg = generate_synthetic_kg(50, 300, 5, seed=2)
        sampler = NeighborSampler(kg.edge_index, kg.edge_texts, kg.num_nodes)
        batch = sampler.sample(
            [0, 1, 2, 3], fanouts=[4, 4], node_features=kg.node_features,
            rng=np.random.default_rng(0),
        )
        assert batch.seed_local_ids.shape == (4,)
        # Seed global ids round-trip through the local remap.
        np.testing.assert_array_equal(
            batch.node_ids[batch.seed_local_ids], [0, 1, 2, 3]
        )
        assert batch.node_features.shape[0] == len(batch.node_ids)
        # All (real) local edges reference valid local nodes.
        e = batch.graph.num_edges
        assert batch.graph.src[:e].max(initial=0) < len(batch.node_ids)

    def test_fanout_bounds_edges(self):
        kg = generate_synthetic_kg(50, 400, 5, seed=3)
        sampler = NeighborSampler(kg.edge_index, kg.edge_texts, kg.num_nodes)
        batch = sampler.sample(
            [5], fanouts=[2], node_features=kg.node_features,
            rng=np.random.default_rng(1),
        )
        assert batch.graph.num_edges <= 2

    def test_forward_on_sampled_subgraph(self, small_model):
        kg = generate_synthetic_kg(60, 300, 6, feat_dim=16, seed=4)
        sampler = NeighborSampler(kg.edge_index, kg.edge_texts, kg.num_nodes)
        batch = sampler.sample(
            [0, 1, 2], fanouts=[3, 3], node_features=kg.node_features,
            rng=np.random.default_rng(2),
        )
        out = small_model.forward_encoded(batch.node_features, batch.graph)
        assert out.shape == (len(batch.node_ids), small_model.hidden_dim)
