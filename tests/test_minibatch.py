"""Minibatch trainer: loss decreases, shapes stay bucket-stable."""

import jax
import numpy as np
import optax

from graph_hypernetwork_forge_tpu.data.datasets import generate_synthetic_kg
from graph_hypernetwork_forge_tpu.models.hypergnn import (
    HyperGNNConfig,
    init_hypergnn,
)
from graph_hypernetwork_forge_tpu.training.minibatch import (
    MinibatchSpec,
    MinibatchTrainer,
)


class TestMinibatchTrainer:
    def test_loss_decreases_over_steps(self):
        kg = generate_synthetic_kg(150, 800, 8, feat_dim=16, seed=0)
        config = HyperGNNConfig(text_dim=16, node_feat_dim=16, hidden_dim=16)
        optimizer = optax.adam(5e-3)
        trainer = MinibatchTrainer(
            config,
            optimizer,
            kg.edge_index,
            kg.edge_texts,
            kg.node_features,
            MinibatchSpec(batch_size=64, fanouts=(5, 5), node_bucket_multiple=128),
        )
        params = init_hypergnn(config, jax.random.PRNGKey(0))
        opt_state = optimizer.init(params)
        rng_np = np.random.default_rng(0)
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(12):
            rng, srng = jax.random.split(rng)
            params, opt_state, loss = trainer.step(params, opt_state, rng_np, srng)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert np.mean(losses[-4:]) < np.mean(losses[:4])

    def test_shapes_bucket_stable(self):
        """Consecutive batches land in the same shape buckets (no recompile
        churn) for a homogeneous graph."""
        kg = generate_synthetic_kg(200, 1500, 6, feat_dim=8, seed=1)
        config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16)
        trainer = MinibatchTrainer(
            config,
            optax.adam(1e-3),
            kg.edge_index,
            kg.edge_texts,
            kg.node_features,
            MinibatchSpec(batch_size=32, fanouts=(4,), node_bucket_multiple=256),
        )
        rng_np = np.random.default_rng(2)
        shapes = set()
        for _ in range(5):
            feats, graph, ps, pd, pm = trainer.sample_batch(rng_np)
            shapes.add(
                (feats.shape, graph.src.shape, graph.char_ids.shape, ps.shape)
            )
        assert len(shapes) <= 2, f"too many shape buckets: {shapes}"
