"""Minibatch trainer: loss decreases, shapes stay bucket-stable."""

import jax
import pytest
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


class TestDistributedMinibatchTrainer:
    """Minibatch × composed (BASELINE config #4 shape): per-shard
    fixed-bucket subgraph batches driving the edge-sharded step, exact vs
    the single-device minibatch trainer on the same draws."""

    def _trainers(self, k=4, seed=0):
        import optax

        from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh
        from graph_hypernetwork_forge_tpu.training.minibatch import (
            DistributedMinibatchTrainer,
        )

        kg = generate_synthetic_kg(150, 800, 8, feat_dim=16, seed=seed)
        config = HyperGNNConfig(text_dim=16, node_feat_dim=16, hidden_dim=16)
        optimizer = optax.adam(5e-3)
        spec = MinibatchSpec(
            batch_size=64, fanouts=(5, 5), node_bucket_multiple=128
        )
        args = (config, optimizer, kg.edge_index, kg.edge_texts,
                kg.node_features)
        single = MinibatchTrainer(*args, spec)
        mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
        dist = DistributedMinibatchTrainer(mesh, *args, spec)
        return single, dist, config, optimizer

    @pytest.mark.slow
    def test_matches_single_device_on_same_batch(self):
        single, dist, config, optimizer = self._trainers()
        params = init_hypergnn(config, jax.random.PRNGKey(0))
        opt_state = optimizer.init(params)
        for i in range(2):
            rng_jax = jax.random.PRNGKey(100 + i)
            p1, o1, l1 = single.step(
                params, opt_state, np.random.default_rng(7 + i), rng_jax
            )
            p2, o2, l2 = dist.step(
                params, opt_state, np.random.default_rng(7 + i), rng_jax
            )
            np.testing.assert_allclose(float(l2), float(l1), atol=1e-5)
            for a, b in zip(
                jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=3e-5
                )
            params, opt_state = p2, o2

    def test_loss_decreases_and_shapes_stable(self):
        _, dist, config, optimizer = self._trainers(k=2, seed=3)
        params = init_hypergnn(config, jax.random.PRNGKey(0))
        opt_state = optimizer.init(params)
        rng_np = np.random.default_rng(0)
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(10):
            rng, srng = jax.random.split(rng)
            params, opt_state, loss = dist.step(
                params, opt_state, rng_np, srng
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert np.mean(losses[-3:]) < np.mean(losses[:3])
        # One compiled program served every batch (fixed bucket shapes).
        assert len(dist._dist_steps) == 1

    def test_batch_size_must_divide_mesh(self):
        import optax
        import pytest

        from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh
        from graph_hypernetwork_forge_tpu.training.minibatch import (
            DistributedMinibatchTrainer,
        )

        kg = generate_synthetic_kg(60, 200, 4, feat_dim=8, seed=1)
        config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16)
        mesh = make_mesh((4,), ("edge",), devices=jax.devices()[:4])
        with pytest.raises(ValueError):
            DistributedMinibatchTrainer(
                mesh, config, optax.adam(1e-3), kg.edge_index,
                kg.edge_texts, kg.node_features,
                MinibatchSpec(batch_size=30),
            )

    def test_grouped_contrib_matches_dense(self):
        """contrib='grouped' (the large-U·n_sub regime the dense product
        cannot compile at) == dense on the same sharded batch."""
        import optax

        from graph_hypernetwork_forge_tpu.training.minibatch import (
            make_composed_minibatch_step,
        )

        _, dist, config, optimizer = self._trainers(k=2, seed=5)
        batch = dist.sample_batch_sharded(np.random.default_rng(11))
        (inputs, feats, src, dst, rel, mask, chars, lens, ps, pd, pm,
         gs) = batch
        params = init_hypergnn(config, jax.random.PRNGKey(0))
        opt_state = optimizer.init(params)
        rng = jax.random.PRNGKey(9)
        outs = {}
        for contrib in ("dense", "grouped"):
            step = make_composed_minibatch_step(
                dist.mesh, config, optimizer, inputs.nodes_per_shard,
                contrib=contrib,
            )
            p2, _, loss = step(
                params, opt_state, feats, src, dst, rel, mask, chars,
                lens, ps, pd, pm, rng, rel_group_sizes=gs,
            )
            outs[contrib] = (p2, float(loss))
        np.testing.assert_allclose(
            outs["grouped"][1], outs["dense"][1], atol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(outs["grouped"][0]),
            jax.tree_util.tree_leaves(outs["dense"][0]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5
            )
