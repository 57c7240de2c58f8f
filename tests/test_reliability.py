"""Reliability contract: determinism, checkpoint-restart, remat.

TPU-native equivalents of the aux subsystems the reference lacks
(SURVEY.md §5.2-§5.4): reduction determinism, fault-recovery via
checkpoint-restart equivalence, and activation rematerialization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
from graph_hypernetwork_forge_tpu.models.hypergnn import (
    HyperGNNConfig,
    apply_hypergnn,
    init_hypergnn,
)
from graph_hypernetwork_forge_tpu.training.train import make_train_step


def setup_case(seed=0, n=20, e=64, u=5):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    edge_index = np.stack(
        [rng.integers(0, n, size=e), rng.integers(0, n, size=e)]
    ).astype(np.int64)
    texts = [f"relation {i}" for i in range(u)]
    edge_texts = [texts[i] for i in rng.integers(0, u, size=e)]
    return feats, edge_index, edge_texts


class TestDeterminism:
    def test_forward_bitwise_deterministic(self):
        config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16)
        params = init_hypergnn(config, jax.random.PRNGKey(0))
        feats, ei, texts = setup_case()
        graph = encode_graph(ei, texts, feats.shape[0])
        arrays = tuple(jnp.asarray(a) for a in graph.arrays)
        f = jax.jit(lambda p, x: apply_hypergnn(config, p, x, *arrays))
        out1 = np.asarray(f(params, jnp.asarray(feats)))
        out2 = np.asarray(f(params, jnp.asarray(feats)))
        np.testing.assert_array_equal(out1, out2)

    def test_edge_order_invariance(self):
        """Permuting the edge list changes only reduction order; results must
        agree to f32 tolerance (mean aggregation is order-sensitive only in
        rounding)."""
        config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16)
        params = init_hypergnn(config, jax.random.PRNGKey(0))
        feats, ei, texts = setup_case(seed=3)
        perm = np.random.default_rng(7).permutation(ei.shape[1])
        graph1 = encode_graph(ei, texts, feats.shape[0])
        graph2 = encode_graph(
            ei[:, perm], [texts[i] for i in perm], feats.shape[0]
        )
        out1 = apply_hypergnn(
            config, params, jnp.asarray(feats),
            *(jnp.asarray(a) for a in graph1.arrays),
        )
        out2 = apply_hypergnn(
            config, params, jnp.asarray(feats),
            *(jnp.asarray(a) for a in graph2.arrays),
        )
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out2), atol=1e-5, rtol=1e-5
        )

    def test_training_reproducible_from_seed(self):
        config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16)
        feats, ei, texts = setup_case(seed=5)
        graph = encode_graph(ei, texts, feats.shape[0])
        arrays = tuple(jnp.asarray(a) for a in graph.arrays)
        optimizer = optax.adam(1e-3)

        def run():
            params = init_hypergnn(config, jax.random.PRNGKey(0))
            opt_state = optimizer.init(params)
            step = make_train_step(config, optimizer)
            rng = jax.random.PRNGKey(42)
            losses = []
            for _ in range(5):
                rng, srng = jax.random.split(rng)
                params, opt_state, loss = step(
                    params, opt_state, jnp.asarray(feats), *arrays, srng
                )
            return float(loss), params

        loss_a, pa = run()
        loss_b, pb = run()
        assert loss_a == loss_b
        for x, y in zip(
            jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestCheckpointRestart:
    def test_interrupted_training_equals_uninterrupted(self, tmp_path):
        """Fault-injection equivalent: kill training at step 3, restore from
        the checkpoint, continue — must match uninterrupted training
        bitwise (the elastic-recovery contract)."""
        from graph_hypernetwork_forge_tpu.training.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )

        config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16)
        feats, ei, texts = setup_case(seed=9)
        graph = encode_graph(ei, texts, feats.shape[0])
        arrays = tuple(jnp.asarray(a) for a in graph.arrays)
        optimizer = optax.adam(1e-3)
        step_fn = make_train_step(config, optimizer)
        rngs = [jax.random.PRNGKey(100 + i) for i in range(6)]

        def fresh():
            p = init_hypergnn(config, jax.random.PRNGKey(1))
            return jax.tree_util.tree_map(jnp.array, p)

        # Uninterrupted: 6 steps.
        params = fresh()
        opt_state = optimizer.init(fresh())
        for i in range(6):
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(feats), *arrays, rngs[i]
            )
        want_loss = float(loss)

        # Interrupted: 3 steps, checkpoint, "crash", restore, 3 more steps.
        params = fresh()
        opt_state = optimizer.init(fresh())
        for i in range(3):
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(feats), *arrays, rngs[i]
            )
        path = save_checkpoint(str(tmp_path), params, opt_state, step=3)
        del params, opt_state  # crash

        target_p = jax.tree_util.tree_map(np.asarray, fresh())
        target_o = jax.tree_util.tree_map(
            np.asarray, optimizer.init(fresh())
        )
        restored = restore_checkpoint(path, target_p, target_o)
        params, opt_state = restored["params"], restored["opt_state"]
        assert restored["step"] == 3
        for i in range(3, 6):
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(feats), *arrays, rngs[i]
            )
        assert float(loss) == want_loss


class TestRemat:
    def test_remat_matches_non_remat(self):
        feats, ei, texts = setup_case(seed=11)
        graph = encode_graph(ei, texts, feats.shape[0])
        arrays = tuple(jnp.asarray(a) for a in graph.arrays)
        base = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=16, num_layers=3
        )
        remat = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=16, num_layers=3, remat=True
        )
        params = init_hypergnn(base, jax.random.PRNGKey(0))

        def loss(cfg, p):
            out = apply_hypergnn(cfg, p, jnp.asarray(feats), *arrays)
            return jnp.sum(out**2)

        l1, g1 = jax.value_and_grad(lambda p: loss(base, p))(params)
        l2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(params)
        assert float(l1) == pytest.approx(float(l2), rel=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
            )
