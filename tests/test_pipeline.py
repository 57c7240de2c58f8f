"""Pipeline parallelism: staged layer execution == single-device model.

Exactness gate for ``parallel/pipeline.py``: forwarding M microbatches
through an S-stage pipeline (layers sharded over the ``"pipe"`` axis,
activations rotated with ``ppermute``) must reproduce the single-device
``apply_hypergnn`` output per microbatch, and gradients must flow through
the tick scan (static trip count → reverse-differentiable).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
from graph_hypernetwork_forge_tpu.models.hypergnn import (
    HyperGNNConfig,
    apply_hypergnn,
    init_hypergnn,
)
from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh
from graph_hypernetwork_forge_tpu.parallel.pipeline import (
    make_pipelined_train_step,
    pipelined_forward,
    stack_layer_params,
)

N_NODES = 12
N_MICRO = 5
HIDDEN = 16


def _make_microbatches(num_micro: int, seed: int = 0):
    """Microbatches with identical static shapes (same E, same texts)."""
    rng = np.random.default_rng(seed)
    texts = ["works with", "located in", "reports to"]
    feats, graphs = [], []
    for _ in range(num_micro):
        e = 24
        edge_index = np.stack(
            [rng.integers(0, N_NODES, size=e), rng.integers(0, N_NODES, size=e)]
        ).astype(np.int64)
        edge_texts = [texts[i] for i in rng.integers(0, len(texts), size=e)]
        # Ensure every relation appears so U is identical across microbatches.
        edge_texts[:3] = texts
        feats.append(rng.standard_normal((N_NODES, 8)).astype(np.float32))
        graphs.append(encode_graph(edge_index, edge_texts, N_NODES))
    stacked = tuple(
        jnp.stack([jnp.asarray(g.arrays[i]) for g in graphs])
        for i in range(len(graphs[0].arrays))
    )
    return jnp.stack([jnp.asarray(f) for f in feats]), stacked, graphs


@pytest.fixture(scope="module")
def pipe_setup():
    config = HyperGNNConfig(
        text_dim=16, node_feat_dim=8, hidden_dim=HIDDEN, num_layers=4
    )
    params = init_hypergnn(config, jax.random.PRNGKey(7))
    feats, arrays, graphs = _make_microbatches(N_MICRO)
    return config, params, feats, arrays, graphs


class TestPipelinedForward:
    def test_matches_single_device(self, pipe_setup):
        config, params, feats, arrays, graphs = pipe_setup
        mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
        out = pipelined_forward(mesh, config, params, feats, *arrays)
        assert out.shape == (N_MICRO, N_NODES, HIDDEN)
        for mb in range(N_MICRO):
            expected = apply_hypergnn(
                config, params, feats[mb], *(a[mb] for a in arrays)
            )
            np.testing.assert_allclose(
                np.asarray(out[mb]), np.asarray(expected), atol=1e-5, rtol=1e-5
            )

    def test_two_stage(self, pipe_setup):
        config, params, feats, arrays, _ = pipe_setup
        mesh = make_mesh((2,), ("pipe",), devices=jax.devices()[:2])
        out = pipelined_forward(mesh, config, params, feats, *arrays)
        expected = apply_hypergnn(
            config, params, feats[0], *(a[0] for a in arrays)
        )
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(expected), atol=1e-5, rtol=1e-5
        )

    def test_indivisible_layers_raises(self, pipe_setup):
        config, params, feats, arrays, _ = pipe_setup
        mesh = make_mesh((3,), ("pipe",), devices=jax.devices()[:3])
        with pytest.raises(ValueError, match="divisible"):
            pipelined_forward(mesh, config, params, feats, *arrays)

    @pytest.mark.slow
    def test_gradients_flow(self, pipe_setup):
        """Reverse-mode through the pipeline == single-device gradients."""
        config, params, feats, arrays, _ = pipe_setup
        mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])

        def pipe_loss(p):
            out = pipelined_forward(mesh, config, p, feats, *arrays)
            return jnp.sum(out**2)

        def seq_loss(p):
            total = 0.0
            for mb in range(N_MICRO):
                out = apply_hypergnn(
                    config, p, feats[mb], *(a[mb] for a in arrays)
                )
                total = total + jnp.sum(out**2)
            return total

        g_pipe = jax.grad(pipe_loss)(params)
        g_seq = jax.grad(seq_loss)(params)
        flat_p, _ = jax.tree_util.tree_flatten(g_pipe)
        flat_s, _ = jax.tree_util.tree_flatten(g_seq)
        assert len(flat_p) == len(flat_s)
        for a, b in zip(flat_p, flat_s):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3
            )

    def test_pipelined_train_step(self, pipe_setup):
        """One pipelined optimizer step == the equivalent sequential step."""
        import optax

        from graph_hypernetwork_forge_tpu.training.objectives import (
            link_prediction_loss,
        )

        config, params, feats, arrays, _ = pipe_setup
        src, dst, rel, mask, chars, lens = arrays
        mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
        optimizer = optax.adam(1e-2)
        opt_state = optimizer.init(params)
        step = make_pipelined_train_step(mesh, config, optimizer)
        rng = jax.random.PRNGKey(3)
        new_params, _, loss = step(
            params, opt_state, feats, src, dst, rel, mask, chars, lens, rng
        )
        assert np.isfinite(float(loss))

        # Sequential equivalent with the same negatives (the pipelined step
        # splits its rng into (neg, dropout) keys; dropout is off here).
        neg_rng, _drop_rng = jax.random.split(rng)
        neg_dst = jax.random.randint(neg_rng, src.shape, 0, N_NODES, dtype=src.dtype)

        def seq_loss(p):
            losses = []
            for mb in range(N_MICRO):
                embs = apply_hypergnn(
                    config, p, feats[mb], src[mb], dst[mb], rel[mb],
                    mask[mb], chars[mb], lens[mb],
                )
                losses.append(
                    link_prediction_loss(
                        embs, src[mb], dst[mb], neg_dst[mb], edge_mask=mask[mb]
                    )
                )
            return jnp.mean(jnp.stack(losses))

        np.testing.assert_allclose(float(loss), float(seq_loss(params)), atol=1e-5)
        # Parameters actually moved.
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(params),
                jax.tree_util.tree_leaves(new_params),
            )
        )
        assert moved

    def test_stack_layer_params_shapes(self, pipe_setup):
        config, params, *_ = pipe_setup
        gens, norms = stack_layer_params(params)
        for leaf in jax.tree_util.tree_leaves(gens):
            assert leaf.shape[0] == config.num_layers
        for leaf in jax.tree_util.tree_leaves(norms):
            assert leaf.shape[0] == config.num_layers


class TestPipelineDropoutAndDepth:
    def test_pipelined_dropout_train_step(self):
        """Dropout-regularized pipelined training runs, is finite, and is
        stochastic across rng keys (ADVICE r1: dropout must not be silently
        ignored in the pipeline)."""
        import optax

        config = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=HIDDEN, num_layers=4,
            dropout=0.3,
        )
        params = init_hypergnn(config, jax.random.PRNGKey(1))
        feats, arrays, _ = _make_microbatches(3, seed=5)
        mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
        optimizer = optax.adam(1e-2)
        opt_state = optimizer.init(params)
        step = make_pipelined_train_step(mesh, config, optimizer)
        _, _, loss_a = step(
            params, opt_state, feats, *arrays, jax.random.PRNGKey(10)
        )
        _, _, loss_b = step(
            params, opt_state, feats, *arrays, jax.random.PRNGKey(11)
        )
        assert np.isfinite(float(loss_a)) and np.isfinite(float(loss_b))
        # Different dropout/negative keys -> different losses.
        assert float(loss_a) != float(loss_b)

    def test_pipelined_dropout_forward_matches_nothing_dropped_when_eval(self):
        """train=False pipelined forward of a dropout config == single-device
        eval forward (dropout correctly disabled)."""
        config = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=HIDDEN, num_layers=4,
            dropout=0.5,
        )
        params = init_hypergnn(config, jax.random.PRNGKey(2))
        feats, arrays, _ = _make_microbatches(2, seed=6)
        mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
        out = pipelined_forward(mesh, config, params, feats, *arrays)
        for mb in range(2):
            ref = apply_hypergnn(
                config, params, feats[mb], *(a[mb] for a in arrays)
            )
            np.testing.assert_allclose(
                np.asarray(out[mb]), np.asarray(ref), atol=2e-5
            )

    def test_deep_pipeline_l8(self):
        """8 layers over 4 stages (2 layers/stage) matches single device."""
        config = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=HIDDEN, num_layers=8,
        )
        params = init_hypergnn(config, jax.random.PRNGKey(3))
        feats, arrays, _ = _make_microbatches(3, seed=7)
        mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
        out = pipelined_forward(mesh, config, params, feats, *arrays)
        for mb in range(3):
            ref = apply_hypergnn(
                config, params, feats[mb], *(a[mb] for a in arrays)
            )
            np.testing.assert_allclose(
                np.asarray(out[mb]), np.asarray(ref), atol=2e-5
            )

    def test_pipeline_remat_matches(self):
        config = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=HIDDEN, num_layers=4,
            remat=True,
        )
        params = init_hypergnn(config, jax.random.PRNGKey(4))
        feats, arrays, _ = _make_microbatches(2, seed=8)
        mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
        out = pipelined_forward(mesh, config, params, feats, *arrays)
        ref_cfg = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=HIDDEN, num_layers=4,
        )
        for mb in range(2):
            ref = apply_hypergnn(
                ref_cfg, params, feats[mb], *(a[mb] for a in arrays)
            )
            np.testing.assert_allclose(
                np.asarray(out[mb]), np.asarray(ref), atol=2e-5
            )
