"""Data parallelism: DP minibatch step == single-device vmapped step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graph_hypernetwork_forge_tpu.models.hypergnn import (
    HyperGNNConfig,
    apply_hypergnn,
    init_hypergnn,
)
from graph_hypernetwork_forge_tpu.parallel.data_parallel import (
    make_data_parallel_step,
)
from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh
from graph_hypernetwork_forge_tpu.training.objectives import (
    link_prediction_loss,
)
from tests.test_pipeline import N_NODES, _make_microbatches


def test_dp_step_matches_single_device():
    config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16, num_layers=2)
    params = init_hypergnn(config, jax.random.PRNGKey(5))
    feats, arrays, _ = _make_microbatches(4, seed=3)
    src, dst, rel, mask, chars, lens = arrays

    mesh = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_data_parallel_step(mesh, config, optimizer)
    rng = jax.random.PRNGKey(9)
    dp_params, _, dp_loss = step(
        params, opt_state, feats, src, dst, rel, mask, chars, lens, rng
    )

    # Single-device equivalent with identical negatives (the DP step splits
    # its rng into (neg, dropout) keys; dropout is off in this config).
    neg_rng, _drop_rng = jax.random.split(rng)
    neg = jax.random.randint(neg_rng, src.shape, 0, N_NODES, dtype=src.dtype)

    def loss_fn(p):
        losses = [
            link_prediction_loss(
                apply_hypergnn(
                    config, p, feats[b], src[b], dst[b], rel[b], mask[b],
                    chars[b], lens[b],
                ),
                src[b], dst[b], neg[b], edge_mask=mask[b],
            )
            for b in range(4)
        ]
        return jnp.mean(jnp.stack(losses))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(dp_loss), float(loss), atol=1e-5)
    updates, _ = optimizer.update(grads, opt_state, params)
    ref_params = optax.apply_updates(params, updates)
    for a, b in zip(
        jax.tree_util.tree_leaves(dp_params),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_dp_loss_decreases():
    config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16, num_layers=2)
    params = init_hypergnn(config, jax.random.PRNGKey(0))
    feats, arrays, _ = _make_microbatches(4, seed=1)
    mesh = make_mesh((2,), ("data",), devices=jax.devices()[:2])
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_data_parallel_step(mesh, config, optimizer)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(15):
        key, sk = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, feats, *arrays, sk)
        losses.append(float(loss))
    assert losses[-1] <= losses[0] * 2  # reference-style lenient bound
    assert all(np.isfinite(l) for l in losses)
