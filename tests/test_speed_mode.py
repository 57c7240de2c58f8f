"""bf16 activation-storage speed mode (``HyperGNNConfig(compute_dtype=
"bfloat16")``).

Speed mode halves the wire bytes of the gathers/streams/reduction tails
that dominate the bandwidth-bound large-graph steps while keeping every
accumulation (segment sums, dW outers, Adam, LayerNorm) in f32. It opts
out of the f32 parity gate; these tests pin down that the result is
bf16-CLASS (close to the f32 run), not broken, across the grouped,
pallas (interpret), dense, and chunked backends, and that training still
optimizes.
"""

import dataclasses

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

D = 16


def _case(seed=0, n=60, e=400, u=6, group_pad=0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((n, D)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    texts = [f"relation flavour {i}" for i in range(u)]
    etexts = [texts[i] for i in rng.integers(0, u, e)]
    graph = encode_graph(
        ei, etexts, n, sort_by_relation=True, with_sort_plan=True,
        group_pad=group_pad,
    )
    return jnp.asarray(feats), graph


def _forward(config, graph, feats):
    params = init_hypergnn(config, jax.random.PRNGKey(0))
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)
    plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
    return apply_hypergnn(config, params, feats, *arrays, sort_plan=plan)


@pytest.mark.parametrize(
    "backend,group_pad",
    [("grouped", 0), ("dense", 0), ("chunked", 0), ("pallas", 256)],
)
def test_bf16_forward_close_to_f32(backend, group_pad):
    feats, graph = _case(group_pad=group_pad)
    base = HyperGNNConfig(
        text_dim=32, node_feat_dim=D, hidden_dim=D, num_layers=2,
        backend=backend, rel_sorted=True, group_padded=group_pad > 0,
    )
    if backend == "pallas":
        # The streaming kernel needs MXU-aligned d on real TPUs; interpret
        # mode (CPU tests) has no such constraint.
        pass
    f32 = _forward(base, graph, feats)
    bf16 = _forward(
        dataclasses.replace(base, compute_dtype="bfloat16"), graph, feats
    )
    assert bf16.dtype == jnp.float32  # node embeddings come back f32
    scale = float(jnp.max(jnp.abs(f32))) + 1e-6
    err = float(jnp.max(jnp.abs(bf16 - f32))) / scale
    assert err < 5e-2, f"bf16 run too far from f32: rel {err}"
    assert err > 1e-7 or backend == "chunked"  # genuinely bf16 somewhere


def test_bf16_training_reduces_loss_and_keeps_f32_params():
    feats, graph = _case(seed=3)
    config = HyperGNNConfig(
        text_dim=32, node_feat_dim=D, hidden_dim=D, num_layers=2,
        backend="grouped", rel_sorted=True, compute_dtype="bfloat16",
    )
    params = init_hypergnn(config, jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_train_step(config, optimizer, neg_mode="roll")
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)
    plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)
    r = jax.random.PRNGKey(1)
    losses = []
    for _ in range(12):
        r, sr = jax.random.split(r)
        params, opt_state, loss = step(
            params, opt_state, feats, *arrays, sr, sort_plan=plan
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # Master params and optimizer state stay f32.
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype in (jnp.float32, jnp.int32)


def test_bf16_grads_close_to_f32():
    feats, graph = _case(seed=5)
    arrays = tuple(jnp.asarray(a) for a in graph.arrays)
    plan = jax.tree_util.tree_map(jnp.asarray, graph.sort_plan)

    def loss_for(config):
        params = init_hypergnn(config, jax.random.PRNGKey(0))

        def f(params):
            out = apply_hypergnn(
                config, params, feats, *arrays, sort_plan=plan
            )
            return jnp.sum(out * out)

        return jax.grad(f)(params)

    base = HyperGNNConfig(
        text_dim=32, node_feat_dim=D, hidden_dim=D, num_layers=2,
        backend="grouped", rel_sorted=True,
    )
    g32 = loss_for(base)
    g16 = loss_for(dataclasses.replace(base, compute_dtype="bfloat16"))
    flat32 = jnp.concatenate(
        [x.ravel() for x in jax.tree_util.tree_leaves(g32)]
    )
    flat16 = jnp.concatenate(
        [x.ravel() for x in jax.tree_util.tree_leaves(g16)]
    )
    cos = float(
        jnp.dot(flat32, flat16)
        / (jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12)
    )
    assert cos > 0.99, f"bf16 grads diverge from f32 (cosine {cos})"
