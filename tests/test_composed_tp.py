"""2D (edge × model) composed step: exactness vs the 1D composed step.

The model axis only re-orders the d_in contraction (Megatron head split +
one activation psum), so given identical inputs and rng the 2D step's loss
and post-Adam parameters must match the 1D halo/local_roll step to float
tolerance — while the weight banks exist only as [U, d_in/k_m, d_out]
shards (asserted on the params' device shards). Reference semantics being
sharded: /root/reference/graph_hypernetwork_forge/models/hypergnn.py:201-230
and models/weight_generator.py:120-143.
"""

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
from graph_hypernetwork_forge_tpu.parallel.composed import (
    make_composed_train_step,
    prepare_composed_inputs,
)
from graph_hypernetwork_forge_tpu.parallel.composed_tp import (
    make_composed_tp_train_step,
    shard_composed_tp_params,
)
from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh


def _setup(seed=0, n=26, e=100, u=6, f=8, hidden=16, text_dim=16):
    rng = np.random.default_rng(seed)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    texts = [f"relation kind {i}" for i in range(u)]
    etexts = [texts[i] for i in rng.integers(0, u, e)]
    graph = encode_graph(ei, etexts, n)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    config = HyperGNNConfig(
        text_dim=text_dim, node_feat_dim=f, hidden_dim=hidden, num_layers=2,
    )
    params = init_hypergnn(config, jax.random.PRNGKey(3))
    return graph, feats, config, params


def _inputs_arrays(inputs):
    return tuple(
        jnp.asarray(a) for a in (
            inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
            inputs.edge_mask, inputs.char_ids, inputs.lengths,
        )
    )


def _run_1d(graph, feats, config, params, k_e, rng, contrib="dense",
            rel_sort_local=False):
    mesh = make_mesh((k_e,), ("edge",), devices=jax.devices()[:k_e])
    inputs = prepare_composed_inputs(
        graph, feats, k_e, halo=True, rel_sort_local=rel_sort_local
    )
    optimizer = optax.adam(1e-2)
    step = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
        contrib=contrib,
    )
    kwargs = dict(
        src_halo=jnp.asarray(inputs.src_halo),
        send_idx=jnp.asarray(inputs.send_idx),
    )
    if contrib == "grouped":
        kwargs["rel_group_sizes"] = jnp.asarray(inputs.rel_group_sizes)
    new_params, _, loss = step(
        params, optimizer.init(params), *_inputs_arrays(inputs), rng, **kwargs
    )
    return new_params, float(loss)


def _run_2d(graph, feats, config, params, k_e, k_m, rng, contrib="dense",
            rel_sort_local=False, agg_sorted=False):
    mesh = make_mesh((k_e, k_m), ("edge", "model"),
                     devices=jax.devices()[: k_e * k_m])
    inputs = prepare_composed_inputs(
        graph, feats, k_e, halo=True, rel_sort_local=rel_sort_local
    )
    sharded = shard_composed_tp_params(params, config, mesh)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(sharded)
    step = make_composed_tp_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        halo_width=inputs.halo_width, contrib=contrib, agg_sorted=agg_sorted,
    )
    kwargs = dict(
        src_halo=jnp.asarray(inputs.src_halo),
        send_idx=jnp.asarray(inputs.send_idx),
    )
    if contrib == "grouped":
        kwargs["rel_group_sizes"] = jnp.asarray(inputs.rel_group_sizes)
    if agg_sorted:
        kwargs["agg_plan"] = tuple(
            jnp.asarray(a) for a in inputs.agg_plan
        )
    new_params, _, loss = step(
        sharded, opt_state, *_inputs_arrays(inputs), rng, **kwargs
    )
    return new_params, float(loss), sharded, mesh


@pytest.mark.parametrize(
    "contrib",
    [pytest.param("dense", marks=pytest.mark.slow), "grouped"],
)
def test_2d_matches_1d(contrib):
    graph, feats, config, params = _setup(seed=5)
    rng = jax.random.PRNGKey(17)
    rel_sort = contrib == "grouped"
    p1, l1 = _run_1d(graph, feats, config, params, 4, rng, contrib=contrib,
                     rel_sort_local=rel_sort)
    p2, l2, _, _ = _run_2d(graph, feats, config, params, 4, 2, rng,
                           contrib=contrib, rel_sort_local=rel_sort)
    np.testing.assert_allclose(l2, l1, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        )


@pytest.mark.slow
def test_2d_agg_sorted_matches_unsorted():
    graph, feats, config, params = _setup(seed=8)
    rng = jax.random.PRNGKey(23)
    p_u, l_u, _, _ = _run_2d(graph, feats, config, params, 4, 2, rng)
    p_s, l_s, _, _ = _run_2d(graph, feats, config, params, 4, 2, rng,
                             agg_sorted=True)
    np.testing.assert_allclose(l_s, l_u, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_u), jax.tree_util.tree_leaves(p_s)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_2d_bank_params_are_model_sharded():
    """The generator matrix-head final Linears (the bank producers) must be
    physically sharded over the model axis: per-device bytes ÷ k_m."""
    graph, feats, config, params = _setup(seed=2)
    _, _, sharded, mesh = _run_2d(graph, feats, config, params, 4, 2,
                                  jax.random.PRNGKey(0))
    gen = sharded["weight_generators"][0]
    for name in ("W_msg", "W_self"):
        final = gen["heads"][name][-1]["w"]
        shard_bytes = final.addressable_shards[0].data.nbytes
        assert shard_bytes * 2 == final.nbytes, (
            f"{name} final head not model-sharded: shard {shard_bytes} B "
            f"of {final.nbytes} B"
        )


def test_2d_validation():
    graph, feats, config, params = _setup()
    mesh = make_mesh((4, 2), ("edge", "model"), devices=jax.devices()[:8])
    with pytest.raises(ValueError):
        make_composed_tp_train_step(
            mesh, config, optax.adam(1e-3), 8, halo_width=None
        )
    # dropout > 0 is SUPPORTED since round 5 (coordinated edge-folded
    # masks) — building the step must not raise.
    cfg_drop = HyperGNNConfig(
        text_dim=16, node_feat_dim=8, hidden_dim=16, num_layers=2,
        dropout=0.5,
    )
    make_composed_tp_train_step(
        mesh, cfg_drop, optax.adam(1e-3), 8, halo_width=2
    )


def test_2d_dropout_matches_1d():
    """dropout > 0: the 2D step's coordinated (edge-folded) masks — full-
    width draws sliced per model rank for the column-sharded generator
    hiddens, shared draws elsewhere — reproduce the 1D composed step's
    loss and post-Adam params exactly."""
    graph, feats, _, _ = _setup(seed=9)
    config = HyperGNNConfig(
        text_dim=16, node_feat_dim=8, hidden_dim=16, num_layers=2,
        dropout=0.35,
    )
    params = init_hypergnn(config, jax.random.PRNGKey(3))
    rng = jax.random.PRNGKey(29)
    p1, l1 = _run_1d(graph, feats, config, params, 4, rng)
    p2, l2, _, _ = _run_2d(graph, feats, config, params, 4, 2, rng)
    np.testing.assert_allclose(l2, l1, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
