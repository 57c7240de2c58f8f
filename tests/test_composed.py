"""Composed multi-device train step: exactness vs single-device training.

``parallel/composed.py`` runs relation-sharded weight generation +
node-partitioned message passing + loss + gradient reduction in one SPMD
program. Its loss and post-Adam parameters must match the equivalent
single-device computation (same negatives, same objective as reference
``demo.py:79-98``).
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
from graph_hypernetwork_forge_tpu.parallel.composed import (
    composed_forward,
    make_composed_train_step,
    prepare_composed_inputs,
)
from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh
from graph_hypernetwork_forge_tpu.training.objectives import (
    link_prediction_loss,
)


def _setup(seed=0, n=26, e=100, u=6, f=8, hidden=16, dropout=0.0):
    rng = np.random.default_rng(seed)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    texts = [f"relation kind {i}" for i in range(u)]
    etexts = [texts[i] for i in rng.integers(0, u, e)]
    graph = encode_graph(ei, etexts, n)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    config = HyperGNNConfig(
        text_dim=16, node_feat_dim=f, hidden_dim=hidden, num_layers=2,
        dropout=dropout,
    )
    params = init_hypergnn(config, jax.random.PRNGKey(3))
    return graph, feats, config, params


@pytest.mark.parametrize(
    "k",
    [pytest.param(2, marks=pytest.mark.slow), 4,
     pytest.param(8, marks=pytest.mark.slow)],
)
def test_composed_forward_matches_single_device(k):
    graph, feats, config, params = _setup()
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    inputs = prepare_composed_inputs(graph, feats, k)

    out = composed_forward(mesh, config, params, inputs)

    # Single-device oracle on the SAME partitioned layout (aggregation is
    # edge-order invariant; padded nodes are extra isolated rows).
    n_pad = inputs.feats.shape[0]
    ref = apply_hypergnn(
        config, params,
        jnp.asarray(inputs.feats),
        jnp.asarray(inputs.src), jnp.asarray(inputs.dst),
        jnp.asarray(inputs.rel_ids), jnp.asarray(inputs.edge_mask),
        jnp.asarray(inputs.char_ids), jnp.asarray(inputs.lengths),
    )
    assert out.shape == (n_pad, config.hidden_dim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_composed_train_step_matches_single_device():
    graph, feats, config, params = _setup(seed=4)
    k = 4
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    inputs = prepare_composed_inputs(graph, feats, k)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        num_nodes=inputs.num_nodes,
    )
    rng = jax.random.PRNGKey(11)
    arrays = (
        jnp.asarray(inputs.feats), jnp.asarray(inputs.src),
        jnp.asarray(inputs.dst), jnp.asarray(inputs.rel_ids),
        jnp.asarray(inputs.edge_mask), jnp.asarray(inputs.char_ids),
        jnp.asarray(inputs.lengths),
    )
    new_params, _, loss = step(params, opt_state, *arrays, rng)
    assert np.isfinite(float(loss))

    # Single-device equivalent with identical negatives (same rng split).
    neg_rng, _ = jax.random.split(rng)
    neg = jax.random.randint(
        neg_rng, inputs.src.shape, 0, inputs.num_nodes,
        dtype=jnp.asarray(inputs.src).dtype,
    )

    def ref_loss(p):
        embs = apply_hypergnn(config, p, *arrays)
        return link_prediction_loss(
            embs, arrays[1], arrays[2], neg, edge_mask=arrays[4]
        )

    l_ref, grads = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(l_ref), atol=1e-5)
    updates, _ = optimizer.update(grads, opt_state, params)
    ref_params = optax.apply_updates(params, updates)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_params),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_composed_training_decreases_loss():
    graph, feats, config, params = _setup(seed=5)
    k = 8
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    inputs = prepare_composed_inputs(graph, feats, k)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        num_nodes=inputs.num_nodes,
    )
    arrays = tuple(
        jnp.asarray(a) for a in (
            inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
            inputs.edge_mask, inputs.char_ids, inputs.lengths,
        )
    )
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(12):
        rng, sr = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, *arrays, sr)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] <= losses[0]


def test_composed_dropout_runs():
    graph, feats, config, params = _setup(seed=6, dropout=0.3)
    k = 2
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    inputs = prepare_composed_inputs(graph, feats, k)
    optimizer = optax.adam(1e-3)
    step = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        num_nodes=inputs.num_nodes,
    )
    arrays = tuple(
        jnp.asarray(a) for a in (
            inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
            inputs.edge_mask, inputs.char_ids, inputs.lengths,
        )
    )
    _, _, la = step(params, optimizer.init(params), *arrays, jax.random.PRNGKey(1))
    _, _, lb = step(params, optimizer.init(params), *arrays, jax.random.PRNGKey(2))
    assert np.isfinite(float(la)) and np.isfinite(float(lb))
    assert float(la) != float(lb)  # dropout + negatives actually random


@pytest.mark.slow
def test_composed_halo_step_matches_dense_v1():
    """Halo-mode step (all_to_all boundary rows) == dense-v1 step exactly."""
    graph, feats, config, params = _setup(seed=7)
    k = 4
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    dense_in = prepare_composed_inputs(graph, feats, k)
    halo_in = prepare_composed_inputs(graph, feats, k, halo=True)
    assert halo_in.src_halo is not None and halo_in.send_idx is not None
    # Same partitioned layout in both modes.
    np.testing.assert_array_equal(dense_in.dst, halo_in.dst)
    np.testing.assert_array_equal(dense_in.src, halo_in.src)

    optimizer = optax.adam(1e-2)
    rng = jax.random.PRNGKey(21)

    def run(inputs, halo_width):
        # Pin uniform_global negatives so both variants draw IDENTICAL
        # negatives and the comparison is exact (local_roll, the halo
        # default, is covered by its own oracle test below).
        step = make_composed_train_step(
            mesh, config, optimizer, inputs.nodes_per_shard,
            num_nodes=inputs.num_nodes, halo_width=halo_width,
            neg_mode="uniform_global",
        )
        arrays = tuple(
            jnp.asarray(a) for a in (
                inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
                inputs.edge_mask, inputs.char_ids, inputs.lengths,
            )
        )
        kwargs = {}
        if halo_width is not None:
            kwargs = dict(
                src_halo=jnp.asarray(inputs.src_halo),
                send_idx=jnp.asarray(inputs.send_idx),
            )
        return step(
            params, optimizer.init(params), *arrays, rng, **kwargs
        )

    p_dense, _, l_dense = run(dense_in, None)
    p_halo, _, l_halo = run(halo_in, halo_in.halo_width)
    np.testing.assert_allclose(float(l_halo), float(l_dense), atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_halo), jax.tree_util.tree_leaves(p_dense)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


@pytest.mark.slow
def test_composed_local_scoring_matches_oracle():
    """Halo default (neg_mode='local_roll') loss AND grads == a single-device
    oracle computing the identical objective: per-shard rotated tails,
    masked mean over all real edges (reference demo.py:96 semantics)."""
    graph, feats, config, params = _setup(seed=9)
    k = 4
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    inputs = prepare_composed_inputs(graph, feats, k, halo=True)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
    )
    rng = jax.random.PRNGKey(31)
    arrays = tuple(
        jnp.asarray(a) for a in (
            inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
            inputs.edge_mask, inputs.char_ids, inputs.lengths,
        )
    )
    new_params, _, loss = step(
        params, opt_state, *arrays, rng,
        src_halo=jnp.asarray(inputs.src_halo),
        send_idx=jnp.asarray(inputs.send_idx),
    )

    # Oracle: same rng split/fold discipline as the step's shard body.
    neg_rng, _ = jax.random.split(rng)
    cap = inputs.src.shape[0] // k
    shifts = [
        int(jax.random.randint(
            jax.random.fold_in(neg_rng, j), (), 1, max(cap, 2)
        ))
        for j in range(k)
    ]

    def ref_loss(p):
        embs = apply_hypergnn(config, p, *arrays)
        num = 0.0
        for j in range(k):
            sl = slice(j * cap, (j + 1) * cap)
            head = embs[arrays[1][sl]]
            tail = embs[arrays[2][sl]]
            neg_tail = jnp.roll(tail, -shifts[j], axis=0)
            pos = jnp.sum(head * tail, axis=-1)
            neg = jnp.sum(head * neg_tail, axis=-1)
            num = num + jnp.sum(
                jnp.maximum(1.0 - pos + neg, 0.0) * arrays[4][sl]
            )
        return num / jnp.maximum(jnp.sum(arrays[4]), 1.0)

    l_ref, grads = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(l_ref), atol=1e-5)
    updates, _ = optimizer.update(grads, opt_state, params)
    ref_params = optax.apply_updates(params, updates)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_params),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.slow
def test_composed_agg_sorted_matches_unsorted():
    """agg_sorted=True (host-precomputed per-shard sort-free aggregation:
    bijective permute + sorted-hint reduction + static degree counts) ==
    the unsorted-scatter step, in both dense and halo/local_roll modes."""
    graph, feats, config, params = _setup(seed=13)
    k = 4
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    optimizer = optax.adam(1e-2)
    rng = jax.random.PRNGKey(41)

    for halo in (False, True):
        inputs = prepare_composed_inputs(graph, feats, k, halo=halo)
        assert inputs.agg_plan is not None
        # The plan must describe the stored layout exactly.
        cap = inputs.src.shape[0] // k
        for j in range(k):
            sl = slice(j * cap, (j + 1) * cap)
            ldst = inputs.dst[sl] - j * inputs.nodes_per_shard
            np.testing.assert_array_equal(
                ldst[inputs.agg_dst_perm[sl]], inputs.agg_dst_sorted[sl]
            )
        arrays = tuple(
            jnp.asarray(a) for a in (
                inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
                inputs.edge_mask, inputs.char_ids, inputs.lengths,
            )
        )
        kwargs = {}
        hw = None
        if halo:
            hw = inputs.halo_width
            kwargs = dict(
                src_halo=jnp.asarray(inputs.src_halo),
                send_idx=jnp.asarray(inputs.send_idx),
            )

        def run(agg_sorted):
            step = make_composed_train_step(
                mesh, config, optimizer, inputs.nodes_per_shard,
                num_nodes=inputs.num_nodes, halo_width=hw,
                agg_sorted=agg_sorted,
            )
            kw = dict(kwargs)
            if agg_sorted:
                kw["agg_plan"] = tuple(
                    jnp.asarray(a) for a in inputs.agg_plan
                )
            return step(params, optimizer.init(params), *arrays, rng, **kw)

        p_ref, _, l_ref = run(False)
        p_srt, _, l_srt = run(True)
        np.testing.assert_allclose(float(l_srt), float(l_ref), atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_srt), jax.tree_util.tree_leaves(p_ref)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.slow
def test_composed_grouped_contrib_matches_oracle():
    """contrib='grouped' (per-device ragged_dot over the shard's
    rel-sorted slice — O(E/k · d²) per device instead of the dense
    O(npp·2U·d²) relation product) computes the identical loss and
    post-Adam params as the single-device oracle."""
    graph, feats, config, params = _setup(seed=12)
    k = 4
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    inputs = prepare_composed_inputs(
        graph, feats, k, halo=True, rel_sort_local=True
    )
    assert inputs.rel_group_sizes is not None
    cap = inputs.src.shape[0] // k
    for j in range(k):
        sl = slice(j * cap, (j + 1) * cap)
        assert (np.diff(inputs.rel_ids[sl]) >= 0).all()
        assert inputs.rel_group_sizes[j].sum() == cap
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
        contrib="grouped",
    )
    rng = jax.random.PRNGKey(41)
    arrays = tuple(
        jnp.asarray(a) for a in (
            inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
            inputs.edge_mask, inputs.char_ids, inputs.lengths,
        )
    )
    new_params, _, loss = step(
        params, opt_state, *arrays, rng,
        src_halo=jnp.asarray(inputs.src_halo),
        send_idx=jnp.asarray(inputs.send_idx),
        rel_group_sizes=jnp.asarray(inputs.rel_group_sizes),
    )

    neg_rng, _ = jax.random.split(rng)
    shifts = [
        int(jax.random.randint(
            jax.random.fold_in(neg_rng, j), (), 1, max(cap, 2)
        ))
        for j in range(k)
    ]

    def ref_loss(p):
        embs = apply_hypergnn(config, p, *arrays)
        num = 0.0
        for j in range(k):
            sl = slice(j * cap, (j + 1) * cap)
            head = embs[arrays[1][sl]]
            tail = embs[arrays[2][sl]]
            neg_tail = jnp.roll(tail, -shifts[j], axis=0)
            pos = jnp.sum(head * tail, axis=-1)
            neg = jnp.sum(head * neg_tail, axis=-1)
            num = num + jnp.sum(
                jnp.maximum(1.0 - pos + neg, 0.0) * arrays[4][sl]
            )
        return num / jnp.maximum(jnp.sum(arrays[4]), 1.0)

    l_ref, grads = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(l_ref), atol=1e-5)
    updates, _ = optimizer.update(grads, opt_state, params)
    ref_params = optax.apply_updates(params, updates)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_params),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.slow
def test_halo_step_per_device_flops_shrink_with_mesh():
    """Scaling-regression guard: the halo step's per-device compiled FLOPs
    must shrink with mesh size (no replicated compute growth), while the
    dense v1's replicated relation product keeps per-device FLOPs ~flat.
    Guards against silently reintroducing the round-2 regression where the
    benchmarked step all_gathered full h and scaled at 0.185 efficiency."""
    # Clustered graph so the halo boundary is small relative to npp (at
    # tiny npp the minimum all_to_all padding B=8 dominates artificially).
    rng = np.random.default_rng(12)
    n, e, u, f = 2048, 8192, 6, 8
    comm = 8
    csize = n // comm
    c = rng.integers(0, comm, e)
    src = c * csize + rng.integers(0, csize, e)
    dst = c * csize + rng.integers(0, csize, e)
    ei = np.stack([src, dst])
    texts = [f"relation kind {i}" for i in range(u)]
    etexts = [texts[i] for i in rng.integers(0, u, e)]
    graph = encode_graph(ei, etexts, n)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    config = HyperGNNConfig(
        text_dim=16, node_feat_dim=f, hidden_dim=16, num_layers=2
    )
    params = init_hypergnn(config, jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)

    def per_device_flops(k, halo):
        mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
        inputs = prepare_composed_inputs(graph, feats, k, halo=halo)
        step = make_composed_train_step(
            mesh, config, optimizer, inputs.nodes_per_shard,
            num_nodes=inputs.num_nodes,
            halo_width=inputs.halo_width if halo else None,
        )
        arrays = tuple(
            jnp.asarray(a) for a in (
                inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
                inputs.edge_mask, inputs.char_ids, inputs.lengths,
            )
        )
        kwargs = {}
        if halo:
            kwargs = dict(
                src_halo=jnp.asarray(inputs.src_halo),
                send_idx=jnp.asarray(inputs.send_idx),
            )
        opt_state = optimizer.init(params)
        compiled = step.lower(
            params, opt_state, *arrays, jax.random.PRNGKey(1), **kwargs
        ).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])

    base = per_device_flops(1, halo=False)
    halo4 = per_device_flops(4, halo=True)
    dense4 = per_device_flops(4, halo=False)
    # Work division: ≥80% parallel efficiency at 4 devices in compiled
    # per-device FLOPs (the structural metric wall-clock follows on real
    # multi-chip hardware; this host has too few cores to time it).
    assert halo4 <= base / (4 * 0.8), (
        f"halo per-device flops {halo4:.3e} vs 1-dev {base:.3e}: "
        f"efficiency {base / (4 * halo4):.2f} < 0.8"
    )
    # And the contrast that caused round 2's 0.185 efficiency: dense v1
    # replicates the relation product, so its per-device FLOPs stay high.
    assert dense4 > halo4 * 1.5
    graph, feats, config, params = _setup(seed=8)
    k = 8
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    inputs = prepare_composed_inputs(graph, feats, k, halo=True)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
    )
    arrays = tuple(
        jnp.asarray(a) for a in (
            inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
            inputs.edge_mask, inputs.char_ids, inputs.lengths,
        )
    )
    src_halo = jnp.asarray(inputs.src_halo)
    send_idx = jnp.asarray(inputs.send_idx)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(10):
        rng, sr = jax.random.split(rng)
        params, opt_state, loss = step(
            params, opt_state, *arrays, sr, src_halo=src_halo,
            send_idx=send_idx,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] <= losses[0]


def test_composed_scheduled_halo_matches_dense_pairs():
    """The pod-scale scheduled-ppermute exchange inside the composed step
    == the [k,k,B] all_to_all halo step exactly (same partitioned layout,
    same rng -> identical negatives): only the exchange layout differs."""
    graph, feats, config, params = _setup(seed=17)
    k = 4
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    dense_in = prepare_composed_inputs(graph, feats, k, halo=True)
    sched_in = prepare_composed_inputs(graph, feats, k, halo=True,
                                       scheduled=True)
    np.testing.assert_array_equal(dense_in.dst, sched_in.dst)
    np.testing.assert_array_equal(dense_in.src, sched_in.src)
    assert sched_in.sched_send_tables is not None

    optimizer = optax.adam(1e-2)
    rng = jax.random.PRNGKey(33)

    def run(inputs, scheduled):
        kwargs = {}
        if scheduled:
            step = make_composed_train_step(
                mesh, config, optimizer, inputs.nodes_per_shard,
                num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
                scheduled_rounds=inputs.sched_round_perms,
            )
            kwargs = dict(
                src_halo=jnp.asarray(inputs.src_halo),
                send_idx=tuple(
                    jnp.asarray(t) for t in inputs.sched_send_tables
                ),
            )
        else:
            step = make_composed_train_step(
                mesh, config, optimizer, inputs.nodes_per_shard,
                num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
            )
            kwargs = dict(
                src_halo=jnp.asarray(inputs.src_halo),
                send_idx=jnp.asarray(inputs.send_idx),
            )
        arrays = tuple(
            jnp.asarray(a) for a in (
                inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
                inputs.edge_mask, inputs.char_ids, inputs.lengths,
            )
        )
        return step(params, optimizer.init(params), *arrays, rng, **kwargs)

    p_d, _, l_d = run(dense_in, False)
    p_s, _, l_s = run(sched_in, True)
    np.testing.assert_allclose(float(l_s), float(l_d), atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_d), jax.tree_util.tree_leaves(p_s)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


@pytest.mark.slow
def test_composed_scheduled_grouped_agg_sorted_matches_dense_pairs():
    """The full pod production combo — scheduled-ppermute exchange +
    relation-grouped contributions + sort-free aggregation — matches the
    plain halo step on the same layout (same rng -> identical negatives)."""
    graph, feats, config, params = _setup(seed=19)
    k = 4
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    base_in = prepare_composed_inputs(graph, feats, k, halo=True,
                                      rel_sort_local=True)
    pod_in = prepare_composed_inputs(graph, feats, k, halo=True,
                                     scheduled=True, rel_sort_local=True)
    np.testing.assert_array_equal(base_in.dst, pod_in.dst)
    optimizer = optax.adam(1e-2)
    rng = jax.random.PRNGKey(41)
    arrays = lambda i: tuple(
        jnp.asarray(a) for a in (
            i.feats, i.src, i.dst, i.rel_ids, i.edge_mask, i.char_ids,
            i.lengths,
        )
    )

    base_step = make_composed_train_step(
        mesh, config, optimizer, base_in.nodes_per_shard,
        num_nodes=base_in.num_nodes, halo_width=base_in.halo_width,
        contrib="grouped",
    )
    p_b, _, l_b = base_step(
        params, optimizer.init(params), *arrays(base_in), rng,
        src_halo=jnp.asarray(base_in.src_halo),
        send_idx=jnp.asarray(base_in.send_idx),
        rel_group_sizes=jnp.asarray(base_in.rel_group_sizes),
    )

    pod_step = make_composed_train_step(
        mesh, config, optimizer, pod_in.nodes_per_shard,
        num_nodes=pod_in.num_nodes, halo_width=pod_in.halo_width,
        contrib="grouped", agg_sorted=True,
        scheduled_rounds=pod_in.sched_round_perms,
    )
    p_p, _, l_p = pod_step(
        params, optimizer.init(params), *arrays(pod_in), rng,
        src_halo=jnp.asarray(pod_in.src_halo),
        send_idx=tuple(jnp.asarray(t) for t in pod_in.sched_send_tables),
        rel_group_sizes=jnp.asarray(pod_in.rel_group_sizes),
        agg_plan=tuple(jnp.asarray(a) for a in pod_in.agg_plan),
    )
    np.testing.assert_allclose(float(l_p), float(l_b), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_b), jax.tree_util.tree_leaves(p_p)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def _run_kernel_contrib_case(hidden, contrib, k=4, scheduled=False):
    """Shared driver: group-padded prepare + kernel contrib vs the grouped
    oracle on the SAME inputs (identical layout → identical negatives)."""
    graph, feats, config, params = _setup(
        seed=21, n=40, e=400, u=5, f=8, hidden=hidden
    )
    mesh = make_mesh((k,), ("edge",), devices=jax.devices()[:k])
    inputs = prepare_composed_inputs(
        graph, feats, k, halo=True, rel_sort_local=True, group_pad=256,
        scheduled=scheduled,
    )
    assert inputs.kernel_plan is not None
    cap = inputs.src.shape[0] // k
    assert cap % 256 == 0
    for j in range(k):
        sl = slice(j * cap, (j + 1) * cap)
        rel = inputs.rel_ids[sl]
        assert (np.diff(rel) >= 0).all()
        # Single-relation 256-row tiles (the Pallas layout contract).
        assert (rel.reshape(-1, 256) == rel.reshape(-1, 256)[:, :1]).all()
        assert inputs.kernel_rel_counts[j].sum() == cap
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    common = dict(
        num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
        agg_sorted=True,
    )
    if scheduled:
        common["scheduled_rounds"] = inputs.sched_round_perms
    arrays = tuple(
        jnp.asarray(a) for a in (
            inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
            inputs.edge_mask, inputs.char_ids, inputs.lengths,
        )
    )
    send = (
        tuple(jnp.asarray(t) for t in inputs.sched_send_tables)
        if scheduled else jnp.asarray(inputs.send_idx)
    )
    kw = dict(
        src_halo=jnp.asarray(inputs.src_halo),
        send_idx=send,
        rel_group_sizes=jnp.asarray(inputs.rel_group_sizes),
        agg_plan=tuple(jnp.asarray(a) for a in inputs.agg_plan),
    )
    rng = jax.random.PRNGKey(7)

    step_kernel = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        contrib=contrib, **common,
    )
    p_kernel, _, loss_kernel = step_kernel(
        params, opt_state, *arrays, rng,
        kernel_plan=tuple(jnp.asarray(a) for a in inputs.kernel_plan),
        **kw,
    )
    step_ref = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        contrib="grouped", **common,
    )
    p_ref, _, loss_ref = step_ref(params, opt_state, *arrays, rng, **kw)
    np.testing.assert_allclose(
        float(loss_kernel), float(loss_ref), atol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_kernel),
        jax.tree_util.tree_leaves(p_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        )


def test_composed_pallas_packed_contrib_matches_grouped():
    """contrib='pallas_packed' (pair-packed d=64 streaming kernel + CSR
    reductions, reconstructed per shard from the kernel SortPlan stacks)
    == the grouped oracle on identical group-padded inputs."""
    _run_kernel_contrib_case(64, "pallas_packed")


@pytest.mark.slow
def test_composed_pallas_contrib_matches_grouped_d128():
    """contrib='pallas' (combined-output streaming kernel at d=128)."""
    _run_kernel_contrib_case(128, "pallas")


@pytest.mark.slow
def test_composed_pallas_packed_scheduled_halo_matches_grouped():
    """Production pod combo: scheduled-ppermute exchange + pair-packed
    kernel contrib + sort-free aggregation == grouped on the same
    scheduled inputs."""
    _run_kernel_contrib_case(64, "pallas_packed", scheduled=True)
