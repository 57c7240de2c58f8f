"""Multi-device sharding tests on a virtual 8-device CPU mesh.

Exactness gate: sharded execution must match single-device execution
(two-phase mean aggregation preserves reference semantics across shards).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hypernetwork_forge_tpu.parallel import (
    edge_partitioned_message_passing,
    make_mesh,
    shard_graph_arrays,
    shard_params,
)
from graph_hypernetwork_forge_tpu.ops.message_passing import (
    relational_message_passing,
)

needs_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def make_case(seed=0, n=16, e=64, u=4, d=8):
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n, d)).astype(np.float32)
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    rel = rng.integers(0, u, size=e).astype(np.int32)
    w_msg = 0.1 * rng.standard_normal((u, d, d)).astype(np.float32)
    w_self = 0.1 * rng.standard_normal((u, d, d)).astype(np.float32)
    bias = 0.1 * rng.standard_normal((u, d)).astype(np.float32)
    return h, src, dst, rel, w_msg, w_self, bias


@needs_multidevice
class TestEdgePartitionedMessagePassing:
    def test_matches_single_device(self):
        case = [jnp.asarray(x) for x in make_case()]
        h, src, dst, rel, w_msg, w_self, bias = case
        want = relational_message_passing(
            h, src, dst, rel, w_msg, w_self, bias, backend="dense"
        )
        mesh = make_mesh((8,), ("edge",))
        got = edge_partitioned_message_passing(
            mesh, h, src, dst, rel, w_msg, w_self, bias
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_masked_matches_single_device(self):
        case = [jnp.asarray(x) for x in make_case(seed=1)]
        h, src, dst, rel, w_msg, w_self, bias = case
        mask = jnp.asarray(
            (np.arange(64) < 40).astype(np.float32)
        )  # last 24 edges are padding
        want = relational_message_passing(
            h, src, dst, rel, w_msg, w_self, bias, edge_mask=mask, backend="dense"
        )
        mesh = make_mesh((8,), ("edge",))
        got = edge_partitioned_message_passing(
            mesh, h, src, dst, rel, w_msg, w_self, bias, edge_mask=mask
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )


@needs_multidevice
class TestShardedTrainStep:
    def test_sharded_step_matches_replicated(self):
        """One GSPMD-sharded train step == one single-device step (same rng)."""
        import optax

        from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
        from graph_hypernetwork_forge_tpu.models.hypergnn import (
            HyperGNNConfig,
            init_hypergnn,
        )
        from graph_hypernetwork_forge_tpu.parallel.sharding import replicate
        from graph_hypernetwork_forge_tpu.training.train import make_train_step

        config = HyperGNNConfig(
            text_dim=16, node_feat_dim=8, hidden_dim=16, num_layers=2
        )
        # Two independent copies: the train step donates its params buffers.
        params0 = jax.tree_util.tree_map(
            np.asarray, init_hypergnn(config, jax.random.PRNGKey(0))
        )

        rng = np.random.default_rng(0)
        n, e, u = 24, 64, 5
        feats = rng.standard_normal((n, 8)).astype(np.float32)
        edge_index = np.stack(
            [rng.integers(0, n, size=e), rng.integers(0, n, size=e)]
        ).astype(np.int64)
        texts = [f"rel {i}" for i in range(u)]
        edge_texts = [texts[i] for i in rng.integers(0, u, size=e)]
        graph = encode_graph(edge_index, edge_texts, n)

        optimizer = optax.adam(1e-3)
        step_rng = jax.random.PRNGKey(7)

        # Single-device run.
        step_fn = make_train_step(config, optimizer)
        p1, _, loss1 = step_fn(
            jax.tree_util.tree_map(jnp.array, params0),
            optimizer.init(jax.tree_util.tree_map(jnp.array, params0)),
            jnp.asarray(feats),
            *(jnp.asarray(a) for a in graph.arrays),
            step_rng,
        )

        # Sharded run: edges over 4 devices, model TP over 2.
        mesh = make_mesh((4, 2), ("edge", "model"))
        sharded_params = shard_params(params0, config, mesh)
        sharded_opt = replicate(optimizer.init(params0), mesh)
        arrays = shard_graph_arrays(graph.arrays, mesh)
        feats_r = jax.device_put(
            feats, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
        step_fn2 = make_train_step(config, optimizer)
        with mesh:
            p2, _, loss2 = step_fn2(
                sharded_params, sharded_opt, feats_r, *arrays, step_rng
            )

        assert np.isfinite(float(loss2))
        np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5, rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
            )


@needs_multidevice
@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@needs_multidevice
class TestTensorParallelGenerator:
    """Megatron-split generator heads + d_in-sharded banks
    (parallel/tensor_parallel.py): exactness vs the replicated generator
    AND a real per-device memory division at a d where the [U, d, d]
    banks matter."""

    def _setup(self, k=4, u=16, d=64, text_dim=32, hidden=64):
        from graph_hypernetwork_forge_tpu.models.weight_generator import (
            WeightGeneratorConfig,
            init_weight_generator,
        )

        rng = np.random.default_rng(0)
        config = WeightGeneratorConfig(
            text_dim=text_dim, d_in=d, d_out=d, hidden_dim=hidden,
            num_hidden=2,
        )
        params = init_weight_generator(config, jax.random.PRNGKey(1))
        text = jnp.asarray(
            rng.standard_normal((u, text_dim)).astype(np.float32)
        )
        mesh = make_mesh((k,), ("model",), devices=jax.devices()[:k])
        return config, params, text, mesh

    def test_matches_replicated_generator(self):
        from graph_hypernetwork_forge_tpu.models.weight_generator import (
            apply_weight_generator,
        )
        from graph_hypernetwork_forge_tpu.parallel.tensor_parallel import (
            shard_generator_params,
            tp_generate_weights,
        )

        config, params, text, mesh = self._setup()
        sharded = shard_generator_params(params, config, mesh)
        got = tp_generate_weights(mesh, config, sharded, text)
        want = apply_weight_generator(config, params, text)
        for name in ("W_msg", "W_self", "bias"):
            np.testing.assert_allclose(
                np.asarray(got[name]), np.asarray(want[name]),
                atol=2e-5, rtol=1e-5,
            )

    def test_bank_and_param_bytes_divide(self):
        """The [U, d, d] banks and the big head layers exist only as 1/k
        shards per device."""
        from graph_hypernetwork_forge_tpu.parallel.tensor_parallel import (
            bank_shard_bytes,
            shard_generator_params,
            tp_generate_weights,
        )

        k = 4
        config, params, text, mesh = self._setup(k=k, u=32, d=128)
        sharded = shard_generator_params(params, config, mesh)
        got = tp_generate_weights(mesh, config, sharded, text)
        u = text.shape[0]
        full_banks = 2 * u * config.d_in * config.d_out * 4
        assert bank_shard_bytes(got) * k == full_banks
        # Final head Linear [hidden, d*d] — the parameter that dominates at
        # large d — holds only 1/k per device.
        w3 = sharded["heads"]["W_msg"][-1]["w"]
        assert w3.addressable_shards[0].data.nbytes * k == w3.nbytes

    def test_tp_message_passing_matches_single_device(self):
        from graph_hypernetwork_forge_tpu.parallel.tensor_parallel import (
            shard_generator_params,
            tp_generate_weights,
            tp_message_passing,
        )
        from graph_hypernetwork_forge_tpu.models.weight_generator import (
            apply_weight_generator,
        )

        config, params, text, mesh = self._setup(k=4, u=6, d=32)
        rng = np.random.default_rng(3)
        n, e = 24, 96
        h = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
        src = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
        dst = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
        rel = jnp.asarray(rng.integers(0, 6, e).astype(np.int32))

        sharded = shard_generator_params(params, config, mesh)
        w_tp = tp_generate_weights(mesh, config, sharded, text)
        got = tp_message_passing(mesh, h, src, dst, rel, w_tp, n)

        w = apply_weight_generator(config, params, text)
        want = relational_message_passing(
            h, src, dst, rel, w["W_msg"], w["W_self"], w["bias"],
            num_nodes=n, backend="gather",
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-5
        )
