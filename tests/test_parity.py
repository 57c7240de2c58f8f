"""Numerical parity vs the PyTorch reference (the correctness gate).

Transplants reference weights into the JAX pytree and asserts per-layer
allclose on multiple graphs and backends — the north-star correctness gate
from BASELINE.json ("bitwise-verified HyperGNN layers matching reference
allclose").
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from parity_utils import (  # noqa: E402
    REFERENCE_PATH,
    convert_hypergnn,
    convert_text_encoder,
    convert_weight_generator,
    load_reference,
    reference_per_layer_outputs,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_PATH), reason="reference repo not mounted"
)

ATOL = 3e-5
RTOL = 1e-4


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _random_graph(rng, n, e, texts):
    edge_index = np.stack(
        [rng.integers(0, n, size=e), rng.integers(0, n, size=e)]
    ).astype(np.int64)
    edge_texts = [texts[i] for i in rng.integers(0, len(texts), size=e)]
    feats = rng.standard_normal((n, 16)).astype(np.float32)
    return feats, edge_index, edge_texts


class TestTextEncoderParity:
    def test_encode_matches(self, ref):
        from graph_hypernetwork_forge_tpu.models.text_encoder import (
            TextEncoder,
            tokenize_texts,
        )
        from graph_hypernetwork_forge_tpu.models.text_encoder import (
            apply_text_encoder,
        )
        import jax.numpy as jnp

        torch.manual_seed(11)
        t_enc = ref.models.hypergnn.TextEncoder(text_dim=32, char_emb_dim=16)
        params = convert_text_encoder(t_enc)

        texts = ["knows", "", "works at", "is parent of", "a", "résumé 中文"]
        with torch.no_grad():
            want = t_enc(texts, torch.device("cpu")).numpy()

        ids, lens = tokenize_texts(texts)
        got = np.asarray(
            apply_text_encoder(params, jnp.asarray(ids), jnp.asarray(lens))
        )
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


class TestWeightGeneratorParity:
    @pytest.mark.parametrize("batched", [False, True])
    def test_outputs_match(self, ref, batched):
        from graph_hypernetwork_forge_tpu.models.weight_generator import (
            WeightGeneratorConfig,
            apply_weight_generator,
        )
        import jax.numpy as jnp

        torch.manual_seed(5)
        t_gen = ref.WeightGenerator(
            text_dim=32, d_in=16, d_out=24, hidden_dim=64, num_hidden=2
        )
        t_gen.eval()
        params = convert_weight_generator(t_gen)
        cfg = WeightGeneratorConfig(
            text_dim=32, d_in=16, d_out=24, hidden_dim=64, num_hidden=2
        )

        shape = (3, 32) if batched else (32,)
        emb = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        with torch.no_grad():
            want = t_gen(torch.from_numpy(emb))
        got = apply_weight_generator(cfg, params, jnp.asarray(emb))
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), want[k].numpy(), atol=ATOL, rtol=RTOL
            )

    def test_num_hidden_zero(self, ref):
        from graph_hypernetwork_forge_tpu.models.weight_generator import (
            WeightGeneratorConfig,
            apply_weight_generator,
        )
        import jax.numpy as jnp

        torch.manual_seed(6)
        t_gen = ref.WeightGenerator(
            text_dim=16, d_in=8, d_out=8, hidden_dim=32, num_hidden=0
        )
        t_gen.eval()
        params = convert_weight_generator(t_gen)
        cfg = WeightGeneratorConfig(
            text_dim=16, d_in=8, d_out=8, hidden_dim=32, num_hidden=0
        )
        emb = np.random.default_rng(1).standard_normal((4, 16)).astype(np.float32)
        with torch.no_grad():
            want = t_gen(torch.from_numpy(emb))
        got = apply_weight_generator(cfg, params, jnp.asarray(emb))
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), want[k].numpy(), atol=ATOL, rtol=RTOL
            )


class TestHyperGNNParity:
    @pytest.mark.parametrize("backend", ["dense", "gather"])
    def test_toy_kg_per_layer(self, ref, backend):
        """Per-layer allclose on the toy KG — the primary parity gate."""
        import jax.numpy as jnp

        from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
        from graph_hypernetwork_forge_tpu.models.hypergnn import (
            HyperGNNConfig,
            apply_hypergnn,
        )

        torch.manual_seed(21)
        t_model = ref.HyperGNN(
            text_dim=64, node_feat_dim=16, hidden_dim=32, num_layers=3
        )
        t_kg = ref.ToyKnowledgeGraph(feat_dim=16)
        want_layers, want_final = reference_per_layer_outputs(
            t_model, t_kg.node_features, t_kg.edge_index, t_kg.edge_texts
        )

        cfg = HyperGNNConfig(
            text_dim=64,
            node_feat_dim=16,
            hidden_dim=32,
            num_layers=3,
            backend=backend,
        )
        params = convert_hypergnn(t_model)
        graph = encode_graph(
            t_kg.edge_index.numpy(), t_kg.edge_texts, t_kg.num_nodes
        )
        got_layers = apply_hypergnn(
            cfg,
            params,
            jnp.asarray(t_kg.node_features.numpy()),
            *(jnp.asarray(a) for a in graph.arrays),
            return_all_layers=True,
        )
        assert len(got_layers) == len(want_layers) == 3
        for i, (got, want) in enumerate(zip(got_layers, want_layers)):
            np.testing.assert_allclose(
                np.asarray(got),
                want,
                atol=ATOL,
                rtol=RTOL,
                err_msg=f"layer {i} mismatch ({backend})",
            )
        np.testing.assert_allclose(
            np.asarray(got_layers[-1]), want_final, atol=ATOL, rtol=RTOL
        )

    def test_random_graph_with_isolated_nodes(self, ref):
        """Parity on a graph where several nodes have no incoming edges —
        pins the cnt-clamp / isolated-node-zero quirk
        (reference models/hypergnn.py:207-226)."""
        import jax.numpy as jnp

        from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
        from graph_hypernetwork_forge_tpu.models.hypergnn import (
            HyperGNNConfig,
            apply_hypergnn,
        )

        torch.manual_seed(33)
        t_model = ref.HyperGNN(
            text_dim=32, node_feat_dim=16, hidden_dim=16, num_layers=2
        )
        rng = np.random.default_rng(9)
        n, e = 30, 40
        feats = rng.standard_normal((n, 16)).astype(np.float32)
        # All edges target nodes < 15, so nodes 15..29 are isolated.
        edge_index = np.stack(
            [rng.integers(0, n, size=e), rng.integers(0, 15, size=e)]
        ).astype(np.int64)
        texts = ["alpha rel", "beta rel", "gamma relation", "delta"]
        edge_texts = [texts[i] for i in rng.integers(0, 4, size=e)]

        t_model.eval()
        with torch.no_grad():
            want = t_model(
                torch.from_numpy(feats), torch.from_numpy(edge_index), edge_texts
            ).numpy()

        cfg = HyperGNNConfig(text_dim=32, node_feat_dim=16, hidden_dim=16, num_layers=2)
        params = convert_hypergnn(t_model)
        graph = encode_graph(edge_index, edge_texts, n)
        got = np.asarray(
            apply_hypergnn(
                cfg,
                params,
                jnp.asarray(feats),
                *(jnp.asarray(a) for a in graph.arrays),
            )
        )
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)

    def test_toy_kg_features_bitwise(self, ref):
        """Seed-42 node features must match the reference bitwise."""
        from graph_hypernetwork_forge_tpu import ToyKnowledgeGraph

        t_kg = ref.ToyKnowledgeGraph(feat_dim=16)
        j_kg = ToyKnowledgeGraph(feat_dim=16)
        np.testing.assert_array_equal(
            j_kg.node_features, t_kg.node_features.numpy()
        )
        np.testing.assert_array_equal(j_kg.edge_index, t_kg.edge_index.numpy())
        assert j_kg.edge_texts == t_kg.edge_texts
