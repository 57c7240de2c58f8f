"""Relation sharding + node-partitioned aggregation: exactness tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hypernetwork_forge_tpu.models.text_encoder import (
    TextEncoderConfig,
    apply_text_encoder,
    init_text_encoder,
    tokenize_texts,
)
from graph_hypernetwork_forge_tpu.models.weight_generator import (
    WeightGeneratorConfig,
    apply_weight_generator,
    init_weight_generator,
)
from graph_hypernetwork_forge_tpu.ops.message_passing import (
    relational_message_passing,
)
from graph_hypernetwork_forge_tpu.parallel import (
    make_mesh,
    node_partitioned_message_passing,
    partition_edges_by_dst,
    relation_sharded_generate,
)

needs_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@needs_multidevice
class TestRelationSharding:
    def test_generated_banks_match_single_device(self):
        te_cfg = TextEncoderConfig(text_dim=16, char_emb_dim=8)
        wg_cfg = WeightGeneratorConfig(
            text_dim=16, d_in=8, d_out=8, hidden_dim=32
        )
        key = jax.random.PRNGKey(0)
        te_params = init_text_encoder(te_cfg, key)
        wg_params = init_weight_generator(wg_cfg, jax.random.PRNGKey(1))

        texts = [f"relation number {i}" for i in range(16)]  # U=16, 8 devices
        char_ids, lengths = tokenize_texts(texts)
        char_ids, lengths = jnp.asarray(char_ids), jnp.asarray(lengths)

        embs = apply_text_encoder(te_params, char_ids, lengths)
        want = apply_weight_generator(wg_cfg, wg_params, embs)

        mesh = make_mesh((8,), ("model",))
        got = relation_sharded_generate(
            mesh, wg_cfg, te_params, wg_params, char_ids, lengths, axis="model"
        )
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), atol=1e-6, rtol=1e-6
            )


@needs_multidevice
class TestNodePartition:
    def test_matches_single_device(self):
        rng = np.random.default_rng(0)
        n, e, u, d = 30, 120, 5, 8
        n_shards = 8
        h = rng.standard_normal((n, d)).astype(np.float32)
        src = rng.integers(0, n, size=e).astype(np.int32)
        dst = rng.integers(0, n, size=e).astype(np.int32)
        rel = rng.integers(0, u, size=e).astype(np.int32)
        mask = np.ones(e, dtype=np.float32)
        w_msg = 0.1 * rng.standard_normal((u, d, d)).astype(np.float32)
        w_self = 0.1 * rng.standard_normal((u, d, d)).astype(np.float32)
        bias = 0.1 * rng.standard_normal((u, d)).astype(np.float32)

        want = relational_message_passing(
            jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
            jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
            backend="dense",
        )

        p_src, p_dst, p_rel, p_mask, npp = partition_edges_by_dst(
            src, dst, rel, mask, n, n_shards
        )
        n_pad = npp * n_shards
        h_pad = np.zeros((n_pad, d), dtype=np.float32)
        h_pad[:n] = h

        mesh = make_mesh((8,), ("edge",))
        got = node_partitioned_message_passing(
            mesh,
            jnp.asarray(h_pad),
            jnp.asarray(p_src),
            jnp.asarray(p_dst),
            jnp.asarray(p_rel),
            jnp.asarray(w_msg),
            jnp.asarray(w_self),
            jnp.asarray(bias),
            jnp.asarray(p_mask),
            npp,
        )
        np.testing.assert_allclose(
            np.asarray(got)[:n], np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_partition_covers_all_edges(self):
        rng = np.random.default_rng(1)
        n, e = 50, 200
        src = rng.integers(0, n, size=e).astype(np.int64)
        dst = rng.integers(0, n, size=e).astype(np.int64)
        rel = rng.integers(0, 4, size=e).astype(np.int32)
        mask = np.ones(e, dtype=np.float32)
        p_src, p_dst, p_rel, p_mask, npp = partition_edges_by_dst(
            src, dst, rel, mask, n, 4
        )
        assert p_mask.sum() == e
        # Every real edge lands in its owner's slice.
        cap = len(p_dst) // 4
        for s in range(4):
            seg_mask = p_mask[s * cap : (s + 1) * cap] > 0
            seg_dst = p_dst[s * cap : (s + 1) * cap][seg_mask]
            assert ((seg_dst // npp) == s).all() or (
                (np.minimum(seg_dst // npp, 3)) == s
            ).all()
