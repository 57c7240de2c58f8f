"""TextEncoder behavioral contract (mirrors reference
tests/test_hypergnn.py:40-64)."""

import jax.numpy as jnp
import numpy as np

from graph_hypernetwork_forge_tpu.models.text_encoder import (
    TextEncoder,
    tokenize_texts,
)


class TestTextEncoder:
    def test_single_string_shape(self):
        enc = TextEncoder(text_dim=32, char_emb_dim=16)
        out = enc.encode_one("hello world")
        assert out.shape == (32,)

    def test_batch_shape(self):
        enc = TextEncoder(text_dim=32, char_emb_dim=16)
        out = enc(["knows", "works at", "is parent of"])
        assert out.shape == (3, 32)

    def test_empty_string_safe(self):
        enc = TextEncoder(text_dim=32)
        out = enc.encode_one("")
        assert out.shape == (32,)
        assert not bool(jnp.isnan(out).any())

    def test_different_strings_different_outputs(self):
        enc = TextEncoder(text_dim=32)
        out1 = enc.encode_one("knows")
        out2 = enc.encode_one("located in")
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_output_bounded_by_tanh(self):
        enc = TextEncoder(text_dim=32)
        out = enc(["some relation", "another"])
        assert float(jnp.max(jnp.abs(out))) <= 1.0

    def test_padding_invariance(self):
        """Same text encodes identically regardless of batch padding length."""
        enc = TextEncoder(text_dim=16)
        alone = enc(["knows"])[0]
        with_long = enc(["knows", "a much longer relation string here"])[0]
        np.testing.assert_allclose(
            np.asarray(alone), np.asarray(with_long), atol=1e-6
        )

    def test_non_ascii_clamped(self):
        """Characters beyond ASCII are clamped to code 127, not crashing."""
        enc = TextEncoder(text_dim=16)
        out = enc.encode_one("résumé 中文")
        assert out.shape == (16,)
        assert not bool(jnp.isnan(out).any())


class TestTokenize:
    def test_tokenize_shapes(self):
        ids, lens = tokenize_texts(["ab", "defgh"])
        assert ids.shape[0] == 2
        assert ids.shape[1] % 8 == 0
        assert lens.tolist() == [2, 5]
        assert ids[0, :2].tolist() == [ord("a"), ord("b")]
        assert ids[0, 2] == 0  # padded

    def test_empty_string_tokenizes_to_zero(self):
        ids, lens = tokenize_texts([""])
        assert lens.tolist() == [1]
        assert ids[0, 0] == 0

    def test_clamp_to_127(self):
        ids, _ = tokenize_texts(["ÿ"])
        assert ids[0, 0] == 127
