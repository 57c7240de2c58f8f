"""TextEncoder: relation-type string → dense embedding.

Capability parity with reference ``models/hypergnn.py:39-81``: a char-level
bag-of-embeddings encoder — each character maps to an ASCII code clamped to
``< 128`` (empty string → the single code 0), looked up in a learnable
``[128, char_emb_dim]`` table, mean-pooled over characters, projected with a
Linear and squashed with tanh. Runs fully offline, no pretrained weights.

TPU-first redesign: the reference tokenizes and encodes with a *Python loop
per string* (``models/hypergnn.py:66-81``, a host-side hot loop). Here,
tokenization happens once on the host into a padded ``[U, L]`` int matrix +
lengths (see :func:`tokenize_texts`), and the encode is one fully vectorized
masked-mean + matmul under jit — no per-string work on device, no ragged
shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graph_hypernetwork_forge_tpu.utils.initializers import (
    embedding_params,
    linear_apply,
    linear_params,
)
from graph_hypernetwork_forge_tpu.utils.text import ASCII_VOCAB, tokenize_texts

__all__ = [
    "ASCII_VOCAB",
    "TextEncoder",
    "TextEncoderConfig",
    "apply_text_encoder",
    "init_text_encoder",
    "tokenize_texts",
]


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    text_dim: int
    char_emb_dim: int = 32
    vocab_size: int = ASCII_VOCAB


def init_text_encoder(config: TextEncoderConfig, key: jax.Array) -> dict:
    k_emb, k_proj = jax.random.split(key)
    return {
        "char_emb": embedding_params(k_emb, config.vocab_size, config.char_emb_dim),
        "proj": linear_params(k_proj, config.char_emb_dim, config.text_dim),
    }


def apply_text_encoder(
    params: dict, char_ids: jax.Array, lengths: jax.Array, precision="highest"
) -> jax.Array:
    """Vectorized encode: ``[U, L]`` char ids + ``[U]`` lengths → ``[U, text_dim]``.

    Masked mean over exactly the real characters matches the reference's
    ``emb.mean(dim=0)`` over the unpadded string (``models/hypergnn.py:76``).
    """
    from graph_hypernetwork_forge_tpu.utils.initializers import resolve_precision

    emb = params["char_emb"][char_ids]  # [U, L, C]
    max_len = char_ids.shape[-1]
    mask = (
        jnp.arange(max_len, dtype=jnp.int32)[None, :] < lengths[:, None]
    )  # [U, L]
    pooled = jnp.sum(emb * mask[..., None], axis=-2) / jnp.maximum(
        lengths, 1
    ).astype(emb.dtype)[:, None]
    return jnp.tanh(
        linear_apply(params["proj"], pooled, precision=resolve_precision(precision))
    )


@partial(jax.jit, static_argnames=())
def _encode_jit(params: dict, char_ids: jax.Array, lengths: jax.Array) -> jax.Array:
    return apply_text_encoder(params, char_ids, lengths)


class TextEncoder:
    """Stateful convenience wrapper mirroring the reference API surface.

    ``encode_one(text)`` → ``[text_dim]``; ``__call__(texts)`` →
    ``[len(texts), text_dim]`` (reference ``models/hypergnn.py:73-81``; the
    reference's ``device`` argument has no JAX analogue and is omitted).
    """

    def __init__(self, text_dim: int, char_emb_dim: int = 32, *, key=None) -> None:
        self.config = TextEncoderConfig(text_dim=text_dim, char_emb_dim=char_emb_dim)
        self.text_dim = text_dim
        if key is None:
            key = _fresh_key()
        self.params = init_text_encoder(self.config, key)

    def encode_one(self, text: str) -> jax.Array:
        return self([text])[0]

    def __call__(self, texts: Sequence[str]) -> jax.Array:
        char_ids, lengths = tokenize_texts(texts)
        return _encode_jit(self.params, jnp.asarray(char_ids), jnp.asarray(lengths))


_KEY_COUNTER = [0]


def _fresh_key() -> jax.Array:
    """Deterministic-but-distinct default init keys (mimics torch's fresh
    global-RNG init per module while staying reproducible per process)."""
    _KEY_COUNTER[0] += 1
    return jax.random.PRNGKey(_KEY_COUNTER[0])
