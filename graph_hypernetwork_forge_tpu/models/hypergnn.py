"""HyperGNN: hypernetwork-conditioned GNN for zero-shot KG reasoning.

Capability parity with reference ``models/hypergnn.py:88-322``:

    relation texts ──TextEncoder──▶ [U, text_dim]
    [U, text_dim] ──WeightGenerator (one per layer)──▶ (W_msg, W_self, bias) [U, ·]
    per layer:  relation-conditioned message passing → +residual → ReLU
                → (dropout at train) → LayerNorm
    output: [N, hidden_dim] node embeddings; ``score_triple`` = dot product.

Exact semantics preserved (per-layer allclose gate, SURVEY.md §7.2.1):
- input projection + ReLU (reference ``:261``),
- order-preserving relation dedup, texts encoded once and shared across all
  layers (reference ``:264-270``),
- one WeightGenerator per layer with ``hidden_dim=max(64, text_dim*2)``,
  ``num_hidden=2`` (reference ``:139-149``), one LayerNorm per layer,
- mean aggregation with count clamped to >= 1, self-loop via per-node
  averaged ``W_self``, isolated nodes output exactly zero pre-residual
  (reference ``:207-230``; see ``ops/message_passing.py``),
- residual always applies (all layers are hidden→hidden, so the reference's
  shape check at ``:289-290`` is always true),
- dropout only when training and ``dropout > 0`` (reference ``:293-294``),
- ``ValueError`` on ``num_layers < 1`` (``:123-124``) and on edge/text count
  mismatch (``:252-256``),
- zero-shot is emergent: relation identity enters *only* through text —
  there is no per-relation learned table anywhere (reference ``:270,278``).

TPU-first: the jitted core consumes only fixed-shape arrays (see
``data/encoding.py``); weights live at relation granularity ``[U, d, d]``
and message passing runs as batched dense matmuls + segment means
(``ops/message_passing.py``) — the reference's per-edge ``[E, d, d]``
materialization is never created.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from graph_hypernetwork_forge_tpu.data.encoding import EncodedGraph, encode_graph
from graph_hypernetwork_forge_tpu.models.text_encoder import (
    TextEncoderConfig,
    _fresh_key,
    apply_text_encoder,
    init_text_encoder,
)
from graph_hypernetwork_forge_tpu.models.weight_generator import (
    WeightGeneratorConfig,
    apply_weight_generator,
    init_weight_generator,
)
from graph_hypernetwork_forge_tpu.ops.message_passing import (
    Backend,
    relational_message_passing,
)
from graph_hypernetwork_forge_tpu.utils.initializers import (
    layer_norm_apply,
    layer_norm_params,
    linear_apply,
    linear_params,
)


@dataclasses.dataclass(frozen=True)
class HyperGNNConfig:
    text_dim: int
    node_feat_dim: int
    hidden_dim: int
    num_layers: int = 2
    dropout: float = 0.0
    char_emb_dim: int = 32
    backend: Backend = "auto"
    precision: str = "highest"
    # Rematerialize each layer in backward (jax.checkpoint): trades FLOPs
    # for HBM on deep models — the TPU equivalent of activation checkpointing.
    remat: bool = False
    # Promise that edge arrays are stable-sorted by relation id
    # (``encode_graph(sort_by_relation=True)``); lets the grouped backend
    # skip two device sorts per layer. WRONG RESULTS if edges are unsorted.
    rel_sorted: bool = False
    # Promise that each relation group is additionally padded to the Pallas
    # tile multiple (``encode_graph(..., group_pad=GROUP_PAD)``); with
    # rel_sorted it lets ``backend="auto"`` pick the streaming Pallas kernel
    # at d % 128 == 0 on TPU (measured 1.4-1.7x over grouped at d=128,
    # f32-exact). WRONG RESULTS if the layout is not group-padded.
    group_padded: bool = False
    # "float32" (parity mode, default) or "bfloat16" (speed mode): the
    # message-passing activations and generated weight banks are stored and
    # moved in bf16 — halving the wire bytes of the gathers/streams/tails
    # that dominate these bandwidth-bound steps — while parameters, the
    # optimizer, LayerNorm/residual arithmetic, and every reduction
    # accumulation stay f32. Speed mode opts out of the f32 parity gate
    # (bf16 storage rounding is ~4e-3 relative).
    compute_dtype: str = "float32"

    def __post_init__(self):
        if self.num_layers < 1:
            raise ValueError("num_layers must be at least 1")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "compute_dtype must be 'float32' or 'bfloat16', got "
                f"{self.compute_dtype!r}"
            )

    @property
    def text_encoder(self) -> TextEncoderConfig:
        return TextEncoderConfig(
            text_dim=self.text_dim, char_emb_dim=self.char_emb_dim
        )

    @property
    def weight_generator(self) -> WeightGeneratorConfig:
        # Per-layer generator hyperparameters mirror reference
        # models/hypergnn.py:139-149.
        return WeightGeneratorConfig(
            text_dim=self.text_dim,
            d_in=self.hidden_dim,
            d_out=self.hidden_dim,
            hidden_dim=max(64, self.text_dim * 2),
            num_hidden=2,
            dropout=self.dropout,
            precision=self.precision,
        )


def init_hypergnn(config: HyperGNNConfig, key: jax.Array) -> dict:
    keys = jax.random.split(key, 2 + config.num_layers)
    return {
        "text_encoder": init_text_encoder(config.text_encoder, keys[0]),
        "input_proj": linear_params(keys[1], config.node_feat_dim, config.hidden_dim),
        "weight_generators": [
            init_weight_generator(config.weight_generator, keys[2 + i])
            for i in range(config.num_layers)
        ],
        "layer_norms": [
            layer_norm_params(config.hidden_dim) for _ in range(config.num_layers)
        ],
    }


def apply_hypergnn(
    config: HyperGNNConfig,
    params: dict,
    node_features: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    rel_ids: jax.Array,
    edge_mask: Optional[jax.Array],
    char_ids: jax.Array,
    text_lengths: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    return_all_layers: bool = False,
    sort_plan=None,
):
    """Pure forward pass over fixed-shape arrays → ``[N, hidden_dim]``.

    With ``return_all_layers=True`` returns the list of per-layer outputs
    (post-norm) for the parity harness. ``sort_plan`` (from
    ``encode_graph(with_sort_plan=True)``) enables the sort-free
    aggregation path in ``ops/message_passing.py``.
    """
    use_dropout = train and config.dropout > 0.0
    if use_dropout and rng is None:
        raise ValueError("dropout requires an rng key in training mode")

    from graph_hypernetwork_forge_tpu.utils.initializers import resolve_precision

    prec = resolve_precision(config.precision)
    h = jax.nn.relu(linear_apply(params["input_proj"], node_features, precision=prec))
    text_embs = apply_text_encoder(
        params["text_encoder"], char_ids, text_lengths, precision=config.precision
    )

    n = node_features.shape[0]

    def layer_fn(h, layer_params, norm_params, gen_rng, drop_rng):
        weights = apply_weight_generator(
            config.weight_generator,
            layer_params,
            text_embs,
            train=train,
            rng=gen_rng,
        )
        h_new = relational_message_passing(
            h,
            src,
            dst,
            rel_ids,
            weights["W_msg"],
            weights["W_self"],
            weights["bias"],
            num_nodes=n,
            edge_mask=edge_mask,
            backend=config.backend,
            precision=prec,
            rel_sorted=config.rel_sorted,
            sort_plan=sort_plan,
            group_padded=config.group_padded,
            compute_dtype=config.compute_dtype,
        )
        h_new = h_new + h  # residual (always shape-compatible: hidden→hidden)
        h_new = jax.nn.relu(h_new)
        if use_dropout:
            keep = jax.random.bernoulli(drop_rng, 1.0 - config.dropout, h_new.shape)
            h_new = jnp.where(keep, h_new / (1.0 - config.dropout), 0.0)
        return layer_norm_apply(norm_params, h_new)

    if config.remat:
        layer_fn = jax.checkpoint(layer_fn, static_argnums=())

    per_layer: List[jax.Array] = []
    for layer_idx in range(config.num_layers):
        gen_rng = drop_rng = None
        if use_dropout:
            rng, gen_rng, drop_rng = jax.random.split(rng, 3)
        h = layer_fn(
            h,
            params["weight_generators"][layer_idx],
            params["layer_norms"][layer_idx],
            gen_rng,
            drop_rng,
        )
        if return_all_layers:
            per_layer.append(h)

    return per_layer if return_all_layers else h


def score_triple(head_emb: jax.Array, tail_emb: jax.Array) -> jax.Array:
    """Dot-product link score; ``[d] → scalar`` or ``[B, d] → [B]``
    (reference ``models/hypergnn.py:304-318``)."""
    return jnp.sum(head_emb * tail_emb, axis=-1)


@partial(jax.jit, static_argnames=("config", "train"))
def _forward_jit(
    config: HyperGNNConfig,
    params: dict,
    node_features,
    src,
    dst,
    rel_ids,
    edge_mask,
    char_ids,
    text_lengths,
    rng,
    sort_plan=None,
    train: bool = False,
):
    return apply_hypergnn(
        config,
        params,
        node_features,
        src,
        dst,
        rel_ids,
        edge_mask,
        char_ids,
        text_lengths,
        train=train,
        rng=rng,
        sort_plan=sort_plan,
    )


class HyperGNN:
    """Stateful convenience wrapper mirroring the reference call contract.

    ``model(node_features [N, F], edge_index [2, E], edge_texts: List[str])``
    → ``[N, hidden_dim]`` (reference ``models/hypergnn.py:112-120,236-241``).
    Training code should use the pure ``init_hypergnn`` / ``apply_hypergnn``
    API with an explicit :class:`EncodedGraph`.
    """

    def __init__(
        self,
        text_dim: int,
        node_feat_dim: int,
        hidden_dim: int,
        num_layers: int = 2,
        dropout: float = 0.0,
        char_emb_dim: int = 32,
        *,
        backend: Backend = "auto",
        key: Optional[jax.Array] = None,
    ) -> None:
        self.config = HyperGNNConfig(
            text_dim=text_dim,
            node_feat_dim=node_feat_dim,
            hidden_dim=hidden_dim,
            num_layers=num_layers,
            dropout=dropout,
            char_emb_dim=char_emb_dim,
            backend=backend,
        )
        self.text_dim = text_dim
        self.node_feat_dim = node_feat_dim
        self.hidden_dim = hidden_dim
        self.num_layers = num_layers
        self.dropout = dropout
        if key is None:
            key = _fresh_key()
        init_key, self._dropout_key = jax.random.split(key)
        self.params = init_hypergnn(self.config, init_key)
        # Training-mode flag mirroring torch's nn.Module contract (modules
        # start in training mode; reference demo.py:82,121 toggles it with
        # model.train()/model.eval() to enable/disable dropout).
        self.training = True

    # ------------------------------------------------------------------
    def preprocess(
        self, edge_index, edge_texts: Sequence[str], num_nodes: int
    ) -> EncodedGraph:
        """Host-side encode; reuse the result across training steps."""
        return encode_graph(np.asarray(edge_index), edge_texts, num_nodes)

    def forward_encoded(
        self,
        node_features,
        graph: EncodedGraph,
        *,
        train: Optional[bool] = None,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        from graph_hypernetwork_forge_tpu.data.encoding import (
            validate_graph_for_config,
        )

        validate_graph_for_config(graph, self.config)
        if train is None:
            train = self.training
        use_dropout = train and self.config.dropout > 0.0
        if use_dropout and rng is None:
            # Stateful auto-rng mirroring torch's implicit global generator
            # (reference F.dropout at models/hypergnn.py:293-294 draws from
            # the default RNG; here each call advances a held key).
            self._dropout_key, rng = jax.random.split(self._dropout_key)
        node_features = jnp.asarray(np.asarray(node_features), dtype=jnp.float32)
        src, dst, rel_ids, edge_mask, char_ids, lengths = (
            jnp.asarray(a) for a in graph.arrays
        )
        return _forward_jit(
            self.config,
            self.params,
            node_features,
            src,
            dst,
            rel_ids,
            edge_mask,
            char_ids,
            lengths,
            rng,
            graph.sort_plan,
            train=use_dropout,
        )

    def __call__(
        self,
        node_features,
        edge_index,
        edge_texts: Sequence[str],
        *,
        train: Optional[bool] = None,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        num_nodes = int(np.asarray(node_features).shape[0])
        graph = self.preprocess(edge_index, edge_texts, num_nodes)
        return self.forward_encoded(node_features, graph, train=train, rng=rng)

    # ------------------------------------------------------------------
    def score_triple(self, head_emb, tail_emb) -> jax.Array:
        return score_triple(jnp.asarray(head_emb), jnp.asarray(tail_emb))

    def num_parameters(self) -> int:
        """Total trainable parameter count (reference
        ``models/hypergnn.py:320-322``)."""
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(self.params))

    # Compatibility aliases for reference attribute names used in tests.
    @property
    def weight_generators(self) -> list:
        return self.params["weight_generators"]

    @property
    def layer_norms(self) -> list:
        return self.params["layer_norms"]

    def eval(self) -> "HyperGNN":
        """Switch to inference mode: dropout disabled (reference
        ``demo.py:121``, torch ``nn.Module.eval`` semantics)."""
        self.training = False
        return self

    def train(self, mode: bool = True) -> "HyperGNN":
        """Switch to training mode: dropout active when ``config.dropout > 0``
        (reference ``demo.py:82``, torch ``nn.Module.train`` semantics)."""
        self.training = mode
        return self
