"""Minibatch link-prediction training over neighbor-sampled subgraphs.

The reference trains full-graph only; large KGs (Wikidata5M-scale configs in
BASELINE.json) need edge-centric minibatching: sample a batch of positive
edges, expand a k-hop in-neighborhood around their endpoints
(`data/sampling.py`), and train margin-ranking on the subgraph.

XLA discipline: every step must reuse ONE compiled program, so subgraph
sizes are padded to fixed buckets — nodes to ``node_bucket``, edges via
``EncodedGraph``'s own bucketing, positives to ``batch_size`` — with masks
making padding inert. A changed bucket (outlier batch) costs one extra
compile, bounded by the bucket ladder.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graph_hypernetwork_forge_tpu.data.encoding import encode_graph
from graph_hypernetwork_forge_tpu.data.sampling import NeighborSampler
from graph_hypernetwork_forge_tpu.models.hypergnn import (
    HyperGNNConfig,
    apply_hypergnn,
    score_triple,
)
from graph_hypernetwork_forge_tpu.utils.shapes import round_up_to_multiple


@dataclasses.dataclass
class MinibatchSpec:
    batch_size: int = 128  # positive edges per step
    fanouts: Tuple[int, ...] = (10, 10)
    node_bucket_multiple: int = 256


class MinibatchTrainer:
    """Host-side sampler + one jitted train step over bucketed subgraphs."""

    def __init__(
        self,
        config: HyperGNNConfig,
        optimizer: optax.GradientTransformation,
        edge_index: np.ndarray,
        edge_texts,
        node_features: np.ndarray,
        spec: Optional[MinibatchSpec] = None,
        *,
        margin: float = 1.0,
    ) -> None:
        self.config = config
        self.optimizer = optimizer
        self.spec = spec or MinibatchSpec()
        self.margin = margin
        self.edge_index = np.asarray(edge_index)
        self.edge_texts = list(edge_texts)
        self.node_features = np.asarray(node_features, dtype=np.float32)
        self.num_nodes = self.node_features.shape[0]
        self.sampler = NeighborSampler(
            self.edge_index, self.edge_texts, self.num_nodes
        )
        self._step_fn = self._build_step()

    # ------------------------------------------------------------------
    def _build_step(self):
        config, margin = self.config, self.margin
        optimizer = self.optimizer

        def loss_fn(params, feats, src, dst, rel, emask, cids, lens,
                    pos_src, pos_dst, pos_mask, neg_dst):
            embs = apply_hypergnn(
                config, params, feats, src, dst, rel, emask, cids, lens
            )
            pos = score_triple(embs[pos_src], embs[pos_dst])
            neg = score_triple(embs[pos_src], embs[neg_dst])
            per = jnp.clip(margin - pos + neg, a_min=0.0)
            return jnp.sum(per * pos_mask) / jnp.maximum(jnp.sum(pos_mask), 1.0)

        @jax.jit
        def step(params, opt_state, feats, src, dst, rel, emask, cids, lens,
                 pos_src, pos_dst, pos_mask, rng):
            neg_dst = jax.random.randint(
                rng, pos_src.shape, 0, feats.shape[0], dtype=pos_src.dtype
            )
            loss, grads = jax.value_and_grad(loss_fn)(
                params, feats, src, dst, rel, emask, cids, lens,
                pos_src, pos_dst, pos_mask, neg_dst,
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    # ------------------------------------------------------------------
    def sample_batch(self, rng: np.random.Generator):
        """Draw positive edges, expand the neighborhood, bucket-pad."""
        spec = self.spec
        e_total = self.edge_index.shape[1]
        pos_ids = rng.integers(0, e_total, size=min(spec.batch_size, e_total))
        pos_src_g = self.edge_index[0][pos_ids]
        pos_dst_g = self.edge_index[1][pos_ids]
        seeds = np.unique(np.concatenate([pos_src_g, pos_dst_g]))

        batch = self.sampler.sample(
            seeds, spec.fanouts, self.node_features, rng=rng
        )

        # Bucket-pad nodes for shape stability across steps.
        n_real = len(batch.node_ids)
        n_pad = round_up_to_multiple(n_real, spec.node_bucket_multiple)
        feats = np.zeros((n_pad, self.node_features.shape[1]), np.float32)
        feats[:n_real] = batch.node_features

        # Rebuild the subgraph encoding against the padded node count (the
        # edge arrays are unchanged — node ids stay < n_real).
        graph = batch.graph

        # Positive pairs in local ids, padded to batch_size.
        b = spec.batch_size
        pos_src = np.zeros(b, np.int32)
        pos_dst = np.zeros(b, np.int32)
        pos_mask = np.zeros(b, np.float32)
        k = len(pos_ids)
        # batch.node_ids is sorted (np.unique) → searchsorted gives local ids.
        pos_src[:k] = np.searchsorted(batch.node_ids, pos_src_g)
        pos_dst[:k] = np.searchsorted(batch.node_ids, pos_dst_g)
        pos_mask[:k] = 1.0

        return feats, graph, pos_src, pos_dst, pos_mask

    # ------------------------------------------------------------------
    def step(self, params, opt_state, rng_np: np.random.Generator, rng_jax):
        feats, graph, pos_src, pos_dst, pos_mask = self.sample_batch(rng_np)
        params, opt_state, loss = self._step_fn(
            params,
            opt_state,
            jnp.asarray(feats),
            *(jnp.asarray(a) for a in graph.arrays),
            jnp.asarray(pos_src),
            jnp.asarray(pos_dst),
            jnp.asarray(pos_mask),
            rng_jax,
        )
        return params, opt_state, loss
