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


# ---------------------------------------------------------------------------
# Distributed minibatching: neighbor-sampled subgraphs × the composed
# multi-device step (BASELINE config #4 — "Wikidata5M inductive:
# neighbor-sampled minibatches, edge-partitioned across hosts").
# ---------------------------------------------------------------------------


def make_composed_minibatch_step(
    mesh,
    config: HyperGNNConfig,
    optimizer: optax.GradientTransformation,
    nodes_per_shard: int,
    *,
    axis: str = "edge",
    margin: float = 1.0,
    contrib: str = "dense",
):
    """Jitted edge-sharded minibatch train step.

    Subgraph nodes/edges/relations are sharded over ``axis`` exactly as in
    ``parallel/composed.py``; the exchange is the dense all_gather variant
    — the right call for minibatches, whose subgraphs are bucket-bounded
    (a halo plan would change shape every batch and recompile). Positive
    pairs are sharded over ``axis`` too; negatives are drawn REPLICATED
    from the step rng (identical draw to the single-device
    :class:`MinibatchTrainer`, so losses/params match it exactly).

    ``contrib="grouped"`` runs the relation-grouped ``ragged_dot`` per
    shard instead of the dense all-relations product — REQUIRED at large
    U·n_sub (the dense ``[2U, n_sub, d]`` intermediate is ~24 GB at
    U=237 × a 200k-node subgraph and crashes compilation); needs
    ``rel_group_sizes`` from ``prepare_composed_inputs(rel_sort_local=
    True)`` passed as the step's extra trailing argument.
    """
    from jax.sharding import PartitionSpec as P

    from graph_hypernetwork_forge_tpu.models.text_encoder import (
        apply_text_encoder,
    )
    from graph_hypernetwork_forge_tpu.models.weight_generator import (
        apply_weight_generator,
    )
    from graph_hypernetwork_forge_tpu.utils.initializers import (
        layer_norm_apply,
        linear_apply,
        resolve_precision,
    )

    prec = resolve_precision(config.precision)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),            # params (replicated)
            P(axis, None),  # feats: node-range sharded
            P(axis), P(axis), P(axis), P(axis),  # subgraph edges
            P(axis, None), P(axis),              # relations sharded
            P(axis, None),                       # ragged group sizes
            P(axis), P(axis), P(axis), P(axis),  # pos pairs + negatives
        ),
        out_specs=P(),
        check_vma=False,
    )
    def _loss(params, feats_l, src_l, dst_l, rel_l, mask_l, chars_l, lens_l,
              gs_l, ps_l, pd_l, pm_l, nd_l):
        my_idx = jax.lax.axis_index(axis)
        h_local = jax.nn.relu(
            linear_apply(params["input_proj"], feats_l, precision=prec)
        )
        text_local = apply_text_encoder(
            params["text_encoder"], chars_l, lens_l,
            precision=config.precision,
        )
        local_dst = dst_l - my_idx * nodes_per_shard
        for layer_idx in range(config.num_layers):
            local_w = apply_weight_generator(
                config.weight_generator,
                params["weight_generators"][layer_idx],
                text_local,
            )
            w = {
                kk: jax.lax.all_gather(v, axis, tiled=True)
                for kk, v in local_w.items()
            }
            h_full = jax.lax.all_gather(h_local, axis, tiled=True)
            if contrib == "grouped":
                from graph_hypernetwork_forge_tpu.ops.message_passing import (
                    _ragged_transform,
                )

                gs = gs_l[0]
                msg = (
                    _ragged_transform(h_full[src_l], w["W_msg"], gs, prec)
                    + w["bias"][rel_l]
                ) * mask_l[:, None]
                selfc = (
                    _ragged_transform(h_full[dst_l], w["W_self"], gs, prec)
                    * mask_l[:, None]
                )
            else:
                hw = jnp.einsum(
                    "nd,udo->uno", h_full,
                    jnp.concatenate([w["W_msg"], w["W_self"]]),
                    precision=prec,
                )
                u = w["W_msg"].shape[0]
                msg = (hw[rel_l, src_l] + w["bias"][rel_l]) * mask_l[:, None]
                selfc = hw[rel_l + u, dst_l] * mask_l[:, None]
            agg = jax.ops.segment_sum(
                msg, local_dst, num_segments=nodes_per_shard
            )
            selft = jax.ops.segment_sum(
                selfc, local_dst, num_segments=nodes_per_shard
            )
            cnt = jax.ops.segment_sum(
                mask_l, local_dst, num_segments=nodes_per_shard
            )
            cnt = jnp.maximum(cnt, 1.0)[:, None]
            h_local = layer_norm_apply(
                params["layer_norms"][layer_idx],
                jax.nn.relu(agg / cnt + selft / cnt + h_local),
            )
        embs = jax.lax.all_gather(h_local, axis, tiled=True)
        pos = jnp.sum(embs[ps_l] * embs[pd_l], axis=-1)
        neg = jnp.sum(embs[ps_l] * embs[nd_l], axis=-1)
        per = jnp.clip(margin - pos + neg, a_min=0.0)
        num = jax.lax.psum(jnp.sum(per * pm_l), axis)
        den = jax.lax.psum(jnp.sum(pm_l), axis)
        return num / jnp.maximum(den, 1.0)

    @jax.jit
    def step(params, opt_state, feats, src, dst, rel, mask, chars, lens,
             pos_src, pos_dst, pos_mask, rng, rel_group_sizes=None):
        # Same replicated draw as MinibatchTrainer's step — bit-identical
        # negatives given the same rng.
        neg_dst = jax.random.randint(
            rng, pos_src.shape, 0, feats.shape[0], dtype=pos_src.dtype
        )
        if rel_group_sizes is None:
            if contrib == "grouped":
                raise ValueError("contrib='grouped' needs rel_group_sizes")
            k = mesh.shape[axis]
            rel_group_sizes = jnp.zeros((k, 1), dtype=jnp.int32)  # inert

        def loss_fn(p):
            return _loss(
                p, feats, src, dst, rel, mask, chars, lens,
                rel_group_sizes, pos_src, pos_dst, pos_mask, neg_dst,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_opt_state, loss

    return step


class DistributedMinibatchTrainer(MinibatchTrainer):
    """Neighbor-sampled minibatches × the edge-sharded composed step.

    The sampler emits per-shard fixed-shape buckets: each sampled subgraph
    is dst-partitioned over the mesh axis (``partition_edges_by_dst`` via
    ``prepare_composed_inputs(halo=False)``) and every per-shard array is
    padded to a ladder bucket (``cap`` rounded to ``cap_multiple``) so one
    compiled program serves all batches; an outlier batch costs one extra
    compile, bounded by the ladder. Positives are padded to
    ``spec.batch_size`` (must divide the mesh size) and sharded too.
    """

    def __init__(self, mesh, config, optimizer, edge_index, edge_texts,
                 node_features, spec: Optional[MinibatchSpec] = None, *,
                 axis: str = "edge", margin: float = 1.0,
                 cap_multiple: int = 512) -> None:
        self.mesh = mesh
        self.axis = axis
        self.num_shards = int(mesh.shape[axis])
        self.cap_multiple = cap_multiple
        spec = spec or MinibatchSpec()
        if spec.batch_size % self.num_shards:
            raise ValueError(
                f"batch_size ({spec.batch_size}) must divide the mesh "
                f"axis ({self.num_shards})"
            )
        if spec.node_bucket_multiple % self.num_shards:
            raise ValueError(
                "node_bucket_multiple must divide the mesh axis so the "
                "padded node count shards evenly (and the negative-"
                "sampling range matches the single-device trainer)"
            )
        super().__init__(
            config, optimizer, edge_index, edge_texts, node_features,
            spec, margin=margin,
        )
        self._dist_steps = {}  # nodes_per_shard -> compiled step

    def _build_step(self):
        return None  # replaced by the per-bucket distributed steps

    def sample_batch_sharded(self, rng: np.random.Generator):
        """One subgraph batch → per-shard fixed-bucket composed arrays."""
        from graph_hypernetwork_forge_tpu.parallel.composed import (
            prepare_composed_inputs,
        )

        feats, graph, pos_src, pos_dst, pos_mask = self.sample_batch(rng)
        k = self.num_shards
        # The subgraph encodes its REAL node count; partition over the
        # bucket-padded count instead so feats/npp line up with the
        # single-device trainer's node range (pad nodes are isolated —
        # count-clamped to zero output, and the negative-sampling range
        # matches MinibatchTrainer exactly).
        graph = dataclasses.replace(graph, num_nodes=feats.shape[0])
        inputs = prepare_composed_inputs(
            graph, feats, k, halo=False, rel_sort_local=True
        )
        # Ladder-pad the per-shard edge cap for shape stability. Pad rows
        # carry the LAST relation id so each shard's slice stays
        # relation-sorted with contiguous groups (the grouped ragged
        # contract); they are masked.
        cap = inputs.src.shape[0] // k
        cap_b = round_up_to_multiple(cap, self.cap_multiple)
        npp = inputs.nodes_per_shard
        u_pad = inputs.char_ids.shape[0]

        def grow(arr, fill):
            out = np.full((k, cap_b), fill, dtype=np.asarray(arr).dtype)
            out[:, :cap] = np.asarray(arr).reshape(k, cap)
            return out.reshape(-1)

        src = grow(inputs.src, 0)
        rel = grow(inputs.rel_ids, u_pad - 1)
        mask = grow(inputs.edge_mask, 0)
        gs = np.array(inputs.rel_group_sizes, dtype=np.int32)
        gs[:, -1] += cap_b - cap
        dst = np.full((k, cap_b), 0, dtype=np.asarray(inputs.dst).dtype)
        dst[:, :cap] = np.asarray(inputs.dst).reshape(k, cap)
        for j in range(k):  # pad dst rows must stay shard-owned
            dst[j, cap:] = j * npp
        return (
            inputs, jnp.asarray(inputs.feats), jnp.asarray(src),
            jnp.asarray(dst.reshape(-1)), jnp.asarray(rel),
            jnp.asarray(mask), jnp.asarray(inputs.char_ids),
            jnp.asarray(inputs.lengths), jnp.asarray(pos_src),
            jnp.asarray(pos_dst), jnp.asarray(pos_mask), jnp.asarray(gs),
        )

    def _pick_contrib(self, n_pad: int, u_pad: int) -> str:
        # Same memory-regime logic as the single-device auto backend: the
        # dense [2U, n_sub, d] product blows up at large U·n_sub (24 GB at
        # U=237 x 200k nodes — crashes compilation); grouped ragged_dot is
        # O(E·d²) there.
        from graph_hypernetwork_forge_tpu.ops.message_passing import (
            _DENSE_BUDGET_ELEMENTS,
        )

        dense_elems = 2 * u_pad * n_pad * self.config.hidden_dim
        return "dense" if dense_elems <= _DENSE_BUDGET_ELEMENTS else "grouped"

    def step(self, params, opt_state, rng_np: np.random.Generator, rng_jax):
        (inputs, feats, src, dst, rel, mask, chars, lens, ps, pd, pm,
         gs) = self.sample_batch_sharded(rng_np)
        npp = inputs.nodes_per_shard
        contrib = self._pick_contrib(feats.shape[0], chars.shape[0])
        key = (npp, src.shape[0], chars.shape[0], contrib)
        if key not in self._dist_steps:
            self._dist_steps[key] = make_composed_minibatch_step(
                self.mesh, self.config, self.optimizer, npp,
                axis=self.axis, margin=self.margin, contrib=contrib,
            )
        params, opt_state, loss = self._dist_steps[key](
            params, opt_state, feats, src, dst, rel, mask, chars, lens,
            ps, pd, pm, rng_jax, rel_group_sizes=gs,
        )
        return params, opt_state, loss
