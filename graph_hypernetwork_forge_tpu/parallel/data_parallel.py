"""Data parallelism: minibatched subgraph training sharded over ``"data"``.

The classic DP recipe, GSPMD-style (SURVEY.md §2.3 build table row 1): a
batch of B independent neighbor-sampled subgraphs (identical static shapes,
``data/encoding.py`` padding discipline) is sharded on its leading batch
axis across the ``"data"`` mesh axis; parameters and optimizer state are
replicated. ``jax.jit`` with explicit shardings derives the gradient
``psum`` — no hand-written collectives. Loss/gradient semantics match the
reference objective (`/root/reference/demo.py:79-98`) averaged over the
batch, exactly as the single-device vmapped step computes it (tested).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_hypernetwork_forge_tpu.models.hypergnn import (
    HyperGNNConfig,
    apply_hypergnn,
)
from graph_hypernetwork_forge_tpu.training.objectives import (
    link_prediction_loss,
)


def make_data_parallel_step(
    mesh: Mesh,
    config: HyperGNNConfig,
    optimizer,
    *,
    margin: float = 1.0,
    axis: str = "data",
):
    """Jitted DP training step over a leading batch axis of subgraphs.

    Returns ``step(params, opt_state, feats [B,N,F], src [B,E], dst, rel,
    mask, chars, lens, rng) → (params, opt_state, loss)`` with the batch
    axis sharded over ``axis`` and params/opt_state replicated. ``B`` must
    be divisible by the ``axis`` size.
    """
    import optax

    batch_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    use_dropout = config.dropout > 0.0

    def per_graph_loss(params, feats, src, dst, rel, mask, chars, lens, neg,
                       drop_rng):
        embs = apply_hypergnn(
            config, params, feats, src, dst, rel, mask, chars, lens,
            train=use_dropout, rng=drop_rng,
        )
        return link_prediction_loss(
            embs, src, dst, neg, margin=margin, edge_mask=mask
        )

    def loss_fn(params, feats, src, dst, rel, mask, chars, lens, neg,
                drop_rngs):
        losses = jax.vmap(per_graph_loss, in_axes=(None,) + (0,) * 9)(
            params, feats, src, dst, rel, mask, chars, lens, neg, drop_rngs
        )
        return jnp.mean(losses)

    @jax.jit
    def step(params, opt_state, feats, src, dst, rel, mask, chars, lens, rng):
        # Pin the DP layout: batch-sharded data, replicated params. GSPMD
        # then inserts the gradient all-reduce over the "data" axis.
        feats, src, dst, rel, mask, chars, lens = (
            jax.lax.with_sharding_constraint(x, batch_sharding)
            for x in (feats, src, dst, rel, mask, chars, lens)
        )
        params = jax.lax.with_sharding_constraint(params, replicated)
        neg_rng, drop_rng = jax.random.split(rng)
        neg = jax.random.randint(
            neg_rng, src.shape, 0, feats.shape[1], dtype=src.dtype
        )
        # Per-microbatch dropout keys (unused when config.dropout == 0,
        # matching training/train.py:80's train-when-configured semantics).
        drop_rngs = jax.random.split(drop_rng, src.shape[0])
        loss, grads = jax.value_and_grad(loss_fn)(
            params, feats, src, dst, rel, mask, chars, lens, neg, drop_rngs
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
