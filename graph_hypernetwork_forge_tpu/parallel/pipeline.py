"""Pipeline parallelism: HyperGNN layers staged across a ``"pipe"`` mesh axis.

The reference has no distributed code at all (SURVEY.md §2.3); its layer loop
(`/root/reference/graph_hypernetwork_forge/models/hypergnn.py:272-296`) is the
natural pipeline axis for deep GNNs. This module implements GPipe-style
pipelining the idiomatic TPU way:

- the per-layer parameter pytrees (one WeightGenerator + one LayerNorm per
  layer, reference ``models/hypergnn.py:139-154``) are *stacked* along a
  leading layer axis and sharded over the ``"pipe"`` mesh axis, so each stage
  holds only ``num_layers / n_stages`` layers' parameters in HBM;
- microbatches (independent neighbor-sampled subgraphs, all padded to the
  same static shapes) flow through the stage ring; activations move stage →
  stage with a single ``lax.ppermute`` hop per tick over ICI;
- the schedule is the classic ``T = M + S - 1`` tick loop expressed as a
  ``lax.scan`` (static trip count → reverse-differentiable, so the same
  program serves pipelined training);
- text encoding and the input projection are replicated preludes (they are
  a negligible fraction of the FLOPs — the per-layer hypernetwork heads and
  message passing dominate).

Exactness: every stage applies the very same layer function as the
single-device model (``relational_message_passing`` + residual → ReLU →
LayerNorm), so outputs match ``apply_hypergnn`` per microbatch (tested on a
virtual 4-stage CPU mesh in ``tests/test_pipeline.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from graph_hypernetwork_forge_tpu.models.hypergnn import HyperGNNConfig
from graph_hypernetwork_forge_tpu.models.text_encoder import apply_text_encoder
from graph_hypernetwork_forge_tpu.models.weight_generator import (
    apply_weight_generator,
)
from graph_hypernetwork_forge_tpu.ops.message_passing import (
    relational_message_passing,
)
from graph_hypernetwork_forge_tpu.utils.initializers import (
    layer_norm_apply,
    linear_apply,
    resolve_precision,
)

shard_map = jax.shard_map


def stack_layer_params(params: dict) -> tuple:
    """Stack the per-layer parameter lists along a leading layer axis.

    ``init_hypergnn`` stores ``weight_generators`` / ``layer_norms`` as
    Python lists (one entry per layer); pipelining wants them as stacked
    pytrees ``[L, ...]`` whose leading axis shards over ``"pipe"``.
    """
    gens = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *params["weight_generators"]
    )
    norms = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params["layer_norms"])
    return gens, norms


def pipelined_forward(
    mesh: Mesh,
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
    axis: str = "pipe",
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Forward M microbatches through a layer-staged pipeline → ``[M, N, H]``.

    Args:
        node_features: ``[M, N, F]`` per-microbatch node features.
        src, dst, rel_ids: ``[M, E]`` per-microbatch edge arrays.
        edge_mask: ``[M, E]`` float padding mask (or None for all-real edges).
        char_ids, text_lengths: ``[M, U, Lmax]`` / ``[M, U]`` tokenized
            relation texts per microbatch.
        train: enable dropout (requires ``rng``) when ``config.dropout > 0``,
            mirroring the single-device ``apply_hypergnn`` contract. Dropout
            keys are derived per (microbatch, global layer) with
            ``fold_in``, so they are independent of the pipeline schedule.
        rng: base PRNG key for dropout.

    All microbatches must share static shapes (the padding discipline of
    ``data/encoding.py``). ``config.num_layers`` must divide evenly by the
    ``axis`` size. Pipelined *training* wraps this in ``jax.grad``; the
    tick scan has a static trip count so reverse-mode differentiation works.
    """
    n_stages = mesh.shape[axis]
    if config.num_layers % n_stages != 0:
        raise ValueError(
            f"num_layers={config.num_layers} must be divisible by the pipeline "
            f"axis size {n_stages}"
        )
    m = node_features.shape[0]
    n = node_features.shape[1]
    prec = resolve_precision(config.precision)
    layers_per_stage = config.num_layers // n_stages

    use_dropout = train and config.dropout > 0.0
    if use_dropout and rng is None:
        raise ValueError("dropout requires an rng key in training mode")
    if rng is None:
        rng = jax.random.PRNGKey(0)  # inert placeholder (dropout off)

    if edge_mask is None:
        edge_mask = jnp.ones(src.shape, dtype=node_features.dtype)

    gens, norms = stack_layer_params(params)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # text_encoder params (replicated)
            P(),  # input_proj params (replicated)
            P(axis),  # stacked weight-generator params: layer axis sharded
            P(axis),  # stacked layer norms: layer axis sharded
            P(),  # node features (replicated: every stage sees every microbatch)
            P(),
            P(),
            P(),
            P(),
            P(),
            P(),
            P(),  # dropout base key (replicated)
        ),
        out_specs=P(),
        check_vma=False,
    )
    def _pipeline(
        te_params,
        proj_params,
        gens_local,
        norms_local,
        feats,
        src_a,
        dst_a,
        rel_a,
        mask_a,
        chars_a,
        lens_a,
        base_rng,
    ):
        s = jax.lax.axis_index(axis)

        # Replicated prelude: input projection + one-shot text encoding for
        # every microbatch (reference models/hypergnn.py:261,270).
        h0_all = jax.nn.relu(linear_apply(proj_params, feats, precision=prec))
        text_all = jax.vmap(
            lambda c, l: apply_text_encoder(te_params, c, l, precision=config.precision)
        )(chars_a, lens_a)

        def run_stage(h_in, mb):
            """Apply this stage's layer slice to one microbatch's activation."""
            src_mb = src_a[mb]
            dst_mb = dst_a[mb]
            rel_mb = rel_a[mb]
            mask_mb = mask_a[mb]
            text_mb = text_all[mb]

            def one_layer(h, layer_xs):
                gen_p, norm_p, local_idx = layer_xs
                gen_rng = drop_rng = None
                if use_dropout:
                    # Key depends only on (microbatch, global layer) — the
                    # pipeline schedule (which tick/stage runs it) does not
                    # change the randomness.
                    global_layer = s * layers_per_stage + local_idx
                    layer_key = jax.random.fold_in(
                        jax.random.fold_in(base_rng, mb), global_layer
                    )
                    gen_rng, drop_rng = jax.random.split(layer_key)
                weights = apply_weight_generator(
                    config.weight_generator, gen_p, text_mb,
                    train=use_dropout, rng=gen_rng,
                )
                h_new = relational_message_passing(
                    h,
                    src_mb,
                    dst_mb,
                    rel_mb,
                    weights["W_msg"],
                    weights["W_self"],
                    weights["bias"],
                    num_nodes=n,
                    edge_mask=mask_mb,
                    backend=config.backend,
                    precision=config.precision,
                    rel_sorted=config.rel_sorted,
                )
                h_new = jax.nn.relu(h_new + h)
                if use_dropout:
                    keep = jax.random.bernoulli(
                        drop_rng, 1.0 - config.dropout, h_new.shape
                    )
                    h_new = jnp.where(keep, h_new / (1.0 - config.dropout), 0.0)
                return layer_norm_apply(norm_p, h_new), None

            if config.remat:
                one_layer = jax.checkpoint(one_layer)
            h_out, _ = jax.lax.scan(
                one_layer, h_in,
                (gens_local, norms_local, jnp.arange(layers_per_stage)),
            )
            return h_out

        def tick(carry, t):
            state, out_all = carry
            mb = t - s  # microbatch resident at this stage this tick
            active = (mb >= 0) & (mb < m)
            mb_c = jnp.clip(mb, 0, m - 1)
            # Stage 0 ingests a fresh microbatch; later stages consume the
            # activation handed over the ring last tick.
            h_in = jnp.where(s == 0, h0_all[mb_c], state)
            h_out = run_stage(h_in, mb_c)
            # Last stage drains: record the finished microbatch.
            write = active & (s == n_stages - 1)
            out_all = jnp.where(write, out_all.at[mb_c].set(h_out), out_all)
            # One ICI hop: stage s → stage s+1 (ring; stage 0 ignores input).
            state = jax.lax.ppermute(
                h_out, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return (state, out_all), None

        state0 = jnp.zeros((n, config.hidden_dim), feats.dtype)
        out0 = jnp.zeros((m, n, config.hidden_dim), feats.dtype)
        (_, out_all), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(m + n_stages - 1)
        )
        # Only the last stage holds real outputs; psum replicates them.
        return jax.lax.psum(
            jnp.where(s == n_stages - 1, out_all, jnp.zeros_like(out_all)), axis
        )

    return _pipeline(
        params["text_encoder"],
        params["input_proj"],
        gens,
        norms,
        node_features,
        src,
        dst,
        rel_ids,
        edge_mask,
        char_ids,
        text_lengths,
        rng,
    )


def make_pipelined_train_step(
    mesh: Mesh,
    config: HyperGNNConfig,
    optimizer,
    *,
    margin: float = 1.0,
    axis: str = "pipe",
):
    """Jitted pipelined training step over M microbatched subgraphs.

    Loss = mean over microbatches of the margin-ranking link-prediction
    loss (reference objective, ``demo.py:79-98``), with tail-corruption
    negatives drawn inside the step. Gradients flow backward through the
    pipeline ring (``ppermute`` transposes to the reverse permutation, so
    the backward pass is itself a reverse-direction pipeline).

    Returns ``(params, opt_state, feats [M,N,F], src, dst, rel, mask,
    chars, lens, rng) → (params, opt_state, loss)``.
    """
    import optax

    from graph_hypernetwork_forge_tpu.training.objectives import (
        link_prediction_loss,
    )

    use_dropout = config.dropout > 0.0

    def loss_fn(params, feats, src, dst, rel, mask, chars, lens, neg_dst,
                drop_rng):
        embs = pipelined_forward(
            mesh, config, params, feats, src, dst, rel, mask, chars, lens,
            axis=axis, train=use_dropout, rng=drop_rng,
        )
        losses = jax.vmap(
            lambda e, s, d, nd, mk: link_prediction_loss(
                e, s, d, nd, margin=margin, edge_mask=mk
            )
        )(embs, src, dst, neg_dst, mask)
        return jnp.mean(losses)

    @jax.jit
    def step(params, opt_state, feats, src, dst, rel, mask, chars, lens, rng):
        neg_rng, drop_rng = jax.random.split(rng)
        neg_dst = jax.random.randint(
            neg_rng, src.shape, 0, feats.shape[1], dtype=src.dtype
        )
        loss, grads = jax.value_and_grad(loss_fn)(
            params, feats, src, dst, rel, mask, chars, lens, neg_dst, drop_rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
