"""2D-composed training: edge/node/relation sharding × tensor parallelism
in ONE SPMD program over an (edge, model) mesh.

Round-3's composed step (``parallel/composed.py``) shards relations, edges,
and nodes over one mesh axis but re-materializes the full ``[U, d, d]``
weight banks on every device with a per-layer ``all_gather`` — exactly the
memory wall the Megatron generator split (``parallel/tensor_parallel.py``)
was built to remove. This module fuses the two:

- the **edge axis** works as in ``composed.py``: nodes range-sharded,
  edges dst-owner sharded, relation *texts* sharded (each edge-shard
  encodes U/k_e texts), boundary-minimized halo exchange per layer,
  fully-local scoring (``local_roll``);
- the **model axis** runs the Megatron head split *inside the same
  program*: column→row-parallel hidden MLP (one ``psum(model)`` mid-head),
  column-parallel final Linear whose contiguous output block is ``d_in/k_m``
  full rows of the row-major ``(d_in, d_out)`` space — so each device emits
  ``[U/k_e, d_in/k_m, d_out]`` bank shards;
- the per-layer bank assembly is an ``all_gather`` over the **edge axis
  only** → ``[U, d_in/k_m, d_out]``: per-device bank bytes AND bank wire
  traffic divide by ``k_m`` (the banks are never whole on any device);
- the contribution contraction consumes d_in-sharded banks directly: each
  device contracts its ``rows[:, d_in-slice]`` against its bank shard and
  ONE ``psum(model)`` of the per-edge ``[cap, d_out]`` partials restores
  the exact full contraction (Megatron activation reduction) before the
  bias/mask/aggregation tail.

Semantics preserved: the reference per-edge transform + mean aggregation +
averaged W_self (``/root/reference/graph_hypernetwork_forge/models/
hypergnn.py:201-230``) and the generator output contract
(``models/weight_generator.py:120-143``) — the model axis only re-orders
the d_in contraction, so results match the 1D composed step to float
tolerance (``tests/test_composed_tp.py``).

**3D (edge × model × pipe) scope note.** The pipeline axis deliberately
stays a separate program (``parallel/pipeline.py``) rather than a third
mesh axis here: at this model family's depth (2-3 GNN layers, reference
``models/hypergnn.py``) a pipeline stage holds roughly one layer, so a
pipe axis would multiply bubble overhead (≥ (S-1)/M of the step at S
stages / M microbatches) while saving memory the 2D step does not need —
the per-device residency is dominated by EDGE-sharded ``[E/k, d]``
streams and k_m-sharded banks, both already divided; layer params are
KiB-scale. Pipe composition becomes worthwhile only when layer count
grows ~10x beyond the reference family; the GPipe machinery (reverse-
differentiable tick scan, ppermute ring) exists and is exercised by its
own dryrun leg, so the composition is a wiring exercise deferred until a
model family needs it, not a capability gap.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_hypernetwork_forge_tpu.models.hypergnn import HyperGNNConfig
from graph_hypernetwork_forge_tpu.models.text_encoder import apply_text_encoder
from graph_hypernetwork_forge_tpu.parallel.tensor_parallel import (
    tp_param_specs,
)
from graph_hypernetwork_forge_tpu.utils.initializers import (
    layer_norm_apply,
    linear_apply,
    resolve_precision,
)


def composed_tp_param_specs(
    config: HyperGNNConfig, model_axis: str = "model"
):
    """PartitionSpec pytree for the full model params on an (edge, model)
    mesh: generator heads Megatron-split over ``model_axis``, everything
    else replicated. Usable both as shard_map ``in_specs`` and for
    ``device_put`` placement (:func:`shard_composed_tp_params`)."""
    gen_spec = tp_param_specs(config.weight_generator, model_axis)
    return {
        "text_encoder": P(),
        "input_proj": P(),
        "weight_generators": [gen_spec] * config.num_layers,
        "layer_norms": P(),
    }


def shard_composed_tp_params(params, config, mesh: Mesh,
                             model_axis: str = "model"):
    """Device-put a replicated param pytree into the 2D-step layout."""
    specs = composed_tp_param_specs(config, model_axis)

    def expand(spec_tree, param_tree):
        # Broadcast P() prefixes over param subtrees.
        if isinstance(spec_tree, P):
            return jax.tree_util.tree_map(lambda _: spec_tree, param_tree)
        if isinstance(spec_tree, dict):
            return {k: expand(spec_tree[k], param_tree[k]) for k in param_tree}
        return [expand(s, p) for s, p in zip(spec_tree, param_tree)]

    full = expand(specs, params)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, full
    )


def make_composed_tp_train_step(
    mesh: Mesh,
    config: HyperGNNConfig,
    optimizer,
    nodes_per_shard: int,
    *,
    edge_axis: str = "edge",
    model_axis: str = "model",
    margin: float = 1.0,
    halo_width: Optional[int] = None,
    contrib: str = "dense",
    agg_sorted: bool = False,
):
    """Jitted 2D-sharded train step (fwd + bwd + Adam).

    Same calling convention as ``make_composed_train_step`` in halo mode:
    ``step(params, opt_state, feats, src, dst, rel, mask, chars, lens, rng,
    src_halo=, send_idx=, rel_group_sizes=, agg_plan=) → (params, opt_state,
    loss)`` — but ``params`` must be sharded with
    :func:`shard_composed_tp_params` (generator heads over ``model_axis``),
    and the optimizer state initialized from those sharded params so the
    Adam moments shard identically.

    Constraints (checked):
    - halo mode only (``halo_width`` required): this is the production
      composition; the dense-v1 boundary fallback stays 1D;
    - generator hidden width and ``d_in`` divisible by ``k_m``.

    Dropout (reference ``models/hypergnn.py:293-294`` and the generator
    MLP dropout it mirrors) is fully supported and matches the 1D composed
    step BIT-FOR-BIT: every key folds by the EDGE index only, so all
    model ranks draw the SAME masks; for the column-sharded hidden
    activations each rank draws the full-width 1D mask from the same key
    and slices its own column block (coordinated dropout — the masks are
    consistent across the Megatron shards by construction).
    """
    import optax

    prec = resolve_precision(config.precision)
    gen_cfg = config.weight_generator
    k_m = mesh.shape[model_axis]
    if halo_width is None:
        raise ValueError("make_composed_tp_train_step requires halo mode "
                         "(halo_width from prepare_composed_inputs(halo=True))")
    if gen_cfg.hidden_dim % k_m or gen_cfg.d_in % k_m:
        raise ValueError(
            f"generator hidden_dim ({gen_cfg.hidden_dim}) and d_in "
            f"({gen_cfg.d_in}) must divide the model axis ({k_m})"
        )
    if contrib not in ("dense", "grouped"):
        raise ValueError(f"unknown contrib backend: {contrib!r}")

    def tp_generate_local(gen_params, text_local, gen_rng):
        """Megatron-split head forward on this device's relation slice.

        Matrix heads return ``[U_loc, d_in/k_m, d_out]`` shards; the bias
        head (replicated params) returns the full ``[U_loc, d_out]``.
        Mirrors ``tensor_parallel.tp_generate_weights`` but runs inside the
        2D program so its psum composes with the edge axis.

        ``gen_rng`` (already edge-folded, identical across model ranks)
        drives generator dropout with the SAME key-split schedule as
        ``apply_weight_generator``: the hidden-layer-0 activations are
        column-sharded, so each rank draws the full ``[U_loc, hidden]``
        mask and slices its column block — bitwise the 1D mask.
        """
        use_gdrop = gen_rng is not None and gen_cfg.dropout > 0.0
        keep_p = 1.0 - gen_cfg.dropout
        h_k = gen_cfg.hidden_dim // k_m
        me_m = jax.lax.axis_index(model_axis)
        rng = gen_rng
        out = {}
        for name, shape in gen_cfg.weight_specs:
            l1, l2, l3 = gen_params["heads"][name]
            x = jax.nn.relu(
                jnp.dot(text_local, l1["w"], precision=prec) + l1["b"]
            )
            if use_gdrop:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(
                    sub, keep_p, (text_local.shape[0], gen_cfg.hidden_dim)
                )
                if name != "bias":
                    # Column-parallel layer: slice this rank's block of
                    # the full-width (1D-identical) mask.
                    keep = jax.lax.dynamic_slice_in_dim(
                        keep, me_m * h_k, h_k, 1
                    )
                x = jnp.where(keep, x / keep_p, 0.0)
            x = jnp.dot(x, l2["w"], precision=prec)
            if name != "bias":
                x = jax.lax.psum(x, model_axis)  # row-parallel reduction
            x = jax.nn.relu(x + l2["b"])
            if use_gdrop:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, keep_p, x.shape)
                x = jnp.where(keep, x / keep_p, 0.0)
            flat = jnp.dot(x, l3["w"], precision=prec) + l3["b"]
            scale = jnp.exp(gen_params["log_scales"][name])
            if name == "bias":
                out[name] = flat.reshape((text_local.shape[0],) + shape) * scale
            else:
                out[name] = (
                    flat.reshape(
                        text_local.shape[0], gen_cfg.d_in // k_m, gen_cfg.d_out
                    ) * scale
                )
        return out

    def forward_local(params, feats_l, srch_l, dst_l, rel_l, mask_l,
                      chars_l, lens_l, send_l, gs_l, agg_l, drop_rng):
        use_dropout = drop_rng is not None and config.dropout > 0.0
        me_e = jax.lax.axis_index(edge_axis)
        me_m = jax.lax.axis_index(model_axis)
        k_e = send_l.shape[1]
        din_sh = gen_cfg.d_in // k_m
        rng_layer = drop_rng

        h_local = jax.nn.relu(
            linear_apply(params["input_proj"], feats_l, precision=prec)
        )
        text_local = apply_text_encoder(
            params["text_encoder"], chars_l, lens_l, precision=config.precision
        )
        local_dst = dst_l - me_e * nodes_per_shard

        for layer_idx in range(config.num_layers):
            gen_rng = drop_key = None
            if use_dropout:
                # IDENTICAL key schedule to composed.py's 1D step, folded
                # by the EDGE index only: the [npp, d] epilogue rows are
                # replicated over the model axis, so every model rank
                # draws the SAME mask (coordinated dropout) and the whole
                # 2D step matches the 1D step bit-for-bit.
                rng_layer, gen_rng, drop_key = jax.random.split(rng_layer, 3)
                gen_rng = jax.random.fold_in(gen_rng, me_e)
                drop_key = jax.random.fold_in(drop_key, me_e)
            local_w = tp_generate_local(
                params["weight_generators"][layer_idx], text_local, gen_rng
            )
            # Bank assembly over the EDGE axis only: [U, d_in/k_m, d_out]
            # shards — per-device bank bytes and wire traffic ÷ k_m.
            w_msg = jax.lax.all_gather(local_w["W_msg"], edge_axis, tiled=True)
            w_self = jax.lax.all_gather(local_w["W_self"], edge_axis,
                                        tiled=True)
            bias = jax.lax.all_gather(local_w["bias"], edge_axis, tiled=True)

            # Halo exchange of boundary rows (full d — the activation axis
            # is not sharded; only the bank contraction is).
            send_buf = h_local[send_l[0].reshape(-1)].reshape(
                k_e, halo_width, h_local.shape[1]
            )
            halo = jax.lax.all_to_all(
                send_buf, edge_axis, split_axis=0, concat_axis=0
            )
            rows = jnp.concatenate(
                [h_local, halo.reshape(k_e * halo_width, h_local.shape[1])]
            )
            rows_slice = jax.lax.dynamic_slice_in_dim(
                rows, me_m * din_sh, din_sh, 1
            )

            if contrib == "grouped":
                from graph_hypernetwork_forge_tpu.ops.message_passing import (
                    _ragged_transform,
                )

                gs = gs_l[0]
                part = (
                    _ragged_transform(rows_slice[srch_l], w_msg, gs, prec)
                    + _ragged_transform(rows_slice[local_dst], w_self, gs, prec)
                )
            else:
                hw = jnp.einsum(
                    "nd,udo->uno", rows_slice,
                    jnp.concatenate([w_msg, w_self]), precision=prec,
                )
                u = w_msg.shape[0]
                part = hw[rel_l, srch_l] + hw[rel_l + u, local_dst]
            # ONE activation psum restores the exact d_in contraction.
            contrib_full = jax.lax.psum(part, model_axis)
            contrib_full = (contrib_full + bias[rel_l]) * mask_l[:, None]

            if agg_sorted:
                from graph_hypernetwork_forge_tpu.ops.segment import (
                    sorted_segment_sum_by_plan,
                )

                perm_l, inv_l, dsort_l, splits_l, indeg_l = agg_l
                total = sorted_segment_sum_by_plan(
                    contrib_full, perm_l, inv_l, dsort_l, nodes_per_shard,
                    splits_l[0],
                )
                cnt = jnp.maximum(indeg_l[0], 1.0)[:, None]
            else:
                total = jax.ops.segment_sum(
                    contrib_full, local_dst, num_segments=nodes_per_shard
                )
                cnt = jax.ops.segment_sum(
                    mask_l, local_dst, num_segments=nodes_per_shard
                )
                cnt = jnp.maximum(cnt, 1.0)[:, None]
            h_new = jax.nn.relu(total / cnt + h_local)
            if use_dropout:
                keep = jax.random.bernoulli(
                    drop_key, 1.0 - config.dropout, h_new.shape
                )
                h_new = jnp.where(keep, h_new / (1.0 - config.dropout), 0.0)
            h_local = layer_norm_apply(params["layer_norms"][layer_idx], h_new)
        return h_local

    param_specs = composed_tp_param_specs(config, model_axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            param_specs,
            P(edge_axis, None),   # feats
            P(edge_axis), P(edge_axis), P(edge_axis), P(edge_axis),  # edges
            P(edge_axis, None), P(edge_axis),   # relations (texts)
            P(edge_axis, None, None),           # send_idx
            P(edge_axis, None),                 # ragged group sizes
            (P(edge_axis), P(edge_axis), P(edge_axis),
             P(edge_axis, None), P(edge_axis, None)),  # agg plan
            P(),                  # negative rng
            P(),                  # dropout rng (replicated; folded by edge)
        ),
        out_specs=P(),
        check_vma=False,
    )
    def _loss_shard(params, feats_l, srch_l, dst_l, rel_l, mask_l, chars_l,
                    lens_l, send_l, gs_l, agg_l, neg_rng, drop_rng):
        h_local = forward_local(
            params, feats_l, srch_l, dst_l, rel_l, mask_l, chars_l, lens_l,
            send_l, gs_l, agg_l, drop_rng,
        )
        me_e = jax.lax.axis_index(edge_axis)
        k_e = send_l.shape[1]
        # Fully-local scoring: one more B-row boundary exchange for the
        # positive heads; per-shard rotated tails as negatives (identical
        # discipline to composed.py's local_roll so the 1D/2D losses match
        # exactly given the same rng).
        send_buf = h_local[send_l[0].reshape(-1)].reshape(
            k_e, halo_width, h_local.shape[1]
        )
        halo = jax.lax.all_to_all(
            send_buf, edge_axis, split_axis=0, concat_axis=0
        )
        rows = jnp.concatenate(
            [h_local, halo.reshape(k_e * halo_width, h_local.shape[1])]
        )
        head = rows[srch_l]
        local_dst = dst_l - me_e * nodes_per_shard
        tail = h_local[local_dst]
        cap = dst_l.shape[0]
        shift = jax.random.randint(
            jax.random.fold_in(neg_rng, me_e), (), 1, max(cap, 2)
        )
        neg_tail = jnp.roll(tail, -shift, axis=0)
        pos = jnp.sum(head * tail, axis=-1)
        neg = jnp.sum(head * neg_tail, axis=-1)
        per_edge = jnp.maximum(margin - pos + neg, 0.0) * mask_l
        num = jax.lax.psum(jnp.sum(per_edge), edge_axis)
        den = jax.lax.psum(jnp.sum(mask_l), edge_axis)
        return num / jnp.maximum(den, 1.0)

    @jax.jit
    def step(params, opt_state, feats, src, dst, rel, mask, chars, lens,
             rng, src_halo=None, send_idx=None, rel_group_sizes=None,
             agg_plan=None):
        if src_halo is None or send_idx is None:
            raise ValueError("2D step needs src_halo and send_idx "
                             "(prepare_composed_inputs(halo=True))")
        # Same top-level split as composed.py so 1D and 2D draw identical
        # negatives AND dropout masks from the same step rng.
        neg_rng, drop_rng = jax.random.split(rng)
        if config.dropout <= 0.0:
            drop_rng = None
        k_e = mesh.shape[edge_axis]
        if contrib == "grouped":
            if rel_group_sizes is None:
                raise ValueError("contrib='grouped' needs rel_group_sizes")
        elif rel_group_sizes is None:
            rel_group_sizes = jnp.zeros((k_e, 1), dtype=jnp.int32)
        if agg_sorted:
            if agg_plan is None:
                raise ValueError("agg_sorted=True needs agg_plan")
        elif agg_plan is None:
            z = jnp.zeros((k_e,), dtype=jnp.int32)
            agg_plan = (
                z, z, z, jnp.zeros((k_e, 1), jnp.int32),
                jnp.zeros((k_e, 1), jnp.float32),
            )

        def loss_fn(p):
            return _loss_shard(
                p, feats, src_halo, dst, rel, mask, chars, lens,
                send_idx, rel_group_sizes, agg_plan, neg_rng, drop_rng,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_opt_state, loss

    return step
