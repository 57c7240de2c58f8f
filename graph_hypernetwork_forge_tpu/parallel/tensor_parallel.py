"""Tensor parallelism for the hypernetwork: Megatron-split generator heads
and d_in-sharded weight banks, with per-device memory that actually divides.

The WeightGenerator (reference contract
``/root/reference/graph_hypernetwork_forge/models/weight_generator.py:120-143``)
dominates both parameters and activation memory at large d: each head's
final Linear is ``[hidden, d_in·d_out]`` and the generated banks are
``[U, d_in, d_out]`` per layer — at d=512, U=256 that is 256 MiB per bank
per layer in f32, which must shard to fit a chip alongside gradients.

Layout (one mesh axis, ``"model"``):

- head hidden Linear 1: column-parallel ``[text_dim, hidden/k]`` (bias
  sharded) — activations ``[U, hidden/k]``;
- head hidden Linear 2: row-parallel ``[hidden/k, hidden]`` — one ``psum``
  rebuilds the full activation (Megatron MLP pattern: exactly one
  collective in the middle of the head);
- head final Linear: column-parallel over the flattened output
  ``[hidden, d_in·d_out/k]``. A contiguous 1/k block of the row-major
  flattened ``(d_in, d_out)`` index space is ``d_in/k`` full rows, so the
  reshaped per-device bank shard is ``[U, d_in/k, d_out]`` — the banks are
  sharded on **d_in** and are never materialized whole on any device;
- the ``bias`` head stays replicated (``[U, d_out]`` — negligible next to
  the banks);
- message passing consumes d_in-sharded banks directly: each device
  contracts its ``h[:, d_in-slice]`` against its bank shard and one
  ``psum`` restores the full per-edge contributions — algebraically the
  reference per-edge matmul (``models/hypergnn.py:201-228``) with the
  contraction split across devices.

Exactness and the per-device-bytes division are asserted in
``tests/test_sharding.py::TestTensorParallelGenerator``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_hypernetwork_forge_tpu.models.weight_generator import (
    WeightGeneratorConfig,
)
from graph_hypernetwork_forge_tpu.utils.initializers import resolve_precision


def tp_head_specs(config: WeightGeneratorConfig, axis: str = "model"):
    """PartitionSpecs for one generator head's layer list (num_hidden=2).

    Only the canonical reference topology (two hidden layers) is supported
    in the TP path; other depths fall back to replicated execution.
    """
    if config.num_hidden != 2:
        raise ValueError(
            "TP head split is defined for the reference topology "
            f"num_hidden=2 (got {config.num_hidden})"
        )
    return [
        {"w": P(None, axis), "b": P(axis)},   # column-parallel
        {"w": P(axis, None), "b": P()},       # row-parallel (+psum)
        {"w": P(None, axis), "b": P(axis)},   # column-parallel (output)
    ]


def tp_param_specs(config: WeightGeneratorConfig, axis: str = "model"):
    """Spec pytree mirroring ``init_weight_generator``'s structure.

    The ``bias`` head is replicated: its output is ``[U, d_out]`` and its
    final Linear ``[hidden, d_out]`` — both negligible next to the
    ``d_in·d_out`` matrix heads, and keeping it whole avoids a second
    collective in message passing.
    """
    repl_head = [{"w": P(), "b": P()} for _ in range(config.num_hidden + 1)]
    heads = {
        "W_msg": tp_head_specs(config, axis),
        "W_self": tp_head_specs(config, axis),
        "bias": repl_head,
    }
    return {
        "heads": heads,
        "log_scales": {name: P() for name, _ in config.weight_specs},
    }


def shard_generator_params(params, config, mesh: Mesh, axis: str = "model"):
    """Device-put one generator's params according to :func:`tp_param_specs`."""
    specs = tp_param_specs(config, axis)
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s, _ = jax.tree_util.tree_flatten(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    return treedef.unflatten(
        [
            jax.device_put(a, NamedSharding(mesh, s))
            for a, s in zip(flat_p, flat_s)
        ]
    )


def tp_generate_weights(
    mesh: Mesh,
    config: WeightGeneratorConfig,
    params,
    text_emb: jax.Array,
    *,
    axis: str = "model",
) -> Dict[str, jax.Array]:
    """Generate the weight banks with Megatron-split heads.

    Returns ``{"W_msg": [U, d_in, d_out] sharded P(None, axis, None),
    "W_self": same, "bias": [U, d_out] replicated}`` — the matrix banks
    exist only as ``[U, d_in/k, d_out]`` shards on each device.
    """
    prec = resolve_precision(config.precision)
    d_in, d_out = config.d_in, config.d_out
    in_specs = (tp_param_specs(config, axis), P())
    out_specs = {
        "W_msg": P(None, axis, None),
        "W_self": P(None, axis, None),
        "bias": P(),
    }

    @partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def _gen(p, text):
        k = jax.lax.axis_size(axis)
        out = {}
        for name, shape in config.weight_specs:
            l1, l2, l3 = p["heads"][name]
            x = jax.nn.relu(
                jnp.dot(text, l1["w"], precision=prec) + l1["b"]
            )  # [U, hidden(/k for matrix heads)]
            x = jnp.dot(x, l2["w"], precision=prec)
            if name != "bias":
                x = jax.lax.psum(x, axis)  # row-parallel reduction
            x = jax.nn.relu(x + l2["b"])
            flat = jnp.dot(x, l3["w"], precision=prec) + l3["b"]
            scale = jnp.exp(p["log_scales"][name])
            if name == "bias":
                out[name] = flat.reshape((text.shape[0],) + shape) * scale
            else:
                # Local 1/k block of the row-major flattened (d_in, d_out)
                # space == d_in/k full rows.
                out[name] = (
                    flat.reshape(text.shape[0], d_in // k, d_out) * scale
                )
        return out

    return _gen(params, text_emb)


def tp_message_passing(
    mesh: Mesh,
    h: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    rel_ids: jax.Array,
    weights: Dict[str, jax.Array],
    num_nodes: int,
    *,
    edge_mask: jax.Array = None,
    axis: str = "model",
    precision="highest",
) -> jax.Array:
    """Message passing over d_in-sharded banks (one psum per layer).

    Each device contracts its ``h[:, d_in-slice]`` against its
    ``[U, d_in/k, d_out]`` bank shard (the dense all-relations product of
    ``ops/message_passing.py``'s dense backend, restricted to the slice);
    the psum over ``axis`` restores the exact full contraction before the
    aggregation epilogue. Semantics match reference
    ``models/hypergnn.py:201-230`` (count clamp, averaged W_self,
    isolated-node zero).
    """
    prec = resolve_precision(precision)
    if edge_mask is None:
        edge_mask = jnp.ones(src.shape, h.dtype)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(),
            {"W_msg": P(None, axis, None), "W_self": P(None, axis, None),
             "bias": P()},
        ),
        out_specs=P(),
        check_vma=False,
    )
    def _mp(h, src, dst, rel, mask, w):
        k = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        din_shard = w["W_msg"].shape[1]
        h_slice = jax.lax.dynamic_slice_in_dim(h, me * din_shard, din_shard, 1)
        hw = jnp.einsum(
            "nd,udo->uno", h_slice,
            jnp.concatenate([w["W_msg"], w["W_self"]]), precision=prec,
        )
        hw = jax.lax.psum(hw, axis)  # full contraction restored
        u = w["W_msg"].shape[0]
        msg = (hw[rel, src] + w["bias"][rel]) * mask[:, None]
        selfc = hw[rel + u, dst] * mask[:, None]
        agg = jax.ops.segment_sum(msg, dst, num_segments=num_nodes)
        selft = jax.ops.segment_sum(selfc, dst, num_segments=num_nodes)
        cnt = jax.ops.segment_sum(mask, dst, num_segments=num_nodes)
        cnt = jnp.maximum(cnt, 1.0)[:, None]
        return agg / cnt + selft / cnt

    return _mp(h, src, dst, rel_ids, edge_mask, weights)


def bank_shard_bytes(weights: Dict[str, jax.Array]) -> int:
    """Per-device bytes actually held for the two matrix banks."""
    total = 0
    for name in ("W_msg", "W_self"):
        total += weights[name].addressable_shards[0].data.nbytes
    return total
