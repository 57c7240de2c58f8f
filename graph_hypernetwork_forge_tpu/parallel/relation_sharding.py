"""Relation sharding: the hypernetwork's expert-parallel axis.

The unique-relation set U is the "expert" axis of a text-conditioned
hypernetwork (SURVEY.md §2.3): text encoding and weight generation cost
O(U · MLP) and are embarrassingly parallel over U. Here the padded relation
arrays are sharded across a mesh axis; each device encodes its U/k relation
texts and generates its slice of the ``[U, d_in, d_out]`` weight banks, then
an ``all_gather`` over ICI assembles the full banks for message passing.

Exactness: per-relation computation is independent, so the gathered banks
are bitwise identical to single-device generation (tested).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from graph_hypernetwork_forge_tpu.models.text_encoder import apply_text_encoder
from graph_hypernetwork_forge_tpu.models.weight_generator import (
    WeightGeneratorConfig,
    apply_weight_generator,
)


def relation_sharded_generate(
    mesh: Mesh,
    wg_config: WeightGeneratorConfig,
    text_encoder_params: dict,
    weight_generator_params: dict,
    char_ids: jax.Array,
    lengths: jax.Array,
    *,
    axis: str = "model",
    precision: str = "highest",
) -> Dict[str, jax.Array]:
    """Encode texts + generate weight banks with U sharded over ``axis``.

    ``char_ids [U_pad, L]`` / ``lengths [U_pad]`` must have ``U_pad``
    divisible by the axis size (the encoding pads U to a multiple of 8).
    Returns replicated ``{"W_msg": [U, d, d], "W_self": ..., "bias": ...}``.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def _shard_fn(te_params, wg_params, char_ids, lengths):
        text_embs = apply_text_encoder(
            te_params, char_ids, lengths, precision=precision
        )  # [U/k, text_dim]
        local = apply_weight_generator(wg_config, wg_params, text_embs)
        # Assemble the full banks over ICI; tiled=True concatenates along
        # the leading (relation) axis.
        return {
            k: jax.lax.all_gather(v, axis, tiled=True) for k, v in local.items()
        }

    return _shard_fn(text_encoder_params, weight_generator_params, char_ids, lengths)
