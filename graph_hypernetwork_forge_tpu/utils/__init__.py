"""Utility layer: initializers, tree helpers, rng, padding."""

from graph_hypernetwork_forge_tpu.utils.initializers import (
    embedding_params,
    layer_norm_apply,
    layer_norm_params,
    linear_apply,
    linear_params,
    linear_params_normal,
    resolve_precision,
)
from graph_hypernetwork_forge_tpu.utils.shapes import round_up_to_multiple

__all__ = [
    "embedding_params",
    "layer_norm_apply",
    "layer_norm_params",
    "linear_apply",
    "linear_params",
    "linear_params_normal",
    "resolve_precision",
    "round_up_to_multiple",
]
