"""Weight-transplant harness: torch reference model → JAX param pytree.

Makes allclose parity bitwise-meaningful (SURVEY.md §7.2.2): instead of
comparing distributions, we copy the reference model's trained/initialized
weights into our pytree (transposing torch's ``[out, in]`` Linear storage to
our ``[in, out]`` convention) and assert per-layer numerical agreement.
"""

from __future__ import annotations

import sys

import numpy as np

REFERENCE_PATH = "/root/reference"


def load_reference():
    """Import the torch reference package (read-only mount)."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import graph_hypernetwork_forge as ref  # noqa: F401

    return ref


def _t(x) -> np.ndarray:
    return x.detach().cpu().numpy()


def convert_linear(torch_linear) -> dict:
    """torch ``nn.Linear`` ([out, in] weight) → ``{"w": [in, out], "b": [out]}``."""
    return {"w": _t(torch_linear.weight).T.copy(), "b": _t(torch_linear.bias).copy()}


def convert_text_encoder(torch_enc) -> dict:
    return {
        "char_emb": _t(torch_enc.char_emb.weight).copy(),
        "proj": convert_linear(torch_enc.proj[0]),
    }


def convert_weight_generator(torch_gen) -> dict:
    import torch.nn as nn

    params: dict = {"heads": {}, "log_scales": {}}
    for name, _shape in torch_gen._weight_specs:
        seq = torch_gen.generators[name]
        linears = [m for m in seq.modules() if isinstance(m, nn.Linear)]
        params["heads"][name] = [convert_linear(m) for m in linears]
        params["log_scales"][name] = _t(torch_gen.log_scales[name]).copy()
    return params


def convert_layer_norm(torch_ln) -> dict:
    return {"g": _t(torch_ln.weight).copy(), "b": _t(torch_ln.bias).copy()}


def convert_hypergnn(torch_model) -> dict:
    return {
        "text_encoder": convert_text_encoder(torch_model.text_encoder),
        "input_proj": convert_linear(torch_model.input_proj),
        "weight_generators": [
            convert_weight_generator(g) for g in torch_model.weight_generators
        ],
        "layer_norms": [convert_layer_norm(n) for n in torch_model.layer_norms],
    }


def reference_per_layer_outputs(torch_model, node_features, edge_index, edge_texts):
    """Run the reference forward capturing each post-LayerNorm output via hooks."""
    import torch

    captured = []
    hooks = [
        norm.register_forward_hook(
            lambda _m, _inp, out: captured.append(_t(out).copy())
        )
        for norm in torch_model.layer_norms
    ]
    try:
        torch_model.eval()
        with torch.no_grad():
            final = torch_model(node_features, edge_index, edge_texts)
    finally:
        for h in hooks:
            h.remove()
    return [np.asarray(c) for c in captured], _t(final)
