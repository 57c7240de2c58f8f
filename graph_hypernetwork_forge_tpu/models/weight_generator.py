"""WeightGenerator: text embedding → one GNN layer's weight matrices.

Capability parity with reference ``models/weight_generator.py:33-143``:
three independent MLP heads (one each for ``W_msg [d_in, d_out]``,
``W_self [d_in, d_out]``, ``bias [d_out]``), each
``[Linear → ReLU (→ Dropout)] × num_hidden → Linear``, with

- the final Linear of each head initialized ``N(0, 0.01)`` weight / zero
  bias (reference ``:109-114``),
- a learnable per-head scalar scale stored in log-space, initialized to
  ``log(init_scale)`` and applied as ``exp(log_scale)`` on the reshaped
  output (reference ``:85-88,139-140``),
- the batched/unbatched dual contract: ``[text_dim] → unbatched`` shapes,
  ``[B, text_dim] → batched`` shapes (reference ``:132-141``),
- ``ValueError`` on non-positive ``text_dim``/``d_in``/``d_out``
  (reference ``:62-63``).

Parameter count is independent of the number of relation types — relations
enter only through the input embedding.

TPU-first: the whole generator is a stack of ``[B, ·]`` batched matmuls that
XLA fuses onto the MXU; for U unique relations the full ``[U, d_in, d_out]``
weight bank is produced in one shot and *stays at relation granularity*
(never gathered out to per-edge tensors; see ``ops/message_passing.py``).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from graph_hypernetwork_forge_tpu.utils.initializers import (
    linear_apply,
    linear_params,
    linear_params_normal,
)


@dataclasses.dataclass(frozen=True)
class WeightGeneratorConfig:
    text_dim: int
    d_in: int
    d_out: int
    hidden_dim: int = 128
    num_hidden: int = 2
    dropout: float = 0.0
    init_scale: float = 0.01
    precision: str = "highest"

    def __post_init__(self):
        if self.text_dim <= 0 or self.d_in <= 0 or self.d_out <= 0:
            raise ValueError("text_dim, d_in, d_out must all be positive integers")

    @property
    def weight_specs(self) -> Tuple[Tuple[str, Tuple[int, ...]], ...]:
        return (
            ("W_msg", (self.d_in, self.d_out)),
            ("W_self", (self.d_in, self.d_out)),
            ("bias", (self.d_out,)),
        )


def init_weight_generator(config: WeightGeneratorConfig, key: jax.Array) -> dict:
    params: dict = {"heads": {}, "log_scales": {}}
    keys = jax.random.split(key, len(config.weight_specs))
    for (name, shape), head_key in zip(config.weight_specs, keys):
        n_out = math.prod(shape)
        layer_keys = jax.random.split(head_key, config.num_hidden + 1)
        layers = []
        prev = config.text_dim
        for i in range(config.num_hidden):
            layers.append(linear_params(layer_keys[i], prev, config.hidden_dim))
            prev = config.hidden_dim
        # Final head: small init so generated weights start near zero.
        layers.append(linear_params_normal(layer_keys[-1], prev, n_out, std=0.01))
        params["heads"][name] = layers
        params["log_scales"][name] = jnp.full(
            (1,), math.log(config.init_scale), dtype=jnp.float32
        )
    return params


def apply_weight_generator(
    config: WeightGeneratorConfig,
    params: dict,
    text_emb: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Generate ``{"W_msg": [B, d_in, d_out], "W_self": ..., "bias": [B, d_out]}``.

    Accepts ``[text_dim]`` (returns unbatched) or ``[B, text_dim]``.
    Dropout between hidden layers is active only when ``train`` and
    ``config.dropout > 0`` (torch ``nn.Dropout`` training-mode semantics).
    """
    single = text_emb.ndim == 1
    if single:
        text_emb = text_emb[None, :]

    use_dropout = train and config.dropout > 0.0
    if use_dropout and rng is None:
        raise ValueError("dropout requires an rng key in training mode")

    from graph_hypernetwork_forge_tpu.utils.initializers import resolve_precision

    prec = resolve_precision(config.precision)
    out: Dict[str, jax.Array] = {}
    for name, shape in config.weight_specs:
        x = text_emb
        layers = params["heads"][name]
        for i in range(config.num_hidden):
            x = jax.nn.relu(linear_apply(layers[i], x, precision=prec))
            if use_dropout:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - config.dropout, x.shape)
                x = jnp.where(keep, x / (1.0 - config.dropout), 0.0)
        flat = linear_apply(layers[-1], x, precision=prec)  # [B, prod(shape)]
        scale = jnp.exp(params["log_scales"][name])  # [1]
        w = flat.reshape((x.shape[0],) + shape) * scale
        out[name] = w[0] if single else w
    return out


@partial(jax.jit, static_argnames=("config",))
def _apply_eval_jit(config, params, text_emb):
    return apply_weight_generator(config, params, text_emb, train=False)


class WeightGenerator:
    """Stateful convenience wrapper (reference API:
    ``models/weight_generator.py:120-143``)."""

    def __init__(
        self,
        text_dim: int,
        d_in: int,
        d_out: int,
        hidden_dim: int = 128,
        num_hidden: int = 2,
        dropout: float = 0.0,
        init_scale: float = 0.01,
        *,
        key: Optional[jax.Array] = None,
    ) -> None:
        self.config = WeightGeneratorConfig(
            text_dim=text_dim,
            d_in=d_in,
            d_out=d_out,
            hidden_dim=hidden_dim,
            num_hidden=num_hidden,
            dropout=dropout,
            init_scale=init_scale,
        )
        self.text_dim = text_dim
        self.d_in = d_in
        self.d_out = d_out
        self.init_scale = init_scale
        if key is None:
            from graph_hypernetwork_forge_tpu.models.text_encoder import _fresh_key

            key = _fresh_key()
        self.params = init_weight_generator(self.config, key)

    def __call__(
        self,
        text_emb: jax.Array,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        text_emb = jnp.asarray(text_emb)
        if train and self.config.dropout > 0.0:
            return apply_weight_generator(
                self.config, self.params, text_emb, train=True, rng=rng
            )
        return _apply_eval_jit(self.config, self.params, text_emb)

    def num_parameters(self) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(self.params))
