"""Parameter initializers matching the reference's torch defaults.

The reference relies on ``torch.nn.Linear`` / ``torch.nn.Embedding`` default
initialization (reference: ``models/hypergnn.py:60-64,136``), i.e.

- Linear:    weight, bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
- Embedding: weight ~ N(0, 1)

plus the WeightGenerator's custom last-layer init
(``models/weight_generator.py:109-114``): weight ~ N(0, 0.01), bias = 0.

We reproduce the *distributions* (not the torch RNG streams — bitwise parity
with a specific torch model is achieved by weight transplant in the test
harness instead, see ``tests/parity_utils.py``).

Convention: JAX linears compute ``x @ w + b`` with ``w`` of shape
``[d_in, d_out]`` (transpose of torch's ``[out, in]`` storage).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def resolve_precision(precision):
    """Map a config string to ``jax.lax.Precision``.

    ``"highest"`` → f32-exact (6-pass bf16 emulation on the TPU MXU; required
    for reference-parity numerics). ``"default"``/``None`` → hardware-native
    bf16-class matmul, the TPU speed mode.
    """
    if precision is None or precision == "default":
        return None
    if isinstance(precision, str):
        return {
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
        }[precision]
    return precision


def linear_params(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> dict:
    """Torch-default Linear init: U(-k, k) with k = 1/sqrt(d_in)."""
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(k_w, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(k_b, (d_out,), dtype, -bound, bound),
    }


def linear_params_normal(
    key: jax.Array, d_in: int, d_out: int, std: float, dtype=jnp.float32
) -> dict:
    """Normal(0, std) weight with zero bias (WeightGenerator head init)."""
    return {
        "w": std * jax.random.normal(key, (d_in, d_out), dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def embedding_params(
    key: jax.Array, vocab_size: int, dim: int, dtype=jnp.float32
) -> jax.Array:
    """Torch-default Embedding init: N(0, 1)."""
    return jax.random.normal(key, (vocab_size, dim), dtype)


def layer_norm_params(dim: int, dtype=jnp.float32) -> dict:
    """Torch-default LayerNorm init: scale 1, bias 0."""
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def linear_apply(params: dict, x: jax.Array, precision=None) -> jax.Array:
    """``x @ w + b``. ``precision`` follows ``jax.lax.Precision`` — pass
    ``"highest"`` for f32-exact parity numerics (this JAX build's default
    matmul precision is bf16-class even on f32 inputs)."""
    return jnp.dot(x, params["w"], precision=precision) + params["b"]


def layer_norm_apply(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis with torch semantics (biased variance,
    eps inside the sqrt; reference uses ``nn.LayerNorm`` at
    ``models/hypergnn.py:152-154``)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return normed * params["g"] + params["b"]
