"""WeightGenerator behavioral contract (mirrors reference
tests/test_weight_generator.py, all 16 tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graph_hypernetwork_forge_tpu import WeightGenerator
from graph_hypernetwork_forge_tpu.models.weight_generator import (
    WeightGeneratorConfig,
    apply_weight_generator,
    init_weight_generator,
)


def randn(*shape):
    return np.random.default_rng(abs(hash(shape)) % 2**31).standard_normal(
        shape
    ).astype(np.float32)


class TestWeightGeneratorShapes:
    def test_single_input_shapes(self, weight_gen):
        out = weight_gen(randn(32))
        assert set(out) == {"W_msg", "W_self", "bias"}
        assert out["W_msg"].shape == (16, 16)
        assert out["W_self"].shape == (16, 16)
        assert out["bias"].shape == (16,)

    def test_batched_input_shapes(self, weight_gen):
        out = weight_gen(randn(5, 32))
        assert out["W_msg"].shape == (5, 16, 16)
        assert out["W_self"].shape == (5, 16, 16)
        assert out["bias"].shape == (5, 16)

    def test_batch_size_1(self, weight_gen):
        out = weight_gen(randn(1, 32))
        assert out["W_msg"].shape == (1, 16, 16)

    def test_non_square_weights(self):
        gen = WeightGenerator(text_dim=32, d_in=8, d_out=24, hidden_dim=64)
        out = gen(randn(32))
        assert out["W_msg"].shape == (8, 24)
        assert out["W_self"].shape == (8, 24)
        assert out["bias"].shape == (24,)

    def test_batched_non_square(self):
        gen = WeightGenerator(text_dim=16, d_in=4, d_out=8, hidden_dim=32)
        out = gen(randn(3, 16))
        assert out["W_msg"].shape == (3, 4, 8)


class TestWeightGeneratorDeterminism:
    def test_deterministic_eval(self, weight_gen):
        emb = randn(32)
        out1 = weight_gen(emb)
        out2 = weight_gen(emb)
        for k in out1:
            np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out2[k]))

    def test_different_inputs_different_outputs(self, weight_gen):
        out1 = weight_gen(randn(32))
        out2 = weight_gen(randn(2, 32)[1])
        assert not np.allclose(np.asarray(out1["W_msg"]), np.asarray(out2["W_msg"]))


class TestWeightGeneratorGradients:
    def test_gradients_flow(self, weight_gen):
        emb = jnp.asarray(randn(32))

        def loss(e):
            out = apply_weight_generator(weight_gen.config, weight_gen.params, e)
            return sum(jnp.sum(v) for v in out.values())

        g = jax.grad(loss)(emb)
        assert g.shape == emb.shape
        assert bool(jnp.any(g != 0))

    def test_log_scales_are_parameters(self, weight_gen):
        assert len(weight_gen.params["log_scales"]) == 3
        for v in weight_gen.params["log_scales"].values():
            assert v.shape == (1,)

    def test_scales_appear_in_optimizer(self, weight_gen):
        opt = optax.adam(1e-3)
        params = weight_gen.params
        opt_state = opt.init(params)
        emb = jnp.asarray(randn(32))

        def loss(p):
            out = apply_weight_generator(weight_gen.config, p, emb)
            return sum(jnp.sum(v) for v in out.values())

        grads = jax.grad(loss)(params)
        updates, _ = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        for name in params["log_scales"]:
            assert not np.allclose(
                np.asarray(params["log_scales"][name]),
                np.asarray(new_params["log_scales"][name]),
            )


class TestWeightGeneratorConstruction:
    def test_basic_construction(self):
        gen = WeightGenerator(text_dim=64, d_in=32, d_out=32)
        assert gen.text_dim == 64
        assert gen.d_in == 32
        assert gen.d_out == 32

    def test_invalid_dims_raise(self):
        with pytest.raises(ValueError):
            WeightGenerator(text_dim=0, d_in=32, d_out=32)
        with pytest.raises(ValueError):
            WeightGenerator(text_dim=32, d_in=0, d_out=32)
        with pytest.raises(ValueError):
            WeightGenerator(text_dim=32, d_in=32, d_out=-1)

    def test_custom_hidden_dim(self):
        gen = WeightGenerator(text_dim=32, d_in=8, d_out=8, hidden_dim=256)
        out = gen(randn(32))
        assert out["W_msg"].shape == (8, 8)

    def test_no_hidden_layers(self):
        gen = WeightGenerator(text_dim=32, d_in=8, d_out=8, num_hidden=0, hidden_dim=64)
        out = gen(randn(32))
        assert out["W_msg"].shape == (8, 8)


class TestWeightGeneratorScale:
    def test_small_init_scale_gives_small_outputs(self):
        gen = WeightGenerator(text_dim=32, d_in=8, d_out=8, init_scale=1e-4)
        out = gen(randn(32))
        assert float(jnp.max(jnp.abs(out["W_msg"]))) < 1.0


class TestWeightGeneratorDropout:
    def test_dropout_stochastic_in_train_deterministic_in_eval(self):
        cfg = WeightGeneratorConfig(
            text_dim=16, d_in=8, d_out=8, hidden_dim=32, dropout=0.5
        )
        params = init_weight_generator(cfg, jax.random.PRNGKey(0))
        emb = jnp.asarray(randn(16))
        e1 = apply_weight_generator(cfg, params, emb, train=False)
        e2 = apply_weight_generator(cfg, params, emb, train=False)
        np.testing.assert_allclose(np.asarray(e1["W_msg"]), np.asarray(e2["W_msg"]))
        t1 = apply_weight_generator(
            cfg, params, emb, train=True, rng=jax.random.PRNGKey(1)
        )
        t2 = apply_weight_generator(
            cfg, params, emb, train=True, rng=jax.random.PRNGKey(2)
        )
        assert not np.allclose(np.asarray(t1["W_msg"]), np.asarray(t2["W_msg"]))

    def test_dropout_requires_rng(self):
        cfg = WeightGeneratorConfig(
            text_dim=16, d_in=8, d_out=8, hidden_dim=32, dropout=0.5
        )
        params = init_weight_generator(cfg, jax.random.PRNGKey(0))
        with pytest.raises(ValueError):
            apply_weight_generator(cfg, params, jnp.asarray(randn(16)), train=True)
