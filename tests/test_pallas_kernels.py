"""Pallas kernel tests (interpret mode on CPU; compiled on TPU).

Each kernel is validated against its jnp reference implementation, including
the custom VJP — the property tests the build plan requires for every kernel
(SURVEY.md §7.2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hypernetwork_forge_tpu.ops.pallas.edge_transform import (
    edge_contributions_pallas,
    edge_transform_sorted,
)
from graph_hypernetwork_forge_tpu.ops.message_passing import (
    _edge_contributions_gather,
)

INTERPRET = jax.default_backend() != "tpu"


def make_case(seed=0, n=64, e=512, u=7, d_in=16, d_out=16, sorted_rel=True):
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n, d_in)).astype(np.float32)
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    rel = rng.integers(0, u, size=e).astype(np.int32)
    if sorted_rel:
        rel = np.sort(rel)
    w_msg = 0.1 * rng.standard_normal((u, d_in, d_out)).astype(np.float32)
    w_self = 0.1 * rng.standard_normal((u, d_in, d_out)).astype(np.float32)
    bias = 0.1 * rng.standard_normal((u, d_out)).astype(np.float32)
    return h, src, dst, rel, w_msg, w_self, bias


class TestEdgeTransformSorted:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_reference(self, seed):
        h, src, dst, rel, w_msg, w_self, bias = make_case(seed)
        x_src = jnp.asarray(h[src])
        x_dst = jnp.asarray(h[dst])
        got_msg, got_selfc = edge_transform_sorted(
            x_src, x_dst, jnp.asarray(rel), jnp.asarray(w_msg),
            jnp.asarray(w_self), jnp.asarray(bias), 128, INTERPRET,
        )
        want_msg, want_selfc = _edge_contributions_gather(
            jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
            jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
            jax.lax.Precision.HIGHEST,
        )
        np.testing.assert_allclose(
            np.asarray(got_msg), np.asarray(want_msg), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_selfc), np.asarray(want_selfc), atol=1e-5, rtol=1e-5
        )

    def test_ragged_edge_count(self):
        """E not a multiple of the tile size pads internally."""
        h, src, dst, rel, w_msg, w_self, bias = make_case(2, e=300)
        got_msg, _ = edge_transform_sorted(
            jnp.asarray(h[src]), jnp.asarray(h[dst]), jnp.asarray(rel),
            jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
            128, INTERPRET,
        )
        assert got_msg.shape == (300, 16)

    def test_vjp_matches_reference(self):
        h, src, dst, rel, w_msg, w_self, bias = make_case(3, e=256)
        x_src = jnp.asarray(h[src])
        x_dst = jnp.asarray(h[dst])
        args = (x_src, x_dst, jnp.asarray(w_msg), jnp.asarray(w_self),
                jnp.asarray(bias))

        def loss_pallas(x_src, x_dst, w_msg, w_self, bias):
            m, s = edge_transform_sorted(
                x_src, x_dst, jnp.asarray(rel), w_msg, w_self, bias,
                128, INTERPRET,
            )
            return jnp.sum(m * m) + jnp.sum(s)

        def loss_ref(x_src, x_dst, w_msg, w_self, bias):
            m = (
                jnp.einsum("ed,edo->eo", x_src, w_msg[rel],
                           precision=jax.lax.Precision.HIGHEST)
                + bias[rel]
            )
            s = jnp.einsum("ed,edo->eo", x_dst, w_self[rel],
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(m * m) + jnp.sum(s)

        got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=2e-4, rtol=1e-4
            )


class TestEdgeContributionsPallas:
    def test_unsorted_wrapper_matches(self):
        h, src, dst, rel, w_msg, w_self, bias = make_case(4, sorted_rel=False)
        got_msg, got_selfc = edge_contributions_pallas(
            jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
            jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
            tile_e=128, interpret=INTERPRET,
        )
        want_msg, want_selfc = _edge_contributions_gather(
            jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
            jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
            jax.lax.Precision.HIGHEST,
        )
        np.testing.assert_allclose(
            np.asarray(got_msg), np.asarray(want_msg), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_selfc), np.asarray(want_selfc), atol=1e-5, rtol=1e-5
        )
