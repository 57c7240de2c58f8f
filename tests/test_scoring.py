"""Scoring ops: pair/candidate-set/all-tails consistency."""

import jax.numpy as jnp
import numpy as np

from graph_hypernetwork_forge_tpu.ops.scoring import (
    score_all_tails,
    score_candidate_sets,
    score_pairs,
)


def setup():
    rng = np.random.default_rng(0)
    embs = rng.standard_normal((20, 8)).astype(np.float32)
    src = rng.integers(0, 20, size=6).astype(np.int32)
    cands = rng.integers(0, 20, size=(6, 5)).astype(np.int32)
    return jnp.asarray(embs), jnp.asarray(src), jnp.asarray(cands)


class TestScoring:
    def test_candidate_sets_match_pairs(self):
        embs, src, cands = setup()
        got = np.asarray(score_candidate_sets(embs, src, cands))
        for i in range(src.shape[0]):
            for j in range(cands.shape[1]):
                want = float(score_pairs(embs[src[i]], embs[cands[i, j]]))
                assert abs(got[i, j] - want) < 1e-5

    def test_all_tails_match_candidate_sets(self):
        embs, src, _ = setup()
        all_scores = np.asarray(score_all_tails(embs, src))
        cands = jnp.tile(jnp.arange(20, dtype=jnp.int32)[None, :], (src.shape[0], 1))
        got = np.asarray(score_candidate_sets(embs, src, cands))
        np.testing.assert_allclose(got, all_scores, atol=1e-5, rtol=1e-5)

    def test_pair_shapes(self):
        embs, src, _ = setup()
        s = score_pairs(embs[0], embs[1])
        assert s.shape == ()
        s2 = score_pairs(embs[:4], embs[4:8])
        assert s2.shape == (4,)
