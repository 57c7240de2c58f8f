"""Tests for auxiliary subsystems: evaluate, checkpoint, metrics, profiling."""

import os

import jax
import numpy as np

from graph_hypernetwork_forge_tpu.training.evaluate import evaluate_link_prediction
from graph_hypernetwork_forge_tpu.utils.metrics import (
    JsonlWriter,
    MetricsLogger,
    Throughput,
)
from graph_hypernetwork_forge_tpu.utils.profiling import PhaseTimer


class TestEvaluate:
    def test_perfect_embeddings_give_mrr_1(self):
        # Orthogonal embeddings: each src points exactly at its dst.
        n, d = 6, 6
        embs = np.eye(n, d, dtype=np.float32)
        src = np.asarray([0, 1, 2])
        # score(s, v) = embs[s]·embs[v] = 1 iff v == s. Make dst = src so the
        # true tail is the argmax.
        metrics = evaluate_link_prediction(embs, src, src)
        assert metrics["mrr"] == 1.0
        assert metrics["hits@1"] == 1.0

    def test_worst_case_rank(self):
        n = 4
        embs = np.eye(n, dtype=np.float32)
        src = np.asarray([0])
        dst = np.asarray([1])  # score 0, ties with nodes 2, 3
        metrics = evaluate_link_prediction(embs, src, dst)
        assert metrics["mrr"] < 0.5

    def test_filtered_protocol(self):
        n = 4
        embs = np.asarray(
            [[1, 0], [0.9, 0], [0.8, 0], [0, 1]], dtype=np.float32
        )
        src = np.asarray([0])
        dst = np.asarray([2])
        unfiltered = evaluate_link_prediction(embs, src, dst)
        # Filter out node 1 (a known positive) — rank improves.
        filt = np.asarray([[0, 0], [1, 2]])
        filtered = evaluate_link_prediction(embs, src, dst, filter_edges=filt)
        assert filtered["mrr"] > unfiltered["mrr"]


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        import optax

        from graph_hypernetwork_forge_tpu.models.hypergnn import (
            HyperGNNConfig,
            init_hypergnn,
        )
        from graph_hypernetwork_forge_tpu.training.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
            save_checkpoint,
        )

        config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16)
        params = init_hypergnn(config, jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        path = save_checkpoint(str(tmp_path), params, opt_state, step=7)
        assert latest_checkpoint(str(tmp_path)) == path

        fresh = init_hypergnn(config, jax.random.PRNGKey(1))
        restored = restore_checkpoint(path, fresh, opt.init(fresh))
        assert restored["step"] == 7
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(restored["params"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_of_many(self, tmp_path):
        from graph_hypernetwork_forge_tpu.models.hypergnn import (
            HyperGNNConfig,
            init_hypergnn,
        )
        from graph_hypernetwork_forge_tpu.training.checkpoint import (
            latest_checkpoint,
            save_checkpoint,
        )

        config = HyperGNNConfig(text_dim=16, node_feat_dim=8, hidden_dim=16)
        params = init_hypergnn(config, jax.random.PRNGKey(0))
        save_checkpoint(str(tmp_path), params, step=1)
        p10 = save_checkpoint(str(tmp_path), params, step=10)
        save_checkpoint(str(tmp_path), params, step=2)
        assert latest_checkpoint(str(tmp_path)) == p10

    def test_async_saves_overlap_then_commit(self, tmp_path):
        """Queue several saves WITHOUT waiting (training would overlap
        them); the explicit barrier makes all of them durable, and the
        latest restores bit-exact."""
        import jax.numpy as jnp

        from graph_hypernetwork_forge_tpu.training.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
            save_checkpoint,
            wait_for_checkpoints,
        )

        w = jnp.arange(512 * 512, dtype=jnp.float32).reshape(512, 512)
        paths = [
            save_checkpoint(str(tmp_path), {"w": w * s}, step=s)
            for s in (1, 2, 3)  # returns immediately; writes run in bg
        ]
        wait_for_checkpoints()
        assert latest_checkpoint(str(tmp_path)) == paths[-1]
        restored = restore_checkpoint(
            paths[-1], {"w": jnp.zeros((512, 512), jnp.float32)}
        )
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.asarray(w * 3)
        )


class TestMetrics:
    def test_history_and_jsonl(self, tmp_path):
        path = os.path.join(str(tmp_path), "m.jsonl")
        w = JsonlWriter(path)
        logger = MetricsLogger([w])
        logger.log(0, loss=1.5, edges_per_s=100.0)
        logger.log(1, loss=1.2, edges_per_s=120.0)
        w.close()
        assert len(logger.history.history) == 2
        assert logger.history.history[1]["loss"] == 1.2
        with open(path) as fh:
            lines = fh.read().strip().splitlines()
        assert len(lines) == 2

    def test_throughput(self):
        t = Throughput()
        t.start()
        t.add(1000)
        assert t.rate() > 0


class TestPhaseTimer:
    def test_phases_accumulate(self):
        import jax.numpy as jnp

        timer = PhaseTimer()
        with timer.phase("fwd") as slot:
            slot["out"] = jnp.ones((8, 8)) * 2
        with timer.phase("fwd"):
            pass
        assert timer.counts["fwd"] == 2
        assert timer.totals["fwd"] > 0
        assert "fwd" in timer.report()


class TestEvaluateChunked:
    """The chunked + CSR-filtered evaluator must equal a brute-force oracle."""

    def test_chunked_filtered_matches_bruteforce(self):
        rng = np.random.default_rng(42)
        n, b, ek = 57, 301, 400
        embs = rng.standard_normal((n, 8)).astype(np.float32)
        src = rng.integers(0, n, b)
        dst = rng.integers(0, n, b)
        filt = np.stack([rng.integers(0, n, ek), rng.integers(0, n, ek)])

        # chunk_size < b exercises multi-chunk + padded-last-chunk paths.
        got = evaluate_link_prediction(
            embs, src, dst, filter_edges=filt, chunk_size=64
        )

        # Brute-force oracle (dense, python loops — the r1 implementation).
        scores = embs @ embs.T
        by_src = {}
        for s, t in zip(filt[0], filt[1]):
            by_src.setdefault(int(s), set()).add(int(t))
        ranks = []
        for s, t in zip(src, dst):
            row = scores[s].copy()
            true = row[t]
            for tt in by_src.get(int(s), ()):  # noqa: E501
                if tt != t:
                    row[tt] = -np.inf
            better = np.sum(row > true)
            ties = np.sum(row == true) - 1
            ranks.append(1.0 + better + 0.5 * max(ties, 0))
        ranks = np.asarray(ranks)
        assert abs(got["mrr"] - float(np.mean(1.0 / ranks))) < 1e-6
        for k in (1, 3, 10):
            assert abs(got[f"hits@{k}"] - float(np.mean(ranks <= k))) < 1e-6

    def test_chunked_unfiltered_matches(self):
        rng = np.random.default_rng(7)
        n, b = 33, 150
        embs = rng.standard_normal((n, 4)).astype(np.float32)
        src = rng.integers(0, n, b)
        dst = rng.integers(0, n, b)
        a = evaluate_link_prediction(embs, src, dst, chunk_size=32)
        bfull = evaluate_link_prediction(embs, src, dst, chunk_size=4096)
        assert abs(a["mrr"] - bfull["mrr"]) < 1e-9
