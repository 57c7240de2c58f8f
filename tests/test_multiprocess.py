"""Simulated multi-host test: 2 processes × 2 CPU devices over gloo.

The DCN-analogue of the multi-host story (SURVEY.md §5.8) without a
cluster: two OS processes each initialize ``jax.distributed`` against a
localhost coordinator, form one global 4-device mesh, and run the
edge-partitioned message passing collectively. Both processes must produce
the single-device result exactly.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiprocess_worker.py")


@pytest.mark.slow
def test_two_process_edge_partition_matches_single_device(tmp_path):
    port = 19741
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                WORKER,
                f"localhost:{port}",
                "2",
                str(i),
                str(tmp_path),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-2000:]}"

    a = np.load(tmp_path / "out_0.npy")
    b = np.load(tmp_path / "out_1.npy")
    np.testing.assert_array_equal(a, b)

    # Single-device oracle with the same seeded inputs as the worker.
    import jax.numpy as jnp

    from graph_hypernetwork_forge_tpu.ops.message_passing import (
        relational_message_passing,
    )

    rng = np.random.default_rng(0)
    n, e, u, d = 16, 64, 4, 8
    h = rng.standard_normal((n, d)).astype(np.float32)
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    rel = rng.integers(0, u, size=e).astype(np.int32)
    w_msg = 0.1 * rng.standard_normal((u, d, d)).astype(np.float32)
    w_self = 0.1 * rng.standard_normal((u, d, d)).astype(np.float32)
    bias = 0.1 * rng.standard_normal((u, d)).astype(np.float32)
    want = relational_message_passing(
        jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
        jnp.asarray(w_msg), jnp.asarray(w_self), jnp.asarray(bias),
        backend="dense",
    )
    np.testing.assert_allclose(a, np.asarray(want), atol=1e-5, rtol=1e-5)
