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
COMPOSED_WORKER = os.path.join(
    REPO, "tests", "multiprocess_composed_worker.py"
)


def _launch(worker, port, extra, timeout=240, expect_fail=False):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"localhost:{port}", "2", str(i), *extra],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs, codes = [], []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()  # exact PID of a process we started
            out, _ = p.communicate()
        outs.append(out.decode())
        codes.append(p.returncode)
    if not expect_fail:
        for i, c in enumerate(codes):
            assert c == 0, f"worker {i} failed:\n{outs[i][-2000:]}"
    return outs, codes


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


def _composed_oracle(num_steps=6):
    """Single-process 4-virtual-device run of the identical trajectory."""
    import jax
    import jax.numpy as jnp
    import optax

    from graph_hypernetwork_forge_tpu.parallel.composed import (
        make_composed_train_step,
        prepare_composed_inputs,
    )
    from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh
    from tests_shared_composed_case import build_case

    graph, feats, config, params = build_case()
    mesh = make_mesh((4,), ("edge",), devices=jax.devices()[:4])
    inputs = prepare_composed_inputs(graph, feats, 4, halo=True)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
    )
    arrays = tuple(
        jnp.asarray(a) for a in (
            inputs.feats, inputs.src, inputs.dst, inputs.rel_ids,
            inputs.edge_mask, inputs.char_ids, inputs.lengths,
        )
    )
    base = jax.random.PRNGKey(7)
    losses = []
    for s in range(num_steps):
        sr = jax.random.fold_in(base, s)
        params, opt_state, loss = step(
            params, opt_state, *arrays, sr,
            src_halo=jnp.asarray(inputs.src_halo),
            send_idx=jnp.asarray(inputs.send_idx),
        )
        losses.append(float(loss))
    return losses, [
        np.asarray(a) for a in jax.tree_util.tree_leaves(params)
    ]


@pytest.mark.slow
def test_two_process_composed_training_matches_single_process(tmp_path):
    """The full composed train step (halo + local scoring + Adam) crosses a
    REAL process boundary (2 procs x 2 devices, gloo) and reproduces the
    single-process trajectory."""
    outs, _ = _launch(COMPOSED_WORKER, 19761, [str(tmp_path), "train"])
    a = np.load(tmp_path / "out_0_train.npz")
    b = np.load(tmp_path / "out_1_train.npz")
    np.testing.assert_array_equal(a["losses"], b["losses"])
    want_losses, want_params = _composed_oracle()
    np.testing.assert_allclose(a["losses"], want_losses, atol=1e-5)
    for i, w in enumerate(want_params):
        np.testing.assert_allclose(a[f"p{i}"], w, atol=1e-4)


@pytest.mark.slow
def test_host_drop_mid_training_recovers_from_checkpoint(tmp_path):
    """Fault injection (SURVEY.md 5.3): process 1 dies at step 3; the
    restarted gang restores the step-2 checkpoint and the recovered
    trajectory is identical to an uninterrupted run."""
    # Phase 1: the crashing run. Process 1 exits 7 by design; process 0
    # fails or hangs on the orphaned collective and is reaped.
    outs, codes = _launch(
        COMPOSED_WORKER, 19771, [str(tmp_path), "crash"],
        timeout=120, expect_fail=True,
    )
    assert codes[1] == 7, f"injected crash missing:\n{outs[1][-1000:]}"
    assert not (tmp_path / "out_1_crash.npz").exists()
    assert (tmp_path / "ckpt.npz").exists(), "checkpoint before crash missing"

    # Phase 2: restart the gang; both restore and finish steps 3..5.
    _launch(COMPOSED_WORKER, 19781, [str(tmp_path), "resume"])
    a = np.load(tmp_path / "out_0_resume.npz")
    b = np.load(tmp_path / "out_1_resume.npz")
    np.testing.assert_array_equal(a["losses"], b["losses"])

    # Phase 3: identical to the uninterrupted trajectory.
    want_losses, want_params = _composed_oracle()
    np.testing.assert_allclose(a["losses"], want_losses[3:], atol=1e-5)
    for i, w in enumerate(want_params):
        np.testing.assert_allclose(a[f"p{i}"], w, atol=1e-4)
