"""Worker for the multi-process composed-training + fault-injection tests.

Launched as 2 processes (2 CPU devices each → one global 4-device mesh over
gloo) by ``test_multiprocess.py``. Runs the fully-composed SPMD train step
(relation sharding + halo node partitioning + local scoring + Adam,
``parallel/composed.py``) for 6 steps with per-step rng =
``fold_in(base, step)`` so a resumed run replays the identical trajectory.

Modes:

- ``train``: all 6 steps; process 0 checkpoints after step 2.
- ``crash``: like train, but process 1 dies (``os._exit(7)``) at the start
  of step 3 — the host-drop injection (SURVEY.md §5.3). Process 0 then
  fails/hangs on the next collective; the parent reaps it.
- ``resume``: restore the step-2 checkpoint, run steps 3..5.

Each process writes ``out_<pid>_<mode>.npz`` with the per-step losses and
the final flattened params for the parent to compare across processes and
against a single-process oracle.

Usage: python multiprocess_composed_worker.py <coord> <nprocs> <pid> <outdir> <mode>
"""

import os
import sys


def main() -> int:
    coord, num_procs, pid, outdir, mode = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5],
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=num_procs, process_id=pid
    )

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from graph_hypernetwork_forge_tpu.parallel.composed import (
        make_composed_train_step,
        prepare_composed_inputs,
    )
    from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh
    from tests_shared_composed_case import build_case  # noqa: F401 (see below)

    k = 2 * num_procs
    mesh = make_mesh((k,), ("edge",))
    graph, feats, config, params0 = build_case()
    inputs = prepare_composed_inputs(graph, feats, k, halo=True)
    optimizer = optax.adam(1e-2)
    step = make_composed_train_step(
        mesh, config, optimizer, inputs.nodes_per_shard,
        num_nodes=inputs.num_nodes, halo_width=inputs.halo_width,
    )

    def put(arr, spec):
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
        )

    arrays = (
        put(inputs.feats, P("edge", None)),
        put(inputs.src, P("edge")),
        put(inputs.dst, P("edge")),
        put(inputs.rel_ids, P("edge")),
        put(inputs.edge_mask, P("edge")),
        put(inputs.char_ids, P("edge", None)),
        put(inputs.lengths, P("edge")),
    )
    src_halo = put(inputs.src_halo, P("edge"))
    send_idx = put(inputs.send_idx, P("edge", None, None))

    leaves0, treedef = jax.tree_util.tree_flatten(params0)
    params = params0
    opt_state = optimizer.init(params)
    opt_leaves0, opt_treedef = jax.tree_util.tree_flatten(opt_state)

    start = 0
    ckpt_path = os.path.join(outdir, "ckpt.npz")
    if mode == "resume":
        data = np.load(ckpt_path)
        start = int(data["step"])
        params = jax.tree_util.tree_unflatten(
            treedef, [data[f"p{i}"] for i in range(len(leaves0))]
        )
        opt_state = jax.tree_util.tree_unflatten(
            opt_treedef, [data[f"o{i}"] for i in range(len(opt_leaves0))]
        )

    params = jax.tree_util.tree_map(lambda a: put(a, P()), params)
    opt_state = jax.tree_util.tree_map(lambda a: put(a, P()), opt_state)

    base = jax.random.PRNGKey(7)
    losses = []
    for s in range(start, 6):
        if mode == "crash" and s == 3 and pid == 1:
            os._exit(7)  # host drop, mid-training, before the collective
        sr = jax.random.fold_in(base, s)
        params, opt_state, loss = step(
            params, opt_state, *arrays, sr, src_halo=src_halo,
            send_idx=send_idx,
        )
        losses.append(float(loss))
        if s == 2 and pid == 0 and mode in ("train", "crash"):
            flat = {"step": 3}
            for i, a in enumerate(jax.tree_util.tree_leaves(params)):
                flat[f"p{i}"] = np.asarray(a)
            for i, a in enumerate(jax.tree_util.tree_leaves(opt_state)):
                flat[f"o{i}"] = np.asarray(a)
            np.savez(ckpt_path, **flat)

    out = {"losses": np.asarray(losses)}
    for i, a in enumerate(jax.tree_util.tree_leaves(params)):
        out[f"p{i}"] = np.asarray(a)
    np.savez(os.path.join(outdir, f"out_{pid}_{mode}.npz"), **out)
    print(f"proc {pid} mode={mode}: OK losses={losses}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
