"""Worker script for the multi-process (simulated multi-host) test.

Launched as N processes by ``test_multiprocess.py``; each initializes
``jax.distributed`` over localhost (the DCN-analogue transport on CPU is
gloo), builds a global mesh spanning both processes, and runs the
edge-partitioned message passing across it. Each process writes its result
to ``<outdir>/out_<pid>.npy`` for the parent to compare against
single-device execution.

Usage: python multiprocess_worker.py <coord_addr> <num_procs> <proc_id> <outdir>
"""

import sys


def main() -> int:
    coord, num_procs, proc_id, outdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)  # 2 local devices per process
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=num_procs,
        process_id=proc_id,
    )

    import numpy as np
    import jax.numpy as jnp

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from graph_hypernetwork_forge_tpu.parallel.edge_partition import (
        edge_partitioned_message_passing,
    )
    from graph_hypernetwork_forge_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 2 * num_procs, jax.devices()

    rng = np.random.default_rng(0)  # same data on every process
    n, e, u, d = 16, 64, 4, 8
    h = rng.standard_normal((n, d)).astype(np.float32)
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    rel = rng.integers(0, u, size=e).astype(np.int32)
    w_msg = 0.1 * rng.standard_normal((u, d, d)).astype(np.float32)
    w_self = 0.1 * rng.standard_normal((u, d, d)).astype(np.float32)
    bias = 0.1 * rng.standard_normal((u, d)).astype(np.float32)

    mesh = make_mesh((2 * num_procs,), ("edge",))

    # Build the globally-sharded edge arrays via make_array_from_callback
    # (each process owns its local shards).
    from jax.sharding import NamedSharding, PartitionSpec as P

    edge_sharding = NamedSharding(mesh, P("edge"))
    repl = NamedSharding(mesh, P())

    def global_edge_array(arr):
        return jax.make_array_from_callback(
            arr.shape, edge_sharding, lambda idx: arr[idx]
        )

    def global_repl(arr):
        return jax.make_array_from_callback(
            arr.shape, repl, lambda idx: arr[idx]
        )

    out = edge_partitioned_message_passing(
        mesh,
        global_repl(h),
        global_edge_array(src),
        global_edge_array(dst),
        global_edge_array(rel),
        global_repl(w_msg),
        global_repl(w_self),
        global_repl(bias),
    )
    # Fully-replicated output: every addressable device holds the whole
    # array — read it straight off the first local shard.
    local = np.asarray(out.addressable_shards[0].data)
    np.save(f"{outdir}/out_{proc_id}.npy", local)
    print(f"proc {proc_id}: OK shape={local.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
