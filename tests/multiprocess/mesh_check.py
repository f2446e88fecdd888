"""Per-rank DCN-aware mesh locality check (run under launch.py).

Live counterpart of the mock-device unit tests in
tests/test_parallel.py: on the real gloo 2-process x 4-device topology,
build an fsdp2*tp2 hybrid mesh and assert the model axes (fsdp, tp)
never straddle a process while dp crosses them — the placement the
reference encodes in its hybrid rank grid
(`passl/distributed/env.py:232-269,306-332`).

Prints one JSON verdict line on rank 0; exits nonzero on violation.
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)


def main() -> int:
    import jax

    jax.distributed.initialize(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )
    from passl_tpu import distributed as dist

    n = len(jax.devices())
    mesh = dist.build_mesh(dp=-1, fsdp=2, tp=2)
    grid = mesh.devices  # (dp, fsdp, tp)
    checks = {}
    # every (fsdp, tp) plane -> exactly one process
    planes_local = all(
        len({d.process_index for d in grid[i].ravel()}) == 1
        for i in range(grid.shape[0])
    )
    checks["model_axes_intra_process"] = planes_local
    # dp spans all processes
    dp_procs = {grid[i, 0, 0].process_index for i in range(grid.shape[0])}
    checks["dp_spans_processes"] = dp_procs == set(range(jax.process_count()))
    # dp index is process-major (rank-major batch layout for _host_rows)
    dp_proc_seq = [grid[i, 0, 0].process_index for i in range(grid.shape[0])]
    checks["dp_process_major"] = dp_proc_seq == sorted(dp_proc_seq)
    # the mesh is actually usable: one psum over each axis
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(
        jnp.ones((n,), jnp.float32), NamedSharding(mesh, P(("dp", "fsdp"))))
    total = float(jnp.sum(x))
    checks["collective_sum_ok"] = total == float(n)
    ok = all(checks.values())
    if jax.process_index() == 0:
        print(json.dumps({"ok": ok, "checks": checks,
                          "mesh": {k: int(v) for k, v in mesh.shape.items()},
                          "n_devices": n}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
