"""Device mesh environment: the TPU-native replacement for fleet HCG.

Capability parity with reference `passl/distributed/env.py:306-332`
(`init_dist_env` building dp/mp/pp/sharding NCCL groups): here one
`jax.sharding.Mesh` with named axes `("dp", "fsdp", "tp")` expresses the
same hybrid parallelism — `dp` is data parallel, `fsdp` is the
ZeRO/sharding axis (params sharded, data also split along it), `tp` is
tensor parallel. Collectives ride ICI automatically; XLA chooses the
schedule. Group accessors (`env.py:126-229`) become axis queries.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
FSDP_AXIS = "fsdp"
TP_AXIS = "tp"
PP_AXIS = "pp"
MESH_AXES = (DP_AXIS, FSDP_AXIS, TP_AXIS)
# Axes over which the (global) batch is split: dp and fsdp both consume data.
DATA_AXES = (DP_AXIS, FSDP_AXIS)

_global_mesh: Optional[Mesh] = None


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Degrees of parallelism; dp=-1 means 'whatever is left over'
    (reference computes dp = world/(mp*pp*sharding), env.py:317)."""

    dp: int = -1
    fsdp: int = 1
    tp: int = 1


def hybrid_device_grid(devices, dp: int, fsdp: int, tp: int, pp: int = 1):
    """Arrange devices into a (dp[, pp], fsdp, tp) grid with DCN-aware
    placement: when the devices span multiple processes (hosts / pod
    slices), the model axes (tp innermost, then fsdp, then pp) are kept
    *inside* a process and only the leftover dp factor crosses the
    process boundary, so tp/fsdp collectives ride ICI and dp gradient
    reductions ride DCN.

    Reference counterpart: the hybrid rank grid
    `[dp, pp, sharding, mp]` + transpose in
    `passl/distributed/env.py:232-269,306-332` (NCCL group construction
    that likewise keeps mp ranks adjacent). The JAX analogue of this
    function is `jax.experimental.mesh_utils.create_hybrid_device_mesh`;
    we build the grid by hand because (a) that helper requires
    TPU-specific `slice_index` attributes absent on CPU/gloo topologies
    and (b) we key locality on `process_index`, which exists everywhere.

    Pure placement logic: `devices` only needs `.process_index`
    attributes, so the locality property is unit-testable with mock
    devices (tests/test_parallel.py) and asserted live on the gloo
    2-process topology (tests/multiprocess/launch.py).

    Returns an np.ndarray of shape (dp, fsdp, tp) or (dp, pp, fsdp, tp).
    """
    n = len(devices)
    assert dp * fsdp * tp * pp == n, f"dp*pp*fsdp*tp={dp * pp * fsdp * tp} != {n} devices"
    procs = sorted({d.process_index for d in devices})
    nproc = len(procs)
    per_proc = n // nproc
    inner = fsdp * tp * pp  # model axes that should stay intra-process
    shape = (dp, pp, fsdp, tp) if pp > 1 else (dp, fsdp, tp)
    if (
        nproc > 1
        and n % nproc == 0
        and per_proc % inner == 0
        and dp % (per_proc // inner) == 0
    ):
        # stable sort by process so each row of (nproc, per_proc) is one
        # process; jax.devices() is already process-major, but don't
        # rely on it
        by_proc = sorted(devices, key=lambda d: (d.process_index, d.id))
        grid = np.asarray(by_proc, dtype=object).reshape(nproc, per_proc)
        dp_inner = per_proc // inner
        # (nproc, dp_inner, pp, fsdp, tp) -> merge (nproc, dp_inner) into
        # dp with the process index outermost: dp blocks are contiguous
        # per process, so the batch layout stays rank-major (loops.py
        # _host_rows contract) while tp/fsdp/pp groups never straddle a
        # process.
        grid = grid.reshape(nproc, dp_inner, pp, fsdp, tp).reshape(dp, pp, fsdp, tp)
        return grid if pp > 1 else grid.reshape(dp, fsdp, tp)
    if nproc > 1:
        import logging

        logging.getLogger("passl").warning(
            "hybrid mesh placement unavailable (n=%d devices, %d procs, "
            "fsdp*tp*pp=%d does not tile a %d-device process); model-"
            "parallel collectives may cross hosts", n, nproc, inner, per_proc)
    return np.asarray(devices, dtype=object).reshape(shape)


def build_mesh(
    dp: int = -1,
    fsdp: int = 1,
    tp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """pp > 1 adds a `pp` axis for pipeline parallelism (the reference
    only threads pp_degree through env+seeds, env.py:306-332; here
    `distributed/pipeline.py` actually schedules over the axis).

    Multi-process topologies get DCN-aware placement via
    `hybrid_device_grid` (dp crosses hosts, fsdp/tp/pp stay inside one)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % (fsdp * tp * pp) == 0, \
            f"{n} devices not divisible by pp*fsdp*tp={pp * fsdp * tp}"
        dp = n // (fsdp * tp * pp)
    dev_array = hybrid_device_grid(devices, dp=dp, fsdp=fsdp, tp=tp, pp=pp)
    if pp > 1:
        return Mesh(dev_array, (DP_AXIS, PP_AXIS, FSDP_AXIS, TP_AXIS))
    return Mesh(dev_array, MESH_AXES)


def init_dist_env(dp: int = -1, fsdp: int = 1, tp: int = 1, pp: int = 1, devices=None) -> Mesh:
    """Build and install the global mesh (reference init_dist_env)."""
    global _global_mesh
    _global_mesh = build_mesh(dp=dp, fsdp=fsdp, tp=tp, pp=pp, devices=devices)
    return _global_mesh


def get_mesh() -> Mesh:
    global _global_mesh
    if _global_mesh is None:
        _global_mesh = build_mesh()
    return _global_mesh


def set_mesh(mesh: Mesh) -> None:
    global _global_mesh
    _global_mesh = mesh


def data_parallel_size(mesh: Optional[Mesh] = None) -> int:
    mesh = mesh or get_mesh()
    return int(np.prod([mesh.shape[a] for a in DATA_AXES]))


def tp_size(mesh: Optional[Mesh] = None) -> int:
    mesh = mesh or get_mesh()
    return mesh.shape[TP_AXIS]


def data_sharding(mesh: Optional[Mesh] = None, ndim: int = 4) -> NamedSharding:
    """Batch sharding: leading axis split over (dp, fsdp)."""
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P(DATA_AXES, *([None] * (ndim - 1))))


def batch_pspec() -> P:
    return P(DATA_AXES)


def replicated(mesh: Optional[Mesh] = None) -> NamedSharding:
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P())


def local_batch_size(global_batch_size: int, mesh: Optional[Mesh] = None) -> int:
    dpn = data_parallel_size(mesh)
    assert global_batch_size % dpn == 0, (
        f"global batch {global_batch_size} not divisible by data-parallel size {dpn}"
    )
    return global_batch_size // dpn
