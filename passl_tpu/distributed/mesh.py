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


def build_mesh(
    dp: int = -1,
    fsdp: int = 1,
    tp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """pp > 1 adds a `pp` axis for pipeline parallelism (the reference
    only threads pp_degree through env+seeds, env.py:306-332; here
    `distributed/pipeline.py` actually schedules over the axis)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % (fsdp * tp * pp) == 0, \
            f"{n} devices not divisible by pp*fsdp*tp={pp * fsdp * tp}"
        dp = n // (fsdp * tp * pp)
    assert dp * fsdp * tp * pp == n, f"dp*pp*fsdp*tp={dp * pp * fsdp * tp} != {n} devices"
    if pp > 1:
        dev_array = np.asarray(devices).reshape(dp, pp, fsdp, tp)
        return Mesh(dev_array, (DP_AXIS, PP_AXIS, FSDP_AXIS, TP_AXIS))
    dev_array = np.asarray(devices).reshape(dp, fsdp, tp)
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
