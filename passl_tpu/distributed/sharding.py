"""Parameter partitioning rules: FSDP (ZeRO) + tensor parallelism.

Replaces the reference's sharded-optimizer machinery
(`passl_v110/engine/trainer.py:197-216` ShardingStage2) and ring TP
(`passl/nn/finer_grained_mp_layers.py`): on TPU we *declare* shardings
on the param pytree and let XLA's SPMD partitioner generate the
collectives (all_gather for fsdp params, reduce_scatter for grads,
ICI-ring matmuls for tp) — the idiomatic equivalent of megatron-style
row/column parallel linears, without hand-written isend/irecv rings.

Rules are (regex, PartitionSpec) pairs matched against the flattened
param path. Unmatched params fall back to FSDP sharding along their
largest axis divisible by the fsdp mesh size (small params replicate).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import FSDP_AXIS, TP_AXIS

# Megatron-style TP rules for the transformer family (flax layouts:
# Dense kernel (in, out), bias (out,)). Column-parallel on qkv/fc1
# (shard out), row-parallel on proj/fc2 (shard in) — mirrors the intent
# of reference FinerGrainedColumn/RowParallelLinear (SURVEY §2.3 TP).
VIT_TP_RULES: List[Tuple[str, P]] = [
    (r"attn/qkv/kernel$", P(None, TP_AXIS)),
    (r"attn/qkv/bias$", P(TP_AXIS)),
    (r"attn/proj/kernel$", P(TP_AXIS, None)),
    (r"attn/proj/bias$", P()),
    (r"mlp/fc1/kernel$", P(None, TP_AXIS)),
    (r"mlp/fc1/bias$", P(TP_AXIS)),
    (r"mlp/fc2/kernel$", P(TP_AXIS, None)),
    (r"mlp/fc2/bias$", P()),
]

# Expert parallelism for MoE models (models/vit_moe.py): the stacked
# expert dim rides the fsdp axis (each device holds E/fsdp experts and
# XLA's SPMD partitioner inserts the token all-to-alls from the
# dispatch/combine einsums), expert hidden dims ride tp — the
# declarative twin of the explicit `nn/moe.make_expert_parallel_mlp`
# shard_map path. Beyond the reference (no MoE anywhere in PASSL).
MOE_SHARD_RULES: List[Tuple[str, P]] = [
    (r"moe/router$", P()),
    (r"moe/w1$", P(FSDP_AXIS, None, TP_AXIS)),
    (r"moe/b1$", P(FSDP_AXIS, TP_AXIS)),
    (r"moe/w2$", P(FSDP_AXIS, TP_AXIS, None)),
    (r"moe/b2$", P(FSDP_AXIS, None)),
]


def _fsdp_spec(shape: Sequence[int], fsdp_size: int, base: Optional[P] = None, min_size: int = 2**14) -> P:
    """Add FSDP sharding on the largest yet-unsharded axis divisible by
    fsdp_size; replicate small params."""
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return base or P()
    spec = list(base) if base is not None else [None] * len(shape)
    while len(spec) < len(shape):
        spec.append(None)
    if FSDP_AXIS in spec:  # rule already placed fsdp (e.g. expert dim)
        return P(*spec)
    # candidate axes: unsharded, divisible
    cands = [i for i, s in enumerate(shape) if spec[i] is None and s % fsdp_size == 0]
    if not cands:
        return P(*spec)
    ax = max(cands, key=lambda i: shape[i])
    spec[ax] = FSDP_AXIS
    return P(*spec)


def partition_params(
    params,
    mesh: Mesh,
    tp_rules: Optional[Sequence[Tuple[str, P]]] = None,
    use_fsdp: bool = True,
    min_size_to_shard: int = 2**14,
) -> Any:
    """Returns a pytree of NamedSharding congruent with `params`."""
    tp_rules = list(tp_rules or [])
    fsdp_size = mesh.shape.get(FSDP_AXIS, 1) if use_fsdp else 1

    def _entry_size(entry) -> int:
        axes = entry if isinstance(entry, tuple) else (entry,)
        return int(np.prod([mesh.shape.get(a, 1) for a in axes]))

    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for path, leaf in flat.items():
        shape = np.shape(leaf)
        base = None
        for pat, spec in tp_rules:
            if re.search(pat, path):
                # drop rules whose sharded dims don't divide (a mesh
                # axis of size 1 always divides — sharding over it is a
                # no-op, so rules stay valid at any tp/fsdp degree)
                ok = all(
                    spec[i] is None
                    or (i < len(shape) and shape[i] % _entry_size(spec[i]) == 0)
                    for i in range(len(spec))
                )
                if ok:
                    base = spec
                break
        out[path] = NamedSharding(mesh, _fsdp_spec(shape, fsdp_size, base, min_size_to_shard))
    return traverse_util.unflatten_dict(out, sep="/")


def pipeline_state_shardings(state, mesh: Mesh, pp: int):
    """Place a pipelined model's stacked block params on the pp axis.

    A pipeline model (e.g. VisionTransformer(pipeline=True)) stores its
    block stack as one `blocks` subtree with leaves [depth, ...]
    (stage-major), so P('pp') on dim 0 gives each stage's devices
    exactly their layers — params, optimizer moments, and EMA copies
    alike (all mirror trees, matched here by path). Everything else
    (embed/head params, BN-style state, step, rng) replicates; the
    GPipe shard_map's in_spec P('pp') then consumes the stacked leaves
    with no resharding. Composes with dp only (Engine enforces this).
    """
    from .mesh import PP_AXIS

    repl = NamedSharding(mesh, P())
    pp_shard = NamedSharding(mesh, P(PP_AXIS))

    def place(path, leaf):
        in_blocks = any("blocks" in str(getattr(k, "key", k)) for k in path)
        if in_blocks and np.ndim(leaf) >= 1 and np.shape(leaf)[0] % pp == 0:
            return pp_shard
        return repl

    shardings = jax.tree_util.tree_map_with_path(place, state)
    return jax.device_put(state, shardings), shardings


def shard_train_state(state, mesh: Mesh, tp_rules=None, use_fsdp: bool = True):
    """Compute a TrainState-of-shardings and device_put the state.

    - params / ema_params / ema-pair targets: partition_params rules
    - opt_state: flat {param_path: {slot: arr}} — moment slots inherit
      the param sharding (same shape), scalars/masters likewise
    - model_state (BN stats, SSL queues), step, rng, scaler: replicated
    """
    pshard = partition_params(state.params, mesh, tp_rules=tp_rules, use_fsdp=use_fsdp)
    pflat = traverse_util.flatten_dict(pshard, sep="/")
    repl = NamedSharding(mesh, P())

    def opt_shardings(opt_state):
        out = {}
        for path, slots in opt_state.items():
            ps = pflat.get(path, repl)
            out[path] = {
                k: (ps if np.shape(v) == np.shape(_param_at(state.params, path)) else repl)
                for k, v in slots.items()
            }
        return out

    def _param_at(params, path):
        node = params
        for k in path.split("/"):
            node = node[k]
        return node

    shardings = state.replace(
        step=repl,
        params=pshard,
        model_state=jax.tree_util.tree_map(lambda _: repl, state.model_state),
        opt_state=opt_shardings(state.opt_state),
        rng=repl,
        scaler_state=jax.tree_util.tree_map(lambda _: repl, state.scaler_state)
        if state.scaler_state is not None
        else None,
        ema_params=pshard if state.ema_params is not None else None,
    )
    return jax.device_put(state, shardings), shardings
