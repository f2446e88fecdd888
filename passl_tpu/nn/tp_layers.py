"""Tensor-parallel linear primitives: ring weight circulation + megatron.

Capability parity with reference `passl/nn/finer_grained_mp_layers.py`
(FinerGrainedColumn/RowParallelLinear: each rank holds a 1/p weight
shard; shards circulate around the MP ring via paired isend/irecv
overlapped with per-chunk matmuls, hand-written backward :112-319).

TPU-native design: two interchangeable strategies —

1. **Megatron sharding (production default)**: declare
   `PartitionSpec(None, "tp")` / `("tp", None)` on the kernels
   (distributed/sharding.VIT_TP_RULES) and let XLA's SPMD partitioner
   schedule the collectives. This is what `DistributedStrategy.
   tensor_parallel.degree` activates in the Engine.

2. **Ring circulation (this module)**: inside `shard_map`, weight
   shards travel the ring via `lax.ppermute` while each step's chunk
   matmul overlaps with the transfer (XLA overlaps async collective
   permute with compute). Because every op used (ppermute,
   dynamic_update_slice, matmul) is differentiable, JAX's autodiff
   derives the reverse ring for dW automatically — no hand-written
   backward.

Both compute bit-identical results to a dense linear; tests verify
value and gradient equivalence on a CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _ring_perm(p: int):
    # send to the right neighbor: after one permute, rank r holds the
    # shard that lived on rank (r-1) % p
    return [(i, (i + 1) % p) for i in range(p)]


def ring_column_parallel(x: jnp.ndarray, w_shard: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inside shard_map. x: [B_local, IN] (replicated IN); w_shard:
    [IN, OUT/p] (this rank's columns). Returns [B_local, OUT] — the
    full output for the local batch rows, built one column-block per
    ring step (reference forward :52-110)."""
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    out_per = w_shard.shape[1]
    out = jnp.zeros((x.shape[0], out_per * p), x.dtype)

    def body(i, carry):
        out, w = carry
        src = (idx - i) % p  # owner of the shard we currently hold
        y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        out = lax.dynamic_update_slice(out, y, (0, src * out_per))
        w = lax.ppermute(w, axis_name, _ring_perm(p))
        return out, w

    out, _ = lax.fori_loop(0, p, body, (out, w_shard), unroll=True)
    return out


def ring_row_parallel(x: jnp.ndarray, w_shard: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inside shard_map. x: [B_local, IN] (full IN available locally);
    w_shard: [IN/p, OUT] (this rank's rows). Each step consumes the
    input slice matching the currently-held weight rows; the final
    result is complete locally with NO reduction (unlike megatron
    row-parallel, the ring variant keeps full activations per batch
    shard — the reference splits the *batch*, not the features)."""
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    in_per = w_shard.shape[0]
    out = jnp.zeros((x.shape[0], w_shard.shape[1]), jnp.float32)

    def body(i, carry):
        out, w = carry
        src = (idx - i) % p
        x_slice = lax.dynamic_slice(x, (0, src * in_per), (x.shape[0], in_per))
        out = out + jnp.dot(x_slice, w, preferred_element_type=jnp.float32)
        w = lax.ppermute(w, axis_name, _ring_perm(p))
        return out, w

    out, _ = lax.fori_loop(0, p, body, (out, w_shard), unroll=True)
    return out.astype(x.dtype)


def make_ring_linear(mesh: Mesh, axis_name: str = "tp", kind: str = "column"):
    """Host-level helper: returns f(x, w) where x is batch-sharded over
    `axis_name`, w is shard-by-(columns|rows) over `axis_name`, and the
    result equals `x @ w` with full precision. Differentiable."""
    fn = ring_column_parallel if kind == "column" else ring_row_parallel
    w_spec = P(None, axis_name) if kind == "column" else P(axis_name, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None), w_spec),
        out_specs=P(axis_name, None),
        check_vma=False,
    )
    def ring_linear(x_local, w_shard):
        return fn(x_local, w_shard, axis_name)

    return ring_linear


# ---------------------------------------------------------------------
# Ulysses sequence parallelism (finishing what the reference started:
# reshard_transpose exists as a primitive but no model uses it,
# SURVEY §2.2 / §5)
# ---------------------------------------------------------------------

def ulysses_attention(q, k, v, axis_name: str, scale: Optional[float] = None):
    """Inside shard_map. q/k/v: [N, S/p, H, D] (sequence-sharded).
    All-to-all reshards sequence→heads so each rank attends over the
    FULL sequence for H/p heads, then reshards back (DeepSpeed-Ulysses;
    reference `reshard_transpose`, distributed/nn/functional.py:49-77).
    """
    def to_heads(x):
        return lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    def to_seq(x):
        return lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)  # [N, S, H/p, D]
    d = qh.shape[-1]
    s = scale or d**-0.5
    attn = jnp.einsum("nqhd,nkhd->nhqk", qh * s, kh, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(qh.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", attn, vh)
    return to_seq(out)  # [N, S/p, H, D]


def make_ulysses_attention(mesh: Mesh, axis_name: str = "tp"):
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None),) * 3,
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )
    def fn(q, k, v):
        return ulysses_attention(q, k, v, axis_name)

    return fn
