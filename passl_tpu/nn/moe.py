"""Mixture-of-Experts with expert parallelism, TPU-native.

The reference has no MoE (SURVEY §2.3 lists dp/sharding/tp/pp/sp only),
but expert parallelism is the remaining first-class parallelism axis a
production vision framework needs (V-MoE is the canonical scaled-ViT
family). Everything here is designed for XLA/SPMD from the start:

- **Static shapes**: routing uses GShard-style capacity-bounded one-hot
  dispatch/combine tensors, so the expert batch is a fixed ``[E, C, d]``
  regardless of the realized routing — no dynamic shapes, no host sync.
- **Two interchangeable execution strategies** (mirroring how this repo
  ships TP as declarative megatron + explicit ring):

  1. *Declarative* (production default): ``MoEMlp`` computes with
     stacked expert weights ``[E, d, h]``; under pjit, sharding the
     expert dim (``MOE_SHARD_RULES`` in distributed/sharding.py) makes
     XLA's SPMD partitioner insert the token all-to-alls.
  2. *Explicit* (``make_expert_parallel_mlp``): inside ``shard_map``
     over a mesh axis (canonically named ``"ep"``), tokens are dispatched
     to expert owners with ``lax.all_to_all``, experts run fully local,
     and a reverse all-to-all returns the outputs. Differentiable
     end-to-end (autodiff derives the reverse transfers), and
     bit-comparable to strategy 1 when capacity admits every token.

- **Router numerics**: routing probabilities, dispatch decisions, and
  auxiliary losses are computed in float32 even under a bf16 model —
  top-k stability and load-balance gradients are precision-sensitive.

Aux losses follow the standard recipe: Switch/V-MoE load-balance loss
``E * Σ_e f_e · P_e`` (f_e = fraction of tokens whose first choice is
expert e, P_e = mean router prob) and an optional ST-MoE router z-loss.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

Dtype = Any


def moe_capacity(num_tokens: int, num_experts: int, k: int,
                 capacity_factor: float) -> int:
    """Per-expert token capacity, rounded up to a multiple of 8 so the
    ``[E, C, d]`` expert batch tiles cleanly on TPU sublanes."""
    c = int(math.ceil(k * num_tokens / num_experts * capacity_factor))
    return max(8, ((c + 7) // 8) * 8)


def topk_dispatch(gates: jnp.ndarray, k: int, capacity: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Capacity-bounded top-k routing (GShard dispatch).

    gates: ``[T, E]`` float32 router probabilities (rows sum to 1).
    Returns ``(combine [T,E,C] f32, dispatch [T,E,C] bool,
    first_choice [T,E] f32 one-hot)``. Position within an expert is
    assigned in token order (deterministic priority, the GShard
    convention); tokens past ``capacity`` are dropped (their combine
    weight is 0, so the residual path carries them — V-MoE semantics).
    Selected gate values are renormalized over the *kept* choices.
    """
    t, e = gates.shape
    remaining = gates
    count = jnp.zeros((e,), jnp.int32)  # tokens already assigned per expert
    chosen = []  # (expert one-hot [T,E], position [T], gate value [T])
    first_choice = None
    for _ in range(k):
        idx = jnp.argmax(remaining, axis=-1)  # [T]
        onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)
        if first_choice is None:
            first_choice = onehot
        ioh = onehot.astype(jnp.int32)
        pos = (jnp.cumsum(ioh, axis=0) - 1 + count[None, :])  # [T, E]
        count = count + ioh.sum(axis=0)
        loc = jnp.sum(pos * ioh, axis=-1)  # [T]
        keep = (loc < capacity).astype(jnp.float32)
        gval = jnp.sum(gates * onehot, axis=-1) * keep
        chosen.append((onehot, loc, gval))
        remaining = remaining * (1.0 - onehot)
    denom = sum(g for _, _, g in chosen)
    denom = jnp.where(denom > 0, denom, 1.0)
    combine = jnp.zeros((t, e, capacity), jnp.float32)
    for onehot, loc, gval in chosen:
        loc_oh = jax.nn.one_hot(loc, capacity, dtype=jnp.float32)  # [T, C]
        combine = combine + (gval / denom)[:, None, None] * (
            onehot[:, :, None] * loc_oh[:, None, :])
    dispatch = combine > 0.0
    return combine, dispatch, first_choice


def load_balance_loss(gates: jnp.ndarray, first_choice: jnp.ndarray) -> jnp.ndarray:
    """Switch-Transformer load-balance loss: E · Σ_e f_e · P_e == 1 at
    perfect balance, > 1 when the router collapses onto few experts."""
    e = gates.shape[-1]
    f = jnp.mean(first_choice, axis=0)   # fraction routed to e
    p = jnp.mean(gates, axis=0)          # mean router prob of e
    return e * jnp.sum(f * p)


def expert_ffn(xe: jnp.ndarray, w1, b1, w2, b2,
               act: Callable = nn.gelu) -> jnp.ndarray:
    """Batched per-expert 2-layer FFN. xe: [E, C, d]; w1: [E, d, h];
    w2: [E, h, d]. One batched MXU matmul per layer — E is the batch
    dim, so sharding E over a mesh axis makes each device run only its
    resident experts."""
    h = jnp.einsum("ecd,edh->ech", xe, w1,
                   preferred_element_type=jnp.float32).astype(xe.dtype)
    h = act(h + b1[:, None, :].astype(xe.dtype))
    y = jnp.einsum("ech,ehd->ecd", h, w2,
                   preferred_element_type=jnp.float32).astype(xe.dtype)
    return y + b2[:, None, :].astype(xe.dtype)


class MoEMlp(nn.Module):
    """Drop-in MoE replacement for ``nn.layers.Mlp`` (V-MoE style).

    Returns ``(y, aux)`` where ``aux`` is a dict of weighted auxiliary
    losses (``moe_aux_loss``; plus ``moe_z_loss`` when enabled) and a
    ``moe_balance`` diagnostic (1.0 = perfectly balanced router).
    """

    num_experts: int = 8
    k: int = 2                      # experts per token (V-MoE default)
    capacity_factor: float = 1.25
    hidden_features: Optional[int] = None
    act: Callable = nn.gelu
    drop: float = 0.0               # dropout after act + after combine (Mlp parity)
    aux_weight: float = 0.01        # V-MoE load-balance weight
    z_weight: float = 0.0           # ST-MoE router z-loss (opt-in)
    # routing group size in tokens (GShard "groups"): dispatch/combine
    # one-hots are [G, T/G, E, C_g] with capacity per group, so their
    # footprint scales as T·E·C_g = T²·E·k·cf/(E·G) — without grouping
    # (group_size=0 → one global group) the tensors are quadratic in the
    # global token count and blow past HBM at production batch sizes.
    # Groups are whole images (the reshape never splits a sample, so it
    # stays local under batch sharding). The 256-token default means one
    # 224px image per group — the measured on-chip optimum: ViT-S/16-e8
    # bs256 runs 1724 imgs/s at gs=197/256 vs 1525 at gs=1024, 1323 at
    # gs=2048 (smaller groups shrink the one-hot dispatch flops).
    group_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        n, s, d = x.shape
        t = n * s
        e = self.num_experts
        hidden = self.hidden_features or d
        if not isinstance(n, int):
            # symbolic batch dim (jax.export shape polymorphism): sizing
            # groups needs integer comparisons on n, so pin one image
            # per group — identical to the native model whenever
            # group_size < 2·s (the 224px default regime). Global
            # routing cannot be expressed with a symbolic batch, so
            # refuse rather than silently change capacity semantics.
            if not self.group_size:
                raise ValueError(
                    "MoEMlp(group_size=0) routes over the global token "
                    "set, which needs a concrete batch size — export "
                    "with a fixed batch dim or set group_size")
            tg = s
        elif self.group_size and self.group_size < t:
            # group = whole images (largest image count whose tokens fit
            # the target), so the [n,s,d]→[g,tg,d] reshape never splits a
            # sample — it stays a pure local reshape under batch sharding
            m = max(mm for mm in range(1, max(self.group_size // s, 1) + 1)
                    if n % mm == 0)
            tg = m * s
        else:
            tg = t
        g = t // tg
        cap = moe_capacity(tg, e, self.k, self.capacity_factor)

        xt = x.reshape(g, tg, d)
        # router in f32 regardless of model compute dtype
        wr = self.param("router", nn.initializers.normal(0.02), (d, e), jnp.float32)
        logits = jnp.einsum("gtd,de->gte", xt.astype(jnp.float32), wr)
        gates = jax.nn.softmax(logits, axis=-1)
        combine, dispatch, first = jax.vmap(
            lambda gg: topk_dispatch(gg, self.k, cap))(gates)

        xavier = nn.initializers.xavier_uniform(in_axis=-2, out_axis=-1,
                                                batch_axis=(0,))
        w1 = self.param("w1", xavier, (e, d, hidden), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (e, hidden), jnp.float32)
        w2 = self.param("w2", xavier, (e, hidden, d), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (e, d), jnp.float32)

        xe = jnp.einsum("gtec,gtd->egcd", dispatch.astype(x.dtype), xt)
        # expert FFN inlined (vs expert_ffn) so hidden dropout mirrors
        # nn.layers.Mlp's placement: after act, and after the output
        hq = jnp.einsum("ecd,edh->ech", xe.reshape(e, g * cap, d),
                        w1.astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        hq = self.act(hq + b1[:, None, :].astype(x.dtype))
        hq = nn.Dropout(self.drop)(hq, deterministic=deterministic)
        ye = jnp.einsum("ech,ehd->ecd", hq, w2.astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        ye = (ye + b2[:, None, :].astype(x.dtype)).reshape(e, g, cap, d)
        y = jnp.einsum("gtec,egcd->gtd", combine.astype(x.dtype), ye)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        gates = gates.reshape(t, e)
        first = first.reshape(t, e)

        balance = load_balance_loss(gates, first)
        aux = {
            "moe_aux_loss": self.aux_weight * balance,
            "moe_balance": balance,  # diagnostic (no "loss" in key): 1.0 = balanced
        }
        if self.z_weight > 0.0:
            zl = jnp.mean(jnp.square(jax.nn.logsumexp(logits, axis=-1)))
            aux["moe_z_loss"] = self.z_weight * zl
        return y.reshape(n, s, d), aux


# ---------------------------------------------------------------------
# Explicit expert parallelism: shard_map + all_to_all over an ep axis
# ---------------------------------------------------------------------

def expert_parallel_ffn(x_local, wr, w1, b1, w2, b2, axis_name: str,
                        k: int, capacity: int, act: Callable = nn.gelu):
    """Inside shard_map. x_local: ``[T/p, d]`` (this rank's tokens);
    w1/b1/w2/b2: this rank's resident experts (``[E/p, ...]``); router
    ``wr [d, E]`` replicated. ``capacity`` is per (expert, source rank).

    Dance: local routing → gather per-expert slots locally →
    ``all_to_all`` ships each expert's slots to its owner → owner runs
    the FFN for its E/p experts over tokens from every rank → reverse
    ``all_to_all`` → weighted combine. All ops are differentiable, so
    autodiff derives the reverse transfers for the backward pass.
    """
    tl, d = x_local.shape
    e = wr.shape[-1]
    gates = jax.nn.softmax(jnp.dot(x_local.astype(jnp.float32), wr), axis=-1)
    combine, dispatch, _ = topk_dispatch(gates, k, capacity)

    xe = jnp.einsum("tec,td->ecd", dispatch.astype(x_local.dtype), x_local)
    # [E, C, d] -> [E/p, p·C, d]: rank r receives slots for experts
    # [r·E/p, (r+1)·E/p) from every source rank
    xe = lax.all_to_all(xe, axis_name, split_axis=0, concat_axis=1, tiled=True)
    ye = expert_ffn(xe, w1.astype(x_local.dtype), b1, w2.astype(x_local.dtype),
                    b2, act)
    # reverse reshard: [E/p, p·C, d] -> [E, C, d]
    ye = lax.all_to_all(ye, axis_name, split_axis=1, concat_axis=0, tiled=True)
    return jnp.einsum("tec,ecd->td", combine.astype(x_local.dtype), ye)


def make_expert_parallel_mlp(mesh: Mesh, axis_name: str = "ep", *,
                             k: int = 2, capacity: int,
                             act: Callable = nn.gelu):
    """Host-level helper: f(x, wr, w1, b1, w2, b2) with tokens sharded
    over ``axis_name``, experts sharded over ``axis_name`` (dim 0), and
    the router replicated. Equals the dense ``MoEMlp`` computation when
    per-source-rank capacity admits every routed token."""
    fn = functools.partial(expert_parallel_ffn, axis_name=axis_name, k=k,
                           capacity=capacity, act=act)
    p = mesh.shape[axis_name]

    def _check(x, w1):
        if w1.shape[0] % p != 0:
            raise ValueError(f"num_experts {w1.shape[0]} must be divisible "
                             f"by the {axis_name}={p} mesh axis")
        if x.shape[0] % p != 0:
            raise ValueError(f"token count {x.shape[0]} must be divisible "
                             f"by the {axis_name}={p} mesh axis")

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(None, None), P(axis_name, None, None),
                  P(axis_name, None), P(axis_name, None, None), P(axis_name, None)),
        out_specs=P(axis_name, None),
        check_vma=False,
    )
    def ep_mlp(x, wr, w1, b1, w2, b2):
        return fn(x, wr, w1, b1, w2, b2)

    def checked(x, wr, w1, b1, w2, b2):
        _check(x, w1)
        return ep_mlp(x, wr, w1, b1, w2, b2)

    return checked
