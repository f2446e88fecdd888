"""Differentiable collectives for use inside `shard_map` regions.

Capability parity with reference `passl/distributed/nn/functional.py`:
  - `split` / `all_gather` with correct transposed gradients
    (fwd slice ↔ bwd all_gather; fwd all_gather ↔ bwd reduce_scatter,
    reference :80-127) — here `jax.lax` collectives are natively
    differentiable with exactly these adjoints, so the wrappers are thin.
  - `parallel_softmax` over a dimension sharded across an axis
    (reference ParallelSoftmax :129-167): max/sum via `psum`/`pmax`.
  - `reshard_transpose` — the DeepSpeed-Ulysses sequence↔head all-to-all
    (reference :49-77), implemented with `jax.lax.all_to_all`.

All functions take an `axis_name` (a mesh axis) instead of an NCCL group.
They are meaningful only inside `shard_map`/`pmap`-style contexts; under
plain `jit` with shardings, XLA inserts equivalents automatically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def all_gather(x: jnp.ndarray, axis_name: str, axis: int = 0, tiled: bool = True) -> jnp.ndarray:
    """Gather shards along `axis` from every member of `axis_name`.
    Differentiable: the VJP is a reduce-scatter (psum_scatter)."""
    return lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def split(x: jnp.ndarray, axis_name: str, axis: int = 0) -> jnp.ndarray:
    """Keep only this member's shard of `x` along `axis`.
    Differentiable: the VJP all-gathers the incoming gradient."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    size = x.shape[axis] // n
    return lax.dynamic_slice_in_dim(x, idx * size, size, axis=axis)


def reduce_scatter(x: jnp.ndarray, axis_name: str, axis: int = 0) -> jnp.ndarray:
    return lax.psum_scatter(x, axis_name, scatter_dimension=axis, tiled=True)


def parallel_softmax(logits: jnp.ndarray, axis_name: str, axis: int = -1) -> jnp.ndarray:
    """Softmax where `axis` is sharded across `axis_name` members.
    Numerically-stable two-pass: global max via pmax, global denominator
    via psum. Gradients flow through psum correctly (its adjoint is psum)."""
    m = lax.pmax(lax.stop_gradient(jnp.max(logits, axis=axis, keepdims=True)), axis_name)
    e = jnp.exp(logits - m)
    denom = lax.psum(jnp.sum(e, axis=axis, keepdims=True), axis_name)
    return e / denom


def parallel_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Cross entropy with the class dim sharded over `axis_name`.
    `labels` are global class ids; each shard contributes its local piece."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    vocab_local = logits.shape[-1]
    m = lax.pmax(lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True)), axis_name)
    shifted = logits - m
    lse = jnp.log(lax.psum(jnp.sum(jnp.exp(shifted), axis=-1), axis_name))
    local_labels = labels - idx * vocab_local
    in_shard = (local_labels >= 0) & (local_labels < vocab_local)
    safe = jnp.clip(local_labels, 0, vocab_local - 1)
    picked = jnp.take_along_axis(shifted, safe[..., None], axis=-1)[..., 0]
    picked = lax.psum(jnp.where(in_shard, picked, 0.0), axis_name)
    return lse - picked


def reshard_transpose(x: jnp.ndarray, in_axis: int, out_axis: int, axis_name: str) -> jnp.ndarray:
    """Ulysses all-to-all reshard: move the shard dimension from
    `in_axis` to `out_axis` (e.g. sequence→heads: [N, S/p, H, C] →
    [N, S, H/p, C]). Mirrors reference `reshard_transpose` semantics with
    a single `lax.all_to_all` (differentiable; adjoint is the inverse
    all-to-all)."""
    return lax.all_to_all(x, axis_name, split_axis=out_axis, concat_axis=in_axis, tiled=True)


def grad_sync(grads, axis_name: str):
    """Mean-reduce gradients across a data axis (reference
    core/sync_utils.py:18-43). Under pjit this is implicit; needed only
    inside shard_map training steps."""
    return jax.tree_util.tree_map(lambda g: lax.pmean(g, axis_name), grads)
