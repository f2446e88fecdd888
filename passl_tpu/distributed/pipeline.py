"""Pipeline parallelism over a `pp` mesh axis.

The reference only *plumbs* a pp_degree through its env and seed
derivation (`passl/distributed/env.py:306-332`, `env.py:52-53`) — no
pipeline-partitioned model exists in-tree. Here PP is actually
implemented, TPU-natively: a GPipe schedule expressed inside
`shard_map`, with `jax.lax.ppermute` carrying activations stage→stage
over ICI. Autodiff differentiates straight through the loop (ppermute
has a transpose rule), so the same primitive serves training.

Layout contract:
  - the mesh has a `pp` axis of size S (see `build_mesh(pp=...)`)
  - layer params are STACKED on a leading stage axis of size S and
    sharded over `pp` (each device holds its stage's layer stack)
  - the batch enters as M microbatches [M, mb, ...]; stage 0 consumes
    one per tick, stage S-1 emits one per tick after an S-1 tick fill

The schedule runs M + S - 1 ticks; bubble fraction (S-1)/(M+S-1) — pick
M >= 4·S in production. All shapes are static; the tick loop is a
`lax.fori_loop`, so the compiled program is O(1) in M.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable,
    mesh: Mesh,
    axis: str = "pp",
    data_axes=None,
):
    """Build `fn(stacked_params, microbatches) -> outputs`.

    stage_fn(layer_params, x) -> x  applies ONE stage's layer stack;
    `stacked_params` is a pytree whose leaves have a leading axis of
    size S (the pp degree) — leaf i holds stage i's params.
    `microbatches` is [M, mb, ...]; output matches.

    `data_axes` (e.g. `dist.DATA_AXES`) shards the SAMPLE dim (dim 1 of
    [M, mb, ...]) so the schedule composes with data parallelism: each
    dp replica pipelines its own microbatch slice, XLA reduces grads
    over dp as usual. None keeps the input replicated (microbenchmark
    mode, the original behavior).
    """
    S = mesh.shape[axis]
    perm = [(i, (i + 1) % S) for i in range(S)]

    def _local(params, x):
        # params arrive as this stage's block [1, ...] (shard_map keeps
        # the sharded axis at local size 1) — strip it
        params = jax.tree_util.tree_map(lambda a: a[0], params)
        # x: full [M, mb, ...] (replicated across pp)
        idx = jax.lax.axis_index(axis)
        M = x.shape[0]
        mb_shape = x.shape[1:]
        out = jnp.zeros_like(x)
        carry = jnp.zeros(mb_shape, x.dtype)

        def tick(t, state):
            out, carry = state
            mb = t - idx  # which microbatch this stage works on at tick t
            mb_c = jnp.clip(mb, 0, M - 1)
            inp = jnp.where(idx == 0,
                            jax.lax.dynamic_index_in_dim(x, mb_c, 0, keepdims=False),
                            carry)
            y = stage_fn(params, inp)
            valid = (mb >= 0) & (mb < M)
            is_last = idx == S - 1
            # last stage deposits its finished microbatch
            upd = jnp.where(valid & is_last, y, jax.lax.dynamic_index_in_dim(out, mb_c, 0, keepdims=False))
            out = jax.lax.dynamic_update_index_in_dim(out, upd, mb_c, 0)
            # everyone forwards to the next stage (wrap-around from the
            # last stage is ignored by stage 0, which reads from x)
            carry = jax.lax.ppermute(y, axis, perm)
            return out, carry

        out, _ = jax.lax.fori_loop(0, M + S - 1, tick, (out, carry))
        # only the last stage deposited results; replicate across pp so
        # the P() out_spec holds (every other stage's buffer is zeros)
        return jax.lax.psum(out, axis)

    xspec = P(None, data_axes) if data_axes is not None else P()
    in_specs = (P(axis), xspec)  # params sharded by stage
    out_specs = xspec

    from jax import shard_map

    fn = shard_map(_local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return fn


def stack_stage_params(layer_params_list, num_stages: int):
    """[L layer pytrees] → pytree with leaves [S, L/S, ...]: stage-major
    stacking so `pipeline_apply`'s shard strips the stage axis."""
    L = len(layer_params_list)
    assert L % num_stages == 0, f"{L} layers not divisible by {num_stages} stages"
    per = L // num_stages
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_params_list)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(num_stages, per, *x.shape[1:]), stacked)


def make_pipelined_blocks(block_apply: Callable, mesh: Mesh, axis: str = "pp",
                          data_axes=None):
    """Pipeline a homogeneous residual-block stack.

    block_apply(single_layer_params, x) -> x. Each stage scans its local
    [L/S, ...] layer stack, so arbitrarily deep models compile O(1).
    Returns fn(stacked_params [S, L/S, ...], microbatches [M, mb, ...]).
    """

    def stage_fn(stage_params, x):
        def body(x, layer):
            return block_apply(layer, x), None

        x, _ = jax.lax.scan(body, x, stage_params)
        return x

    return pipeline_apply(stage_fn, mesh, axis=axis, data_axes=data_axes)
