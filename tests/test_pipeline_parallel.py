"""Pipeline parallelism: GPipe schedule over the pp mesh axis.

The reference has no in-tree PP compute (env plumbing only,
passl/distributed/env.py:306-332); these tests validate our actual
implementation against a sequential single-device run — forward AND
gradients (autodiff through ppermute)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passl_tpu import distributed as dist
from passl_tpu.distributed.pipeline import (make_pipelined_blocks,
                                            pipeline_apply,
                                            stack_stage_params)


def _pp_mesh(pp=4):
    return dist.build_mesh(dp=1, fsdp=1, tp=1, pp=pp,
                           devices=jax.devices()[:pp])


def _mlp_layer_params(rng, d):
    k1, k2 = jax.random.split(rng)
    return {"w1": jax.random.normal(k1, (d, 2 * d)) * 0.05,
            "w2": jax.random.normal(k2, (2 * d, d)) * 0.05}


def _mlp_block(p, x):
    return x + jnp.tanh(x @ p["w1"]) @ p["w2"]


def test_pipeline_matches_sequential_forward():
    S, L, M, mb, d = 4, 8, 8, 2, 16
    mesh = _pp_mesh(S)
    rng = jax.random.PRNGKey(0)
    layers = [_mlp_layer_params(jax.random.fold_in(rng, i), d) for i in range(L)]
    x = jax.random.normal(jax.random.fold_in(rng, 99), (M, mb, d))

    stacked = stack_stage_params(layers, S)
    pp_fn = make_pipelined_blocks(_mlp_block, mesh)
    y_pp = jax.jit(pp_fn)(stacked, x)

    y_seq = x
    for p in layers:
        y_seq = _mlp_block(p, y_seq)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq), rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential():
    S, L, M, mb, d = 2, 4, 4, 2, 8
    mesh = _pp_mesh(S)
    rng = jax.random.PRNGKey(1)
    layers = [_mlp_layer_params(jax.random.fold_in(rng, i), d) for i in range(L)]
    x = jax.random.normal(jax.random.fold_in(rng, 99), (M, mb, d))
    stacked = stack_stage_params(layers, S)
    pp_fn = make_pipelined_blocks(_mlp_block, mesh)

    def loss_pp(params):
        return jnp.sum(jnp.square(pp_fn(params, x)))

    def loss_seq(layer_list):
        y = x
        for p in layer_list:
            y = _mlp_block(p, y)
        return jnp.sum(jnp.square(y))

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_seq = jax.grad(loss_seq)(layers)
    g_seq_stacked = stack_stage_params(g_seq, S)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pipeline_composes_with_data_parallel():
    """dp2 x pp4 mesh: batch sharded over dp, stages over pp."""
    mesh = dist.build_mesh(dp=2, fsdp=1, tp=1, pp=4)
    assert dict(mesh.shape) == {"dp": 2, "pp": 4, "fsdp": 1, "tp": 1}
    S, L, M, mb, d = 4, 4, 4, 2, 8
    rng = jax.random.PRNGKey(2)
    layers = [_mlp_layer_params(jax.random.fold_in(rng, i), d) for i in range(L)]
    stacked = stack_stage_params(layers, S)
    x = jax.random.normal(jax.random.fold_in(rng, 99), (M, mb, d))
    pp_fn = make_pipelined_blocks(_mlp_block, mesh)
    y = jax.jit(pp_fn)(stacked, x)
    y_seq = x
    for p in layers:
        y_seq = _mlp_block(p, y_seq)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_seq), rtol=2e-5, atol=2e-5)
