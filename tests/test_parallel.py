"""Parallelism tests: ring TP, Ulysses SP, FSDP/TP state sharding,
parallel softmax/CE collectives — on the 8-device CPU mesh."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from passl_tpu import distributed as dist
from passl_tpu.nn.tp_layers import make_ring_linear, make_ulysses_attention


def _tp_mesh(tp=4):
    devs = np.asarray(jax.devices()[:tp]).reshape(1, 1, tp)
    return Mesh(devs, dist.MESH_AXES)


def test_ring_column_linear_matches_dense_and_grads():
    mesh = _tp_mesh(4)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(8, 16), jnp.float32)
    w = jnp.asarray(rs.rand(16, 32), jnp.float32)
    ring = make_ring_linear(mesh, "tp", kind="column")
    y = ring(x, w)
    assert np.allclose(np.asarray(y), np.asarray(x @ w), atol=1e-4)

    def loss_ring(x, w):
        return jnp.sum(jnp.square(ring(x, w)))

    def loss_dense(x, w):
        return jnp.sum(jnp.square(x @ w))

    gr = jax.grad(loss_ring, argnums=(0, 1))(x, w)
    gd = jax.grad(loss_dense, argnums=(0, 1))(x, w)
    assert np.allclose(np.asarray(gr[0]), np.asarray(gd[0]), atol=1e-3)
    assert np.allclose(np.asarray(gr[1]), np.asarray(gd[1]), atol=1e-3)


def test_ring_row_linear_matches_dense():
    mesh = _tp_mesh(4)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(8, 32), jnp.float32)
    w = jnp.asarray(rs.rand(32, 24), jnp.float32)
    ring = make_ring_linear(mesh, "tp", kind="row")
    y = ring(x, w)
    assert np.allclose(np.asarray(y), np.asarray(x @ w), atol=1e-4)


def test_ulysses_attention_matches_dense():
    mesh = _tp_mesh(4)
    rs = np.random.RandomState(2)
    n, s, h, d = 2, 16, 8, 8
    q = jnp.asarray(rs.rand(n, s, h, d), jnp.float32)
    k = jnp.asarray(rs.rand(n, s, h, d), jnp.float32)
    v = jnp.asarray(rs.rand(n, s, h, d), jnp.float32)
    ul = make_ulysses_attention(mesh, "tp")
    out = ul(q, k, v)
    # dense reference
    attn = jax.nn.softmax(jnp.einsum("nqhd,nkhd->nhqk", q * d**-0.5, k), axis=-1)
    ref = jnp.einsum("nhqk,nkhd->nqhd", attn, v)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_parallel_softmax_and_ce():
    from passl_tpu.distributed import functional as F

    devs = np.asarray(jax.devices())[:4]
    mesh = Mesh(devs.reshape(4), ("tp",))
    rs = np.random.RandomState(3)
    logits = jnp.asarray(rs.randn(8, 32), jnp.float32)
    labels = jnp.asarray(rs.randint(0, 32, (8,)), jnp.int32)

    ps = shard_map(lambda l: F.parallel_softmax(l, "tp"), mesh=mesh,
                   in_specs=P(None, "tp"), out_specs=P(None, "tp"))
    out = ps(logits)
    assert np.allclose(np.asarray(out), np.asarray(jax.nn.softmax(logits, -1)), atol=1e-5)

    pce = shard_map(lambda l, y: F.parallel_cross_entropy(l, y, "tp"), mesh=mesh,
                    in_specs=(P(None, "tp"), P(None)), out_specs=P(None),
                    check_vma=False)
    ce = pce(logits, labels)
    logp = jax.nn.log_softmax(logits, -1)
    ref = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
    assert np.allclose(np.asarray(ce), np.asarray(ref), atol=1e-5)


def test_reshard_transpose_roundtrip():
    from passl_tpu.distributed import functional as F

    devs = np.asarray(jax.devices())[:4]
    mesh = Mesh(devs.reshape(4), ("sp",))
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.rand(2, 16, 8, 4), jnp.float32)  # [N, S, H, C]

    def roundtrip(x):
        y = F.reshard_transpose(x, in_axis=1, out_axis=2, axis_name="sp")
        return F.reshard_transpose(y, in_axis=2, out_axis=1, axis_name="sp")

    fn = shard_map(roundtrip, mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None, "sp"))
    out = fn(x)
    assert np.allclose(np.asarray(out), np.asarray(x))


def test_engine_level_fsdp_tp_sharding_applies():
    """shard_train_state must land TP specs on ViT qkv/mlp kernels and
    FSDP elsewhere (this is what the Engine does for
    DistributedStrategy degrees > 1)."""
    import jax

    from passl_tpu.core import TrainState
    from passl_tpu.distributed.sharding import VIT_TP_RULES, shard_train_state
    from passl_tpu.models import build_model
    from passl_tpu.optimizer import build_optimizer

    mesh = dist.build_mesh(dp=2, fsdp=2, tp=2)
    model = build_model({"name": "VisionTransformer", "img_size": 32, "patch_size": 8,
                         "embed_dim": 128, "depth": 1, "num_heads": 4, "num_classes": 8})
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 32, 32, 3))
    v = jax.jit(functools.partial(model.init, train=False))({"params": rng}, x)
    params = v["params"]
    opt = build_optimizer({"name": "AdamW"}, params)
    state = TrainState.create(params, {}, opt.init(params), rng)
    state, shardings = shard_train_state(state, mesh, tp_rules=VIT_TP_RULES)
    qkv = state.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "tp" in str(qkv.sharding.spec)
    # moments share the param sharding
    m_shard = state.opt_state["blocks_0/attn/qkv/kernel"]["m"].sharding
    assert m_shard.spec == qkv.sharding.spec
