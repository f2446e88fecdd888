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


class _FakeDev:
    """Mock device with the only attributes hybrid placement reads."""

    def __init__(self, i, proc):
        self.id = i
        self.process_index = proc

    def __repr__(self):
        return f"d{self.id}@p{self.process_index}"


def _fake_topology(nproc, per_proc):
    return [_FakeDev(p * per_proc + i, p)
            for p in range(nproc) for i in range(per_proc)]


def test_hybrid_grid_keeps_model_axes_intra_process():
    """DCN-aware placement (reference env.py:232-269,306-332 rank-grid
    transpose): tp and fsdp groups must never straddle a process; dp
    must be the axis that crosses processes."""
    devs = _fake_topology(nproc=2, per_proc=4)
    grid = dist.hybrid_device_grid(devs, dp=2, fsdp=2, tp=2)
    assert grid.shape == (2, 2, 2)
    # each (fsdp, tp) plane = one dp slice = one process
    for d in range(2):
        procs = {dev.process_index for dev in grid[d].ravel()}
        assert len(procs) == 1, f"model axes straddle processes: {grid[d]}"
    # dp axis spans both processes
    assert {grid[0, 0, 0].process_index, grid[1, 0, 0].process_index} == {0, 1}
    # every tp pair intra-process
    for d in range(2):
        for f in range(2):
            pair = grid[d, f]
            assert pair[0].process_index == pair[1].process_index


def test_hybrid_grid_dp_inner_and_outer():
    """4 procs x 4 devs, fsdp2*tp2=4/proc with dp4: dp splits into
    4 inter-process blocks; rank-major batch layout preserved (dp block
    d lives entirely on process d)."""
    devs = _fake_topology(nproc=4, per_proc=4)
    grid = dist.hybrid_device_grid(devs, dp=4, fsdp=2, tp=2)
    for d in range(4):
        assert {dev.process_index for dev in grid[d].ravel()} == {d}


def test_hybrid_grid_dp_inner_gt_one_rank_major():
    """2 procs x 8 devs, tp2 only: dp=8 -> dp_inner=4 per proc; the dp
    index must be process-major (rows [0,4) on proc 0, [4,8) on proc 1)
    so the loops.py _host_rows rank-major contract holds."""
    devs = _fake_topology(nproc=2, per_proc=8)
    grid = dist.hybrid_device_grid(devs, dp=8, fsdp=1, tp=2)
    assert grid.shape == (8, 1, 2)
    for d in range(8):
        expect = 0 if d < 4 else 1
        assert {dev.process_index for dev in grid[d].ravel()} == {expect}
        assert grid[d, 0, 0].process_index == grid[d, 0, 1].process_index


def test_hybrid_grid_untileable_falls_back_flat():
    """tp=8 over 2x4 procs cannot stay intra-process: fall back to the
    flat reshape (with a warning) instead of crashing."""
    devs = _fake_topology(nproc=2, per_proc=4)
    grid = dist.hybrid_device_grid(devs, dp=1, fsdp=1, tp=8)
    assert grid.shape == (1, 1, 8)
    assert [d.id for d in grid.ravel()] == list(range(8))


def test_hybrid_grid_with_pp_axis():
    """pp kept intra-process alongside fsdp/tp; dp crosses procs."""
    devs = _fake_topology(nproc=2, per_proc=4)
    grid = dist.hybrid_device_grid(devs, dp=2, fsdp=1, tp=2, pp=2)
    assert grid.shape == (2, 2, 1, 2)
    for d in range(2):
        assert len({dev.process_index for dev in grid[d].ravel()}) == 1


def test_single_process_grid_unchanged():
    """nproc=1 keeps the plain device-order reshape (bit-identical
    meshes to rounds 1-3; goldens depend on this)."""
    devs = _fake_topology(nproc=1, per_proc=8)
    grid = dist.hybrid_device_grid(devs, dp=2, fsdp=2, tp=2)
    assert [d.id for d in grid.ravel()] == list(range(8))
