"""MoE + expert parallelism tests (nn/moe.py, models/vit_moe.py).

Ground truth is the direct per-token formulation: y_t = sum over the
token's top-k experts of (renormalized gate) * FFN_e(x_t). Both
execution strategies (dense dispatch-einsum MoEMlp and the explicit
shard_map all_to_all path) must match it exactly when capacity admits
every routed token.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from passl_tpu.nn.moe import (MoEMlp, expert_ffn, load_balance_loss,
                              make_expert_parallel_mlp, moe_capacity,
                              topk_dispatch)


def _gelu(x):
    return np.asarray(jax.nn.gelu(jnp.asarray(x)))


def _direct_moe(x, wr, w1, b1, w2, b2, k):
    """Per-token reference (no capacity drops)."""
    t = x.shape[0]
    gates = np.asarray(jax.nn.softmax(jnp.asarray(x @ wr), axis=-1))
    out = np.zeros_like(x)
    for i in range(t):
        idx = np.argsort(-gates[i])[:k]
        sel = gates[i][idx] / gates[i][idx].sum()
        for w, e in zip(sel, idx):
            h = _gelu(x[i] @ w1[e] + b1[e])
            out[i] += w * (h @ w2[e] + b2[e])
    return out


def _rand_params(rs, e, d, h):
    wr = rs.randn(d, e).astype(np.float32) * 0.5
    w1 = rs.randn(e, d, h).astype(np.float32) * 0.1
    b1 = rs.randn(e, h).astype(np.float32) * 0.1
    w2 = rs.randn(e, h, d).astype(np.float32) * 0.1
    b2 = rs.randn(e, d).astype(np.float32) * 0.1
    return wr, w1, b1, w2, b2


def test_topk_dispatch_top1_no_drops():
    rs = np.random.RandomState(0)
    gates = jax.nn.softmax(jnp.asarray(rs.randn(16, 4), jnp.float32), axis=-1)
    combine, dispatch, first = topk_dispatch(gates, k=1, capacity=16)
    combine = np.asarray(combine)
    # every token lands exactly once with weight 1 (k=1 renormalization)
    assert np.allclose(combine.sum(axis=(1, 2)), 1.0)
    assert np.array_equal(np.asarray(dispatch), combine > 0)
    # dispatched expert is the argmax
    chosen = combine.sum(axis=2).argmax(axis=1)
    assert np.array_equal(chosen, np.asarray(gates).argmax(axis=1))
    assert np.array_equal(np.asarray(first).argmax(axis=1), chosen)


def test_topk_dispatch_capacity_drops_in_token_order():
    # all tokens prefer expert 0; capacity 8 keeps the first 8 (GShard
    # token-order priority), later tokens get zero combine weight
    gates = jnp.tile(jnp.asarray([[0.9, 0.1]], jnp.float32), (12, 1))
    combine, _, _ = topk_dispatch(gates, k=1, capacity=8)
    weights = np.asarray(combine).sum(axis=(1, 2))
    assert np.allclose(weights[:8], 1.0)
    assert np.allclose(weights[8:], 0.0)


def test_topk_dispatch_k2_renormalizes():
    rs = np.random.RandomState(1)
    gates = jax.nn.softmax(jnp.asarray(rs.randn(8, 4), jnp.float32), axis=-1)
    combine, _, _ = topk_dispatch(gates, k=2, capacity=16)
    assert np.allclose(np.asarray(combine).sum(axis=(1, 2)), 1.0, atol=1e-6)


def test_load_balance_loss_is_one_when_balanced():
    e = 4
    gates = jnp.tile(jnp.full((1, e), 1.0 / e, jnp.float32), (16, 1))
    first = jax.nn.one_hot(jnp.arange(16) % e, e, dtype=jnp.float32)
    assert np.allclose(float(load_balance_loss(gates, first)), 1.0, atol=1e-6)


def test_moe_capacity_rounds_to_sublanes():
    assert moe_capacity(100, 8, 2, 1.25) % 8 == 0
    assert moe_capacity(100, 8, 2, 1.25) >= int(np.ceil(2 * 100 / 8 * 1.25))


@pytest.mark.parametrize("k", [1, 2])
def test_dense_moe_matches_direct(k):
    rs = np.random.RandomState(2 + k)
    t, d, h, e = 24, 16, 32, 4
    x = rs.randn(t, d).astype(np.float32)
    wr, w1, b1, w2, b2 = _rand_params(rs, e, d, h)
    gates = jax.nn.softmax(jnp.asarray(x @ wr), axis=-1)
    combine, dispatch, _ = topk_dispatch(gates, k=k, capacity=t)  # no drops
    xe = jnp.einsum("tec,td->ecd", dispatch.astype(jnp.float32), jnp.asarray(x))
    ye = expert_ffn(xe, jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
                    jnp.asarray(b2))
    y = jnp.einsum("tec,ecd->td", combine, ye)
    ref = _direct_moe(x, wr, w1, b1, w2, b2, k)
    assert np.allclose(np.asarray(y), ref, atol=1e-4), np.abs(np.asarray(y) - ref).max()


@pytest.mark.parametrize("k", [1, 2])
def test_expert_parallel_matches_direct(k):
    """shard_map all_to_all EP over a 4-way `ep` axis == per-token ref."""
    ep = 4
    mesh = Mesh(np.asarray(jax.devices()[:ep]), ("ep",))
    rs = np.random.RandomState(10 + k)
    t, d, h, e = 32, 16, 24, 8
    x = rs.randn(t, d).astype(np.float32)
    wr, w1, b1, w2, b2 = _rand_params(rs, e, d, h)
    # per-source-rank capacity generous enough that nothing drops
    fn = make_expert_parallel_mlp(mesh, "ep", k=k, capacity=t // ep)
    y = fn(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(w1), jnp.asarray(b1),
           jnp.asarray(w2), jnp.asarray(b2))
    ref = _direct_moe(x, wr, w1, b1, w2, b2, k)
    assert np.allclose(np.asarray(y), ref, atol=1e-4), np.abs(np.asarray(y) - ref).max()


def test_expert_parallel_gradients_match_dense():
    ep = 4
    mesh = Mesh(np.asarray(jax.devices()[:ep]), ("ep",))
    rs = np.random.RandomState(20)
    t, d, h, e = 16, 8, 12, 4
    x = jnp.asarray(rs.randn(t, d), jnp.float32)
    wr, w1, b1, w2, b2 = [jnp.asarray(a) for a in _rand_params(rs, e, d, h)]
    fn = make_expert_parallel_mlp(mesh, "ep", k=2, capacity=t // ep)

    def loss_ep(x, w1, w2):
        return jnp.sum(jnp.square(fn(x, wr, w1, b1, w2, b2)))

    def loss_dense(x, w1, w2):
        gates = jax.nn.softmax(jnp.dot(x, wr), axis=-1)
        combine, dispatch, _ = topk_dispatch(gates, 2, t)
        xe = jnp.einsum("tec,td->ecd", dispatch.astype(x.dtype), x)
        ye = expert_ffn(xe, w1, b1, w2, b2)
        return jnp.sum(jnp.square(jnp.einsum("tec,ecd->td", combine, ye)))

    ge = jax.grad(loss_ep, argnums=(0, 1, 2))(x, w1, w2)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(ge, gd):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3), \
            np.abs(np.asarray(a) - np.asarray(b)).max()


def test_grouped_routing_matches_global_when_no_drops():
    """GShard grouping changes the one-hot footprint, not the math:
    with generous capacity the grouped module equals the global one."""
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(8, 6, 16), jnp.float32)  # 48 tokens
    kw = dict(num_experts=4, k=2, hidden_features=24, capacity_factor=8.0)
    m_global = MoEMlp(group_size=0, **kw)
    m_grouped = MoEMlp(group_size=12, **kw)  # 2 images / 12 tokens per group
    variables = m_global.init(jax.random.PRNGKey(0), x)
    yg, auxg = m_global.apply(variables, x)
    yk, auxk = m_grouped.apply(variables, x)
    assert np.allclose(np.asarray(yg), np.asarray(yk), atol=1e-5)
    assert np.allclose(float(auxg["moe_aux_loss"]), float(auxk["moe_aux_loss"]),
                       atol=1e-6)


def test_moe_mlp_module_and_aux():
    m = MoEMlp(num_experts=4, k=2, hidden_features=32, capacity_factor=2.0)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 9, 16), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y, aux = m.apply(variables, x)
    assert y.shape == x.shape
    assert set(aux) == {"moe_aux_loss", "moe_balance"}
    assert np.isfinite(float(aux["moe_aux_loss"]))
    assert float(aux["moe_balance"]) >= 0.99  # E·Σ f·P ≥ ~1


def test_vit_moe_train_and_eval_contract():
    from passl_tpu.engine.steps import make_train_step
    from passl_tpu.loss import build_loss
    from passl_tpu.models import build_model
    from passl_tpu.optimizer import build_optimizer
    from passl_tpu.core import TrainState

    model = build_model({"name": "VisionTransformerMoE", "img_size": 32,
                         "patch_size": 8, "embed_dim": 64, "depth": 2,
                         "num_heads": 2, "num_classes": 10,
                         "num_experts": 4, "moe_k": 2, "moe_interval": 2})
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=True)
    # block 1 (odd) is MoE, block 0 dense
    assert "moe" in variables["params"]["blocks_1"]
    assert "mlp" in variables["params"]["blocks_0"]

    out = model.apply(variables, x, train=True, rngs={"dropout": rng})
    assert set(out) == {"logits", "moe_aux_loss", "moe_balance"}
    logits_eval = model.apply(variables, x, train=False)
    assert logits_eval.shape == (4, 10)

    criterion = build_loss([{"CELoss": {}}])
    opt = build_optimizer({"name": "AdamW", "weight_decay": 0.05},
                          variables["params"])
    step = jax.jit(make_train_step(model, opt, lambda s: 1e-3,
                                   criterion=criterion))
    state = TrainState.create(variables["params"], {}, opt.init(variables["params"]),
                              rng)
    y = jnp.asarray(np.arange(4) % 10, jnp.int32)
    state, metrics = step(state, (x, y))
    assert np.isfinite(float(metrics["loss"]))
    assert "moe_aux_loss" in metrics and np.isfinite(float(metrics["moe_aux_loss"]))
    assert "moe_balance" in metrics


def test_vit_moe_sharded_train_step():
    """Full hybrid dp2·fsdp2·tp2 mesh: expert dim rides fsdp (EP), expert
    hidden rides tp — the declarative EP path end-to-end."""
    from passl_tpu import distributed as dist
    from passl_tpu.core import TrainState
    from passl_tpu.distributed.sharding import (MOE_SHARD_RULES, VIT_TP_RULES,
                                                shard_train_state)
    from passl_tpu.engine.steps import make_train_step
    from passl_tpu.loss import build_loss
    from passl_tpu.models import build_model
    from passl_tpu.optimizer import build_optimizer

    mesh = dist.build_mesh(dp=2, fsdp=2, tp=2)
    model = build_model({"name": "VisionTransformerMoE", "img_size": 32,
                         "patch_size": 8, "embed_dim": 64, "depth": 2,
                         "num_heads": 2, "num_classes": 10,
                         "num_experts": 4, "moe_k": 2, "moe_interval": 2})
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=True)
    params = variables["params"]
    criterion = build_loss([{"CELoss": {}}])
    opt = build_optimizer({"name": "AdamW", "weight_decay": 0.05}, params)
    state = TrainState.create(params, {}, opt.init(params), rng)
    state, _ = shard_train_state(state, mesh,
                                 tp_rules=VIT_TP_RULES + MOE_SHARD_RULES,
                                 use_fsdp=True)
    w1 = state.params["blocks_1"]["moe"]["w1"]
    assert w1.sharding.spec == P("fsdp", None, "tp")

    step = jax.jit(make_train_step(model, opt, lambda s: 1e-3,
                                   criterion=criterion), donate_argnums=0)
    data_sh = NamedSharding(mesh, P(dist.DATA_AXES, None, None, None))
    lab_sh = NamedSharding(mesh, P(dist.DATA_AXES))
    xb = jax.device_put(np.random.RandomState(0).rand(8, 32, 32, 3).astype("float32"), data_sh)
    yb = jax.device_put(np.arange(8, dtype="int32") % 10, lab_sh)
    state, metrics = step(state, (xb, yb))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["moe_aux_loss"]))


def test_mocov3_moe_composition():
    """SSL x MoE: MoCo v3 over a V-MoE backbone (models/mocov3.MoCoV3ViT
    with num_experts > 0). The router aux loss must join the objective
    through the base towers only (momentum tower is stop-grad), and the
    eval path must return plain features for the linear probe."""
    from passl_tpu.models import build_model

    enc = {"img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2,
           "num_heads": 4, "num_experts": 4, "moe_interval": 2}
    m = build_model({"name": "MoCoV3Pretrain", "encoder": enc,
                     "dim": 32, "mlp_dim": 64})
    rng = jax.random.PRNGKey(0)
    r = np.random.RandomState(3)
    batch = {"view1": jnp.asarray(r.rand(8, 32, 32, 3), jnp.float32),
             "view2": jnp.asarray(r.rand(8, 32, 32, 3), jnp.float32)}
    variables = m.init({"params": rng, "dropout": rng}, batch, train=True)
    # odd blocks are MoE in both towers
    assert "moe" in variables["params"]["base"]["encoder"]["blocks_1"]
    assert "moe" in variables["params"]["momentum"]["encoder"]["blocks_1"]
    assert "mlp" in variables["params"]["base"]["encoder"]["blocks_0"]

    out, _ = m.apply(variables, batch, train=True, mutable=["batch_stats"],
                     rngs={"dropout": rng})
    assert {"loss", "acc1", "moe_balance"} <= set(out)
    assert np.isfinite(float(out["loss"]))

    # loss includes the router aux term: base-tower routers get gradient,
    # the stop-grad momentum-tower routers do not
    def loss_fn(p):
        o, _ = m.apply({**variables, "params": p}, batch, train=True,
                       mutable=["batch_stats"], rngs={"dropout": rng})
        return o["loss"]

    g = jax.grad(loss_fn)(variables["params"])
    g_base = g["base"]["encoder"]["blocks_1"]["moe"]["router"]
    g_mom = g["momentum"]["encoder"]["blocks_1"]["moe"]["router"]
    assert float(jnp.linalg.norm(g_base)) > 0.0
    assert float(jnp.linalg.norm(g_mom)) == 0.0

    # 2-D expert biases get the wd=0 override the 1-D exemption misses
    assert m.optimizer_overrides() == [{"name": r"moe/(b1|b2)$",
                                        "weight_decay": 0.0}]

    # probe path: eval-mode encoder returns a plain feature tensor
    from passl_tpu.models.mocov3 import MoCoV3ViT

    ev = MoCoV3ViT(**enc)
    v2 = ev.init({"params": rng}, batch["view1"], train=False)
    feats = ev.apply(v2, batch["view1"], train=False)
    assert feats.shape == (8, 64)
