"""SSL method zoo tests: MoCo, BYOL, SimSiam, SwAV semantics."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from passl_tpu.core import TrainState
from passl_tpu.engine.steps import ema_momentum_schedule, make_train_step
from passl_tpu.models import build_model
from passl_tpu.models.swav import sinkhorn_knopp
from passl_tpu.optimizer import build_optimizer
from passl_tpu.scheduler import build_lr_scheduler
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (smoke tier skips)

BACKBONE = {"name": "resnet18", "num_classes": 0, "with_pool": False, "cifar_stem": True}
RNGS = ("params", "dropout", "shuffle", "aug")


def _init(model, rng, batch, train=True):
    import functools

    rngs = {n: jax.random.fold_in(rng, i) for i, n in enumerate(RNGS)}
    variables = jax.jit(functools.partial(model.init, train=train))(rngs, batch)
    return variables["params"], {k: v for k, v in variables.items() if k != "params"}


def _sync_pairs(params, model):
    params = dict(params)
    for src, dst, _ in model.ema_map():
        params[dst] = jax.tree_util.tree_map(jnp.copy, params[src])
    return params


def _train(model, batch, steps=3, opt_cfg=None, lr=0.05):
    rng = jax.random.PRNGKey(0)
    params, model_state = _init(model, rng, batch)
    if hasattr(model, "ema_map") and model.ema_map():
        params = _sync_pairs(params, model)
    frozen = model.frozen_patterns() if hasattr(model, "frozen_patterns") else []
    opt = build_optimizer(opt_cfg or {"name": "Momentum", "momentum": 0.9}, params,
                          frozen_patterns=frozen)
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": lr}, 1, 1)
    ema_pairs = [(s, d, ema_momentum_schedule(c, 100)) for s, d, c in model.ema_map()] \
        if hasattr(model, "ema_map") else []
    pt = model.param_transforms() if hasattr(model, "param_transforms") else []
    state = TrainState.create(params, model_state, opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn, ema_pairs=ema_pairs, param_transforms=pt),
                   donate_argnums=0)
    losses = []
    for _ in range(steps):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return state, losses


def test_moco_queue_and_momentum(mesh):
    model = build_model({
        "name": "MoCo", "backbone": dict(BACKBONE, bn_splits=4),
        "neck": {"name": "NonLinearNeckV1", "hid_channels": 256, "out_channels": 32},
        "dim": 32, "K": 64, "m": 0.9, "T": 0.07,
    })
    rs = np.random.RandomState(0)
    batch = (jnp.asarray(rs.rand(16, 32, 32, 3), jnp.float32),
             jnp.asarray(rs.rand(16, 32, 32, 3), jnp.float32))
    state, losses = _train(model, batch, steps=4)
    assert np.isfinite(losses).all()
    # queue pointer advanced: 4 steps x 16 keys mod 64
    ptr = traverse_util.flatten_dict(state.model_state["ssl"], sep="/")
    ptr_val = [v for k, v in ptr.items() if "queue_ptr" in k][0]
    assert int(ptr_val) == (4 * 16) % 64
    # queue columns are unit-norm (enqueued normalized keys)
    q = [v for k, v in ptr.items() if k.endswith("queue")][0]
    norms = np.linalg.norm(np.asarray(q), axis=0)
    assert np.allclose(norms, 1.0, atol=1e-3)
    # encoder_k must equal EMA trajectory, not be optimized: check that
    # encoder_k != encoder_q (they drift apart but stay close)
    fp = traverse_util.flatten_dict(state.params, sep="/")
    dq = fp["encoder_q/backbone/conv1/kernel"]
    dk = fp["encoder_k/backbone/conv1/kernel"]
    assert not np.allclose(np.asarray(dq), np.asarray(dk))


def test_byol_ema_target_tracks_online(mesh):
    model = build_model({
        "name": "BYOL", "backbone": BACKBONE,
        "neck": {"name": "NonLinearNeckV2", "hid_channels": 128, "out_channels": 64},
        "predictor": {"name": "NonLinearNeckV2", "hid_channels": 128, "out_channels": 64,
                      "with_avg_pool": False},
        "base_momentum": 0.9, "momentum_schedule": "fixed",
    })
    rs = np.random.RandomState(1)
    batch = (jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32),
             jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32))
    state, losses = _train(model, batch, steps=3)
    assert np.isfinite(losses).all()
    assert 0.0 < losses[0] < 8.0  # sum of two view losses, each 2-2cos in [0,4]


def test_simsiam_loss_range(mesh):
    model = build_model({
        "name": "SimSiam", "backbone": BACKBONE,
        "neck": {"name": "NonLinearNeckfc3", "hid_channels": 128, "out_channels": 64},
        "predictor": {"name": "NonLinearNeckV2", "hid_channels": 64, "out_channels": 64,
                      "with_avg_pool": False},
    })
    rs = np.random.RandomState(2)
    batch = (jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32),
             jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32))
    state, losses = _train(model, batch, steps=3)
    assert np.isfinite(losses).all()
    assert -1.0 <= losses[-1] <= 0.1  # negative cosine in [-1, 0]
    assert losses[-1] < losses[0]


def test_sinkhorn_doubly_stochastic():
    rs = np.random.RandomState(0)
    scores = jnp.asarray(rs.randn(32, 8), jnp.float32)
    q = np.asarray(sinkhorn_knopp(scores, epsilon=0.05, iterations=3))
    # rows sum to ~1 (per-sample assignment distribution)
    assert np.allclose(q.sum(axis=1), 1.0, atol=1e-3)
    # with enough iterations the transport polytope is reached:
    # columns balance to B/K (3 iters is the reference's approximation)
    q50 = np.asarray(sinkhorn_knopp(scores, epsilon=0.05, iterations=50))
    assert np.allclose(q50.sum(axis=0), 32 / 8, atol=0.05), q50.sum(axis=0)
    assert np.allclose(q50.sum(axis=1), 1.0, atol=0.05)


def test_swav_multicrop_and_prototype_norm(mesh):
    model = build_model({
        "name": "SwAV", "backbone": BACKBONE,
        "neck": {"name": "SwAVNeck", "hid_channels": 128, "out_channels": 32},
        "dim": 32, "num_prototypes": 16, "num_crops": [2, 2],
        "crops_for_assign": [0, 1], "freeze_prototypes_iter": 2,
    })
    rs = np.random.RandomState(3)
    crops = [jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32) for _ in range(2)] + \
            [jnp.asarray(rs.rand(8, 16, 16, 3), jnp.float32) for _ in range(2)]
    state, losses = _train(model, crops, steps=3,
                           opt_cfg={"name": "MomentumLARS", "momentum": 0.9,
                                    "param_group": [{"name": r"^prototypes/", "freeze_steps": 2}]})
    assert np.isfinite(losses).all()
    w = np.asarray(traverse_util.flatten_dict(state.params, sep="/")["prototypes/kernel"])
    assert np.allclose(np.linalg.norm(w, axis=0), 1.0, atol=1e-3)


def test_device_augment_shapes_and_range():
    from passl_tpu.ops import augment

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (4, 32, 32, 3), np.uint8))
    v1, v2 = augment.byol_device_augment(x, x, rng)
    assert v1.shape == (4, 32, 32, 3) and v2.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(v1)).all() and np.isfinite(np.asarray(v2)).all()
    # color jitter keeps range and shape
    y = augment.color_jitter(augment.to_float(x), rng)
    assert y.shape == x.shape
    assert float(jnp.min(y)) >= -1e-5 and float(jnp.max(y)) <= 1.0 + 1e-5
    # blur with sigma→0.1 ~ identity-ish; large sigma smooths
    xf = augment.to_float(x)
    sharp = augment.gaussian_blur(xf, jnp.full((4,), 0.1), taps=7)
    smooth = augment.gaussian_blur(xf, jnp.full((4,), 5.0), taps=23)
    assert float(jnp.std(smooth)) < float(jnp.std(sharp))


def test_fastmoco_combinatorial_queries(mesh):
    from passl_tpu.models.fastmoco import combine_embeddings, split_patches

    # patch split/roundtrip sanity
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    p = split_patches(x, 2)
    assert p.shape == (8, 4, 4, 3)
    # combination means: s2=4, r=2 -> 6 subsets
    z = jnp.asarray(np.random.RandomState(0).rand(8, 5), jnp.float32)
    c = combine_embeddings(z, 4, 2)
    assert c.shape == (2 * 6, 5)
    zp = np.asarray(z).reshape(2, 4, 5)
    assert np.allclose(np.asarray(c)[0], (zp[0, 0] + zp[0, 1]) / 2, atol=1e-6)

    model = build_model({
        "name": "FastMoCo", "backbone": BACKBONE,
        "neck": {"name": "NonLinearNeckV2", "hid_channels": 64, "out_channels": 32},
        "predictor": {"name": "NonLinearNeckV2", "hid_channels": 64, "out_channels": 32,
                      "with_avg_pool": False},
        "divide": 2, "combine_r": 2, "T": 0.5, "base_momentum": 0.9,
    })
    rs = np.random.RandomState(5)
    batch = (jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32),
             jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32))
    state, losses = _train(model, batch, steps=3)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dino_pretrain_multicrop(mesh):
    model = build_model({
        "name": "DINOPretrain",
        "backbone": {"img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2,
                     "num_heads": 4},
        "out_dim": 128, "hidden_dim": 64, "bottleneck_dim": 32,
        "global_crops": 2, "teacher_temp": 0.04, "base_momentum": 0.9,
    })
    rs = np.random.RandomState(7)
    crops = [jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32) for _ in range(2)] + \
            [jnp.asarray(rs.rand(8, 16, 16, 3), jnp.float32) for _ in range(4)]
    state, losses = _train(model, crops, steps=3, opt_cfg={"name": "AdamW",
                                                           "weight_decay": 0.04})
    assert np.isfinite(losses).all()
    # the EMA'd center buffer moved off zero
    center = jax.tree_util.tree_leaves(state.model_state["ssl"])[0]
    assert float(jnp.abs(center).sum()) > 0


def test_dinov2_pretrain_ibot(mesh):
    model = build_model({
        "name": "DINOv2Pretrain",
        "backbone": {"img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2,
                     "num_heads": 4},
        "out_dim": 128, "hidden_dim": 64, "bottleneck_dim": 32,
        "global_crops": 2, "mask_ratio": 0.3, "base_momentum": 0.9,
    })
    rs = np.random.RandomState(9)
    crops = [jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32) for _ in range(2)] + \
            [jnp.asarray(rs.rand(8, 16, 16, 3), jnp.float32) for _ in range(2)]
    rng = jax.random.PRNGKey(0)
    import functools

    init_rngs = {"params": rng, "dropout": rng, "masking": rng}
    variables = jax.jit(functools.partial(model.init, train=True))(init_rngs, crops)
    params = dict(variables["params"])
    params["teacher"] = jax.tree_util.tree_map(jnp.copy, params["student"])
    ms = {k: v for k, v in variables.items() if k != "params"}
    opt = build_optimizer({"name": "AdamW", "weight_decay": 0.04}, params,
                          frozen_patterns=model.frozen_patterns())
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 5e-4}, 1, 1)
    pairs = [(s, d, ema_momentum_schedule(c, 100)) for s, d, c in model.ema_map()]
    state = TrainState.create(params, ms, opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn, ema_pairs=pairs), donate_argnums=0)
    outs = []
    for _ in range(3):
        state, m = step(state, crops)
        outs.append({k: float(v) for k, v in m.items() if "loss" in k})
    assert all(np.isfinite(list(o.values())).all() for o in outs)
    assert {"dino_loss", "ibot_loss", "koleo_loss"} <= set(outs[0])


def test_simclr_device_augment_trains(mesh):
    """uint8 views in, device-side jitter/gray/blur/normalize in-graph."""
    model = build_model({
        "name": "SimCLR", "backbone": BACKBONE,
        "neck": {"name": "NonLinearNeckfc3", "hid_channels": 64, "out_channels": 32},
        "temperature": 0.5, "use_device_augment": True, "jitter_strength": 1.0,
    })
    rs = np.random.RandomState(4)
    batch = (jnp.asarray(rs.randint(0, 256, (8, 32, 32, 3), np.uint8)),
             jnp.asarray(rs.randint(0, 256, (8, 32, 32, 3), np.uint8)))
    state, losses = _train(model, batch, steps=2)
    assert np.isfinite(losses).all()
