"""MAE + MoCo v3 + linear probe tests."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from passl_tpu.core import TrainState
from passl_tpu.engine.steps import ema_momentum_schedule, make_train_step
from passl_tpu.models import build_model
from passl_tpu.models.mae import patchify, random_masking, unpatchify
from passl_tpu.optimizer import build_optimizer
from passl_tpu.scheduler import build_lr_scheduler
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (smoke tier skips)


def test_patchify_roundtrip():
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(2, 16, 16, 3), jnp.float32)
    x = patchify(imgs, 4)
    assert x.shape == (2, 16, 48)
    back = unpatchify(x, 4)
    assert np.allclose(np.asarray(back), np.asarray(imgs), atol=1e-6)


def test_random_masking_properties():
    rng = jax.random.PRNGKey(0)
    x = jnp.arange(2 * 8 * 4, dtype=jnp.float32).reshape(2, 8, 4)
    xm, mask, ids_restore = random_masking(x, 0.75, rng)
    assert xm.shape == (2, 2, 4)  # keeps 25%
    assert mask.shape == (2, 8)
    assert np.allclose(np.asarray(mask).sum(axis=1), 6)  # 75% masked
    # kept tokens are original rows
    orig = np.asarray(x)
    for nidx in range(2):
        for row in np.asarray(xm)[nidx]:
            assert any(np.allclose(row, orig[nidx, j]) for j in range(8))


def test_mae_train_step(mesh):
    model = build_model({
        "name": "MaskedAutoencoderViT", "img_size": 32, "patch_size": 8,
        "embed_dim": 64, "depth": 2, "num_heads": 4,
        "decoder_embed_dim": 32, "decoder_depth": 1, "decoder_num_heads": 4,
        "mask_ratio": 0.75,
    })
    rng = jax.random.PRNGKey(0)
    import functools

    batch = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": rng, "masking": rng, "dropout": rng}, batch)
    params = variables["params"]
    ms = {k: v for k, v in variables.items() if k != "params"}
    opt = build_optimizer({"name": "AdamW", "betas": (0.9, 0.95), "weight_decay": 0.05}, params)
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 1e-3}, 1, 1)
    state = TrainState.create(params, ms, opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn), donate_argnums=0)
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_mocov3_pretrain_step(mesh):
    enc = {"img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2, "num_heads": 4}
    model = build_model({"name": "MoCoV3Pretrain", "encoder": enc,
                         "dim": 32, "mlp_dim": 64, "T": 0.2, "base_momentum": 0.9})
    rng = jax.random.PRNGKey(0)
    import functools

    rs = np.random.RandomState(0)
    batch = (jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32),
             jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32))
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": rng, "dropout": rng}, batch)
    params = dict(variables["params"])
    # init-sync momentum tower
    params["momentum"] = jax.tree_util.tree_map(jnp.copy, params["base"])
    ms = {k: v for k, v in variables.items() if k != "params"}
    opt = build_optimizer({"name": "AdamW", "weight_decay": 0.1}, params,
                          frozen_patterns=model.frozen_patterns())
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 1e-3}, 1, 1)
    pairs = [(s, d, ema_momentum_schedule(c, 100)) for s, d, c in model.ema_map()]
    state = TrainState.create(params, ms, opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn, ema_pairs=pairs), donate_argnums=0)
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # momentum tower moved toward base but is not identical
    fp = traverse_util.flatten_dict(state.params, sep="/")
    b = np.asarray(fp["base/head/fc0/kernel"])
    mo = np.asarray(fp["momentum/head/fc0/kernel"])
    assert not np.allclose(b, mo)


def test_mocov3_keys_skip_momentum_predictor(mesh):
    """Keys = momentum backbone+projector only (reference mocov3.py: the
    momentum encoder has no predictor) — perturbing the EMA'd momentum
    predictor params must not change the loss."""
    import functools

    enc = {"img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2, "num_heads": 4}
    model = build_model({"name": "MoCoV3Pretrain", "encoder": enc,
                         "dim": 32, "mlp_dim": 64, "T": 0.2})
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    batch = (jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32),
             jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32))
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": rng, "dropout": rng}, batch)

    def loss_of(params):
        out, _ = model.apply({**variables, "params": params}, batch, train=True,
                             mutable=["batch_stats", "ssl"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return float(out["loss"])

    flat = traverse_util.flatten_dict(variables["params"], sep="/")
    # predictor exists on base only; momentum never traces it
    assert any(k.startswith("base/predictor/") for k in flat)
    assert not any(k.startswith("momentum/predictor/") for k in flat)

    base_loss = loss_of(variables["params"])
    # engine-style init-sync copies base (incl. predictor) onto momentum;
    # those extra predictor params must be inert on the key path:
    # momentum = old momentum + (perturbed) predictor subtree
    mom = dict(variables["params"]["momentum"])
    mom["predictor"] = jax.tree_util.tree_map(lambda t: t + 1.0,
                                              variables["params"]["base"]["predictor"])
    withpred = dict(variables["params"])
    withpred["momentum"] = mom
    assert loss_of(withpred) == base_loss
    # but perturbing the momentum projector (head) DOES change keys/loss
    mom2 = jax.tree_util.tree_map(lambda t: t + 1.0, dict(variables["params"]["momentum"]))
    pert2_params = dict(variables["params"])
    pert2_params["momentum"] = mom2
    assert loss_of(pert2_params) != base_loss


def test_linear_probe_only_head_trains(mesh):
    model = build_model({
        "name": "LinearProbe",
        "backbone": {"name": "resnet18", "num_classes": 0, "cifar_stem": True},
        "num_classes": 10,
    })
    rng = jax.random.PRNGKey(0)
    import functools

    x = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 3), jnp.float32)
    y = jnp.asarray(np.arange(8) % 10, jnp.int32)
    variables = jax.jit(functools.partial(model.init, train=True))({"params": rng}, x)
    params = variables["params"]
    ms = {k: v for k, v in variables.items() if k != "params"}
    from passl_tpu.loss import build_loss

    criterion = build_loss([{"CELoss": {}}])
    opt = build_optimizer({"name": "Momentum", "momentum": 0.9}, params,
                          frozen_patterns=model.frozen_patterns())
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 0.1}, 1, 1)
    state = TrainState.create(params, ms, opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn, criterion=criterion), donate_argnums=0)
    flat0 = traverse_util.flatten_dict(params, sep="/")
    before = np.asarray(flat0["backbone/conv1/kernel"]).copy()
    head_before = np.asarray(flat0["fc/kernel"]).copy()
    for _ in range(3):
        state, m = step(state, (x, y))
    after_flat = traverse_util.flatten_dict(state.params, sep="/")
    after = np.asarray(after_flat["backbone/conv1/kernel"])
    assert np.allclose(before, after)  # backbone untouched
    head_after = np.asarray(after_flat["fc/kernel"])
    assert not np.allclose(head_before, head_after)  # head trained
