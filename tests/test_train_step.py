"""End-to-end train-step tests (SimCLR slice + classification)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (smoke tier skips)
from jax.sharding import NamedSharding, PartitionSpec as P

from passl_tpu import distributed as dist
from passl_tpu.core import TrainState
from passl_tpu.engine.steps import make_train_step
from passl_tpu.loss import build_loss
from passl_tpu.models import build_model
from passl_tpu.optimizer import build_optimizer
from passl_tpu.scheduler import build_lr_scheduler


def _init(model, rng, batch):
    variables = model.init({"params": rng, "dropout": rng}, batch, train=True)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    return params, model_state


def _data_sharding(mesh, ndim=4):
    return NamedSharding(mesh, P(dist.DATA_AXES, *([None] * (ndim - 1))))


def test_simclr_train_step_decreases_loss(mesh, rng):
    model = build_model({
        "name": "SimCLR",
        "backbone": {"name": "resnet18", "num_classes": 0, "with_pool": False, "cifar_stem": True},
        "neck": {"name": "NonLinearNeckfc3", "hid_channels": 256, "out_channels": 64},
        "temperature": 0.5,
    })
    np.random.seed(0)
    v1 = np.random.rand(16, 32, 32, 3).astype("float32")
    v2 = v1 + 0.01 * np.random.rand(16, 32, 32, 3).astype("float32")
    batch = (jnp.asarray(v1), jnp.asarray(v2))
    params, model_state = _init(model, rng, batch)

    opt = build_optimizer(
        {"name": "MomentumLARS", "momentum": 0.9, "weight_decay": 1e-4,
         "one_dim_param_no_weight_decay": True},
        params,
    )
    lr_fn = build_lr_scheduler(
        {"name": "simclrCosineWarmup", "learning_rate": 0.5, "warmup_epochs": 0},
        epochs=5, steps_per_epoch=10, global_batch_size=16,
    )
    state = TrainState.create(params, model_state, opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn), donate_argnums=0)

    sh = _data_sharding(mesh)
    sv1 = jax.device_put(v1, sh)
    sv2 = jax.device_put(v2, sh)
    losses = []
    for _ in range(5):
        state, metrics = step(state, (sv1, sv2))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 5
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_classification_train_step(mesh, rng):
    model = build_model({"name": "resnet18", "num_classes": 10, "cifar_stem": True})
    images = jnp.asarray(np.random.rand(16, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(np.arange(16) % 10, jnp.int32)
    params, model_state = _init(model, rng, images)
    criterion = build_loss([{"CELoss": {"label_smoothing": 0.1}}])
    opt = build_optimizer({"name": "Momentum", "momentum": 0.9, "weight_decay": 1e-4}, params)
    lr_fn = build_lr_scheduler({"name": "TimmCosine", "learning_rate": 0.1, "warmup_epoch": 1},
                               epochs=2, steps_per_epoch=10)
    state = TrainState.create(params, model_state, opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn, criterion=criterion), donate_argnums=0)
    losses = []
    for _ in range(5):
        state, metrics = step(state, (images, labels))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_grad_accumulation_matches_full_batch(mesh, rng):
    model = build_model({"name": "resnet18", "num_classes": 4, "cifar_stem": True, "bn_splits": 0})
    images = jnp.asarray(np.random.RandomState(1).rand(8, 16, 16, 3), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 4, jnp.int32)
    params, model_state = _init(model, rng, images)
    criterion = build_loss([{"CELoss": {}}])
    opt = build_optimizer({"name": "Momentum", "momentum": 0.0}, params)
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 0.1}, 1, 1)

    def run(accum):
        state = TrainState.create(params, model_state, opt.init(params), rng)
        step = jax.jit(make_train_step(model, opt, lr_fn, criterion=criterion, accum_steps=accum))
        state, m = step(state, (images, labels))
        return m["loss"]

    # note: BN stats differ between micro-batches, so compare loss values
    # with a loose tolerance (the param update path is identical).
    l1, l2 = float(run(1)), float(run(2))
    assert abs(l1 - l2) < 0.2, (l1, l2)
