"""Unit tests: schedulers, grad clip, scaler, config overrides, io."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passl_tpu.core import ClipGradByGlobalNorm, GradScaler, clip_grad_norm, global_norm
from passl_tpu.scheduler import build_lr_scheduler
from passl_tpu.utils import cfg_util
from passl_tpu.utils.misc import AttrDict, create_attr_dict


def test_timm_cosine_schedule_shape():
    fn = build_lr_scheduler(
        {"name": "TimmCosine", "learning_rate": 1.0, "warmup_epoch": 1,
         "warmup_start_lr": 0.0, "eta_min": 0.1},
        epochs=10, steps_per_epoch=10)
    # warmup ramps linearly
    assert float(fn(0)) == 0.0
    assert abs(float(fn(5)) - 0.5) < 1e-6
    # peak right after warmup, eta_min at the end
    assert float(fn(10)) > 0.95
    assert abs(float(fn(100)) - 0.1) < 1e-2
    # monotone decay post-warmup
    vals = [float(fn(s)) for s in range(10, 100, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_step_and_multistep_schedules():
    step_fn = build_lr_scheduler({"name": "Step", "learning_rate": 1.0, "step_size": 2,
                                  "gamma": 0.1, "decay_unit": "epoch"},
                                 epochs=6, steps_per_epoch=5)
    assert abs(float(step_fn(0)) - 1.0) < 1e-6
    assert abs(float(step_fn(10)) - 0.1) < 1e-6  # epoch 2
    ms = build_lr_scheduler({"name": "MultiStepDecay", "learning_rate": 1.0,
                             "milestones": [2, 4], "gamma": 0.5},
                            epochs=6, steps_per_epoch=5)
    assert abs(float(ms(5)) - 1.0) < 1e-6   # epoch 1
    assert abs(float(ms(10)) - 0.5) < 1e-6  # epoch 2
    assert abs(float(ms(20)) - 0.25) < 1e-6


def test_simclr_lr_scaling():
    fn = build_lr_scheduler({"name": "simclrCosineWarmup", "learning_rate": 0.3,
                             "warmup_epochs": 0}, epochs=10, steps_per_epoch=10,
                            global_batch_size=512)
    # linear scaling: 0.3 * 512/256 = 0.6 peak
    assert abs(float(fn(0)) - 0.6) < 1e-5


def test_global_norm_clip():
    grads = {"a": jnp.full((4,), 3.0), "b": jnp.full((4,), 4.0)}
    n = float(global_norm(grads))
    assert abs(n - 10.0) < 1e-5  # sqrt(4*9 + 4*16)
    clipped, pre = clip_grad_norm(grads, 5.0)
    assert abs(float(global_norm(clipped)) - 5.0) < 1e-4
    # no_clip_list excludes from norm and from scaling
    gc = ClipGradByGlobalNorm(1.0, no_clip_list=["b"])
    out, norm = gc(grads)
    assert abs(float(norm) - 6.0) < 1e-5  # only a
    assert np.allclose(np.asarray(out["b"]), 4.0)  # untouched
    assert float(global_norm({"a": out["a"]})) <= 1.0 + 1e-4


def test_grad_scaler_dynamics():
    sc = GradScaler(init_loss_scaling=4.0, incr_every_n_steps=2)
    st = sc.init()
    grads = {"w": jnp.ones((2,)) * 8.0}
    unscaled, finite = sc.unscale_and_check(grads, st)
    assert bool(finite)
    assert np.allclose(np.asarray(unscaled["w"]), 2.0)
    # grows after n good steps
    st = sc.update(st, jnp.bool_(True))
    st = sc.update(st, jnp.bool_(True))
    assert float(st.scale) == 8.0
    # halves on inf
    st = sc.update(st, jnp.bool_(False))
    assert float(st.scale) == 4.0
    bad = {"w": jnp.asarray([jnp.inf, 1.0])}
    _, finite = sc.unscale_and_check(bad, st)
    assert not bool(finite)


def test_config_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("Global:\n  epochs: 5\n  flags:\n    x: 1\nModel:\n  name: resnet18\n")
    cfg = cfg_util.get_config(str(p), overrides=[
        "Global.epochs=10", "Global.flags.x=2", "Model.num_classes=7",
        "Optimizer.name=AdamW", "Global.lr=0.5",
    ])
    assert cfg.Global.epochs == 10
    assert cfg.Global.flags.x == 2
    assert cfg.Model.num_classes == 7
    assert cfg.Optimizer.name == "AdamW"
    assert cfg.Global.lr == 0.5  # literal-eval float


def test_pretrained_partial_load(tmp_path):
    from passl_tpu.utils import io

    params = {"backbone": {"w": jnp.ones((4, 4))}, "head": {"w": jnp.zeros((4, 2))}}
    io.save_params(params, str(tmp_path / "pre.params"))
    # new model: same backbone, different head shape, extra key
    new = {"backbone": {"w": jnp.zeros((4, 4))},
           "head": {"w": jnp.full((4, 10), 7.0)},
           "extra": {"b": jnp.zeros((3,))}}
    out = io.load_pretrained_into(str(tmp_path / "pre.params"), new)
    assert np.allclose(np.asarray(out["backbone"]["w"]), 1.0)  # loaded
    assert np.allclose(np.asarray(out["head"]["w"]), 7.0)  # shape mismatch kept
    assert out["extra"]["b"].shape == (3,)  # missing kept


def test_checkpoint_roundtrip(tmp_path):
    from passl_tpu.core import TrainState
    from passl_tpu.utils import io

    rng = jax.random.PRNGKey(0)
    state = TrainState.create({"w": jnp.ones((2, 2))}, {"batch_stats": {}},
                              {"w": {"m": jnp.zeros((2, 2))}}, rng)
    state = state.replace(step=jnp.asarray(17, jnp.int32))
    io.save_checkpoint(state, str(tmp_path), prefix="latest")
    fresh = TrainState.create({"w": jnp.zeros((2, 2))}, {"batch_stats": {}},
                              {"w": {"m": jnp.ones((2, 2))}}, rng)
    restored = io.load_checkpoint(str(tmp_path / "latest.ckpt"), fresh)
    assert int(restored.step) == 17
    assert np.allclose(np.asarray(restored.params["w"]), 1.0)
    assert np.allclose(np.asarray(restored.opt_state["w"]["m"]), 0.0)


def test_layerwise_lr_decay_grouping():
    from passl_tpu.optimizer import build_optimizer

    params = {
        "patch_embed": {"kernel": jnp.zeros((4, 4))},
        "blocks_0": {"w": jnp.zeros((4, 4))},
        "blocks_1": {"w": jnp.zeros((4, 4))},
        "head": {"kernel": jnp.zeros((4, 2))},
    }
    opt = build_optimizer({"name": "AdamW", "layerwise_decay": 0.5}, params, num_layers=2)
    scales = {p: opt.group_of(p).lr_scale for p in opt.assignment}
    # head at full lr; blocks decay by depth; embed deepest decay
    assert scales["head/kernel"] == 1.0
    assert scales["blocks_1/w"] == 0.5
    assert scales["blocks_0/w"] == 0.25
    assert scales["patch_embed/kernel"] == 0.125


def test_ema_threshold_warmup():
    from passl_tpu.core import TrainState
    from passl_tpu.engine.steps import make_train_step
    from passl_tpu.optimizer import build_optimizer
    from passl_tpu.scheduler import build_lr_scheduler
    from passl_tpu.models import build_model
    import functools

    model = build_model({"name": "resnet18", "num_classes": 2, "cifar_stem": True})
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 16, 16, 3), jnp.float32)
    y = jnp.asarray([0, 1, 0, 1], jnp.int32)
    v = jax.jit(functools.partial(model.init, train=True))({"params": rng}, x)
    params = v["params"]
    ms = {k: w for k, w in v.items() if k != "params"}
    from passl_tpu.loss import build_loss

    crit = build_loss([{"CELoss": {}}])
    opt = build_optimizer({"name": "Momentum", "momentum": 0.9}, params)
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 0.1}, 1, 1)
    decay_fn = lambda step: jnp.where(step < 2, 0.0, 0.5)
    state = TrainState.create(params, ms, opt.init(params), rng,
                              ema_params=jax.tree_util.tree_map(jnp.copy, params))
    step = jax.jit(make_train_step(model, opt, lr_fn, criterion=crit,
                                   full_ema_decay=decay_fn), donate_argnums=0)
    # during warmup (step<2) EMA == raw params exactly
    for _ in range(2):
        state, _ = step(state, (x, y))
    a = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    b = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.allclose(a, b)
    # after warmup EMA lags the raw params
    for _ in range(2):
        state, _ = step(state, (x, y))
    a = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    b = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.allclose(a, b)


def test_autoaugment_ops_run():
    from PIL import Image

    from passl_tpu.data.autoaugment import (AugMix, AutoAugment, RandAugment,
                                            TimmAutoAugment, rand_augment_transform)

    img = Image.fromarray(np.random.RandomState(0).randint(0, 256, (32, 32, 3), np.uint8))
    for t in (AutoAugment(), RandAugment(num_layers=2, magnitude=9),
              AugMix(), TimmAutoAugment("rand-m9-n2-mstd0.5")):
        out = t(img)
        assert out.size == (32, 32)
    ra = rand_augment_transform("rand-m7-n3-mstd0.5")
    assert ra.num_layers == 3 and ra.magnitude == 7 and ra.magnitude_std == 0.5


def test_per_group_lr_func_override():
    """A param group can carry its OWN schedule (reference LRCallable,
    optimizer/__init__.py:42-67): matched params step with it, others
    with the global lr."""
    import jax.numpy as jnp

    from passl_tpu.optimizer import build_optimizer

    params = {"head": {"kernel": jnp.ones((4, 2))},
              "body": {"kernel": jnp.ones((4, 2))}}
    opt = build_optimizer({
        "name": "Momentum", "momentum": 0.0,
        "param_group": [{"name": r"^head/",
                         "lr_func": {"name": "Constant", "learning_rate": 0.5}}],
    }, params, lr_args=(1, 1))
    grads = {"head": {"kernel": jnp.ones((4, 2))},
             "body": {"kernel": jnp.ones((4, 2))}}
    state = opt.init(params)
    new_p, _ = opt.apply(params, grads, state, jnp.float32(0.1), jnp.int32(0))
    # head stepped with its own 0.5 lr; body with the global 0.1
    assert float(new_p["head"]["kernel"][0, 0]) == pytest.approx(0.5)
    assert float(new_p["body"]["kernel"][0, 0]) == pytest.approx(0.9)
