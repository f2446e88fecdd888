"""DenseCL / PixPro / MoCoBYOL tests."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from passl_tpu.core import TrainState
from passl_tpu.engine.steps import ema_momentum_schedule, make_train_step
from passl_tpu.models import build_model
from passl_tpu.models.pixpro import pixpro_regression_loss
from passl_tpu.optimizer import build_optimizer
from passl_tpu.scheduler import build_lr_scheduler
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (smoke tier skips)

BACKBONE = {"name": "resnet18", "num_classes": 0, "with_pool": False, "cifar_stem": True}


def _run(model, batch, steps=3, rngs=("params", "dropout", "shuffle")):
    rng = jax.random.PRNGKey(0)
    init_rngs = {n: jax.random.fold_in(rng, i) for i, n in enumerate(rngs)}
    variables = jax.jit(functools.partial(model.init, train=True))(init_rngs, batch)
    params = dict(variables["params"])
    for src, dst, _ in model.ema_map():
        params[dst] = jax.tree_util.tree_map(jnp.copy, params[src])
    ms = {k: v for k, v in variables.items() if k != "params"}
    opt = build_optimizer({"name": "Momentum", "momentum": 0.9}, params,
                          frozen_patterns=model.frozen_patterns())
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 0.03}, 1, 1)
    pairs = [(s, d, ema_momentum_schedule(c, 100)) for s, d, c in model.ema_map()]
    state = TrainState.create(params, ms, opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn, ema_pairs=pairs), donate_argnums=0)
    losses = []
    for _ in range(steps):
        state, m = step(state, batch)
        losses.append({k: float(v) for k, v in m.items() if "loss" in k})
    return state, losses


def test_densecl_dual_queue(mesh):
    model = build_model({
        "name": "DenseCL", "backbone": BACKBONE,
        "neck": {"name": "DenseCLNeck", "hid_channels": 128, "out_channels": 32},
        "dim": 32, "K": 64, "T": 0.2,
    })
    rs = np.random.RandomState(0)
    batch = (jnp.asarray(rs.rand(16, 32, 32, 3), jnp.float32),
             jnp.asarray(rs.rand(16, 32, 32, 3), jnp.float32))
    state, losses = _run(model, batch)
    assert all(np.isfinite(list(l.values())).all() for l in losses)
    ssl = state.model_state["ssl"]
    flat = jax.tree_util.tree_leaves(ssl)
    assert len(flat) >= 3  # queue, queue2, ptr


def test_pixpro_regression_loss_identity():
    # identical crops → all cells are positives of themselves; loss → -2
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.rand(2, 4, 4, 8), jnp.float32)
    coord = jnp.asarray([[0, 0, 32, 32], [0, 0, 32, 32]], jnp.float32)
    loss = pixpro_regression_loss(q, q, coord, coord, pos_ratio=0.1)
    # diag positives have cos=1 → loss close to -2
    assert float(loss) < -1.5
    # disjoint crops → no positives → loss ~ 0
    c2 = jnp.asarray([[100, 100, 132, 132], [100, 100, 132, 132]], jnp.float32)
    loss2 = pixpro_regression_loss(q, q, coord, c2, pos_ratio=0.1)
    assert abs(float(loss2)) < 1e-3


def test_pixpro_step(mesh):
    model = build_model({
        "name": "PixPro", "backbone": BACKBONE,
        "neck": {"name": "MLP2d", "hid_channels": 64, "out_channels": 32},
    })
    rs = np.random.RandomState(1)
    batch = {
        "view1": jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32),
        "view2": jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32),
        "coord1": jnp.asarray(rs.rand(4, 4) * 100, jnp.float32),
        "coord2": jnp.asarray(rs.rand(4, 4) * 100, jnp.float32),
    }
    state, losses = _run(model, batch)
    assert all(np.isfinite(list(l.values())).all() for l in losses)


def test_mocobyol_step(mesh):
    model = build_model({
        "name": "MoCoBYOL", "backbone": BACKBONE,
        "neck": {"name": "NonLinearNeckV2", "hid_channels": 64, "out_channels": 32},
        "predictor": {"name": "NonLinearNeckV2", "hid_channels": 64, "out_channels": 32,
                      "with_avg_pool": False},
        "dim": 32, "K": 64,
    })
    rs = np.random.RandomState(2)
    batch = (jnp.asarray(rs.rand(16, 32, 32, 3), jnp.float32),
             jnp.asarray(rs.rand(16, 32, 32, 3), jnp.float32))
    state, losses = _run(model, batch)
    assert all(np.isfinite(list(l.values())).all() for l in losses)
    assert "byol_loss" in losses[0] and "contrast_loss" in losses[0]


def test_pixpro_transform_yields_coords():
    from PIL import Image

    from passl_tpu.data.transforms import PixProTwoViewsTransform

    img = Image.fromarray(np.random.RandomState(0).randint(0, 256, (64, 64, 3), np.uint8))
    # flip_prob pinned both ways: the default 0.5 draws from the global
    # `random` module, which made this test a coin flip (flipped crops
    # INTENTIONALLY carry x1 > x2 — the reversed interval is how the
    # mirror reaches pixpro_regression_loss's cell-center grid)
    t = PixProTwoViewsTransform(
        crop={"size": 16, "scale": (0.5, 1.0)},
        post_transform1=[{"NormalizeImage": {"scale": 0.00392157}}],
        flip_prob=0.0,
    )
    out = t(img)
    assert set(out) == {"view1", "view2", "coord1", "coord2"}
    assert out["view1"].shape == (16, 16, 3)
    x1, y1, x2, y2 = out["coord1"]
    assert 0 <= x1 < x2 <= 64 and 0 <= y1 < y2 <= 64

    t_flip = PixProTwoViewsTransform(
        crop={"size": 16, "scale": (0.5, 1.0)},
        post_transform1=[{"NormalizeImage": {"scale": 0.00392157}}],
        flip_prob=1.0,
    )
    fout = t_flip(img)
    fx1, fy1, fx2, fy2 = fout["coord1"]
    assert fx1 > fx2 and 0 <= fy1 < fy2 <= 64  # swapped x encodes the flip
    # and the flipped view really is mirrored: with a FIXED crop box,
    # flipping the flipped view back reproduces the unflipped crop
    fixed = np.asarray(img)[8:24, 4:20]
    fixed_crop = lambda _: (fixed, np.asarray([4, 8, 20, 24], np.float32))
    t_fix = PixProTwoViewsTransform(crop=fixed_crop, post_transform1=[], flip_prob=1.0)
    vf, cf = t_fix._crop_flip(img)
    np.testing.assert_array_equal(cf, [20, 8, 4, 24])
    np.testing.assert_array_equal(np.asarray(vf)[:, ::-1], fixed)
