"""BEiT / CAE / ConvMAE / DINO-probe / dVAE tests."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from passl_tpu.core import TrainState
from passl_tpu.data.masking import MaskingGenerator, RandomMaskingGenerator
from passl_tpu.engine.steps import make_train_step
from passl_tpu.models import build_model
from passl_tpu.optimizer import build_optimizer
from passl_tpu.scheduler import build_lr_scheduler
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (smoke tier skips)


def _train(model, batch, steps=2, rngs=("params", "dropout", "masking")):
    rng = jax.random.PRNGKey(0)
    init_rngs = {n: jax.random.fold_in(rng, i) for i, n in enumerate(rngs)}
    variables = jax.jit(functools.partial(model.init, train=True))(init_rngs, batch)
    params = variables["params"]
    ms = {k: v for k, v in variables.items() if k != "params"}
    frozen = model.frozen_patterns() if hasattr(model, "frozen_patterns") else []
    opt = build_optimizer({"name": "AdamW", "weight_decay": 0.05}, params, frozen_patterns=frozen)
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 1e-3}, 1, 1)
    state = TrainState.create(params, ms, opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn), donate_argnums=0)
    out = []
    for _ in range(steps):
        state, m = step(state, batch)
        out.append({k: float(v) for k, v in m.items() if k != "lr"})
    return state, out


def test_masking_generators():
    g = MaskingGenerator(input_size=8, num_masking_patches=20, min_num_patches=4)
    m = g()
    assert m.shape == (64,)
    assert m.sum() >= 20  # block masking reaches at least the target
    r = RandomMaskingGenerator(input_size=8, mask_ratio=0.75)
    m2 = r()
    assert m2.sum() == 48


def test_beit_pretrain_step(mesh):
    model = build_model({
        "name": "BEiTPretrain",
        "encoder": {"img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2, "num_heads": 4},
        "tokenizer": {"vocab_size": 64, "hidden_dim": 32, "num_resblocks": 1},
        "vocab_size": 64,
    })
    rs = np.random.RandomState(0)
    mask = np.zeros((4, 16), np.int32)
    mask[:, :8] = 1
    batch = (jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32),
             jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32),
             jnp.asarray(mask))
    state, out = _train(model, batch)
    assert np.isfinite([o["loss"] for o in out]).all()
    # tokenizer frozen
    from flax import traverse_util

    fp = traverse_util.flatten_dict(state.params, sep="/")
    assert any(k.startswith("tokenizer/") for k in fp)


def test_cae_pretrain_step(mesh):
    model = build_model({
        "name": "CAEPretrain", "img_size": 32, "patch_size": 8,
        "embed_dim": 64, "depth": 2, "num_heads": 4, "regressor_depth": 1,
        "vocab_size": 64, "tokenizer": {"vocab_size": 64, "hidden_dim": 32, "num_resblocks": 1},
        "num_masked": 8,
    })
    rs = np.random.RandomState(1)
    mask = np.zeros((4, 16), np.int32)
    mask[:, 8:] = 1
    batch = (jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32),
             jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32),
             jnp.asarray(mask))
    state, out = _train(model, batch)
    assert np.isfinite([o["loss"] for o in out]).all()
    assert "align_loss" in out[0] and "token_loss" in out[0]
    assert out[-1]["loss"] < out[0]["loss"]


def test_convmae_pretrain_step(mesh):
    model = build_model({
        "name": "MaskedAutoencoderConvViT", "img_size": 32,
        "patch_sizes": (2, 2, 2), "embed_dims": (16, 32, 64),
        "depths": (1, 1, 2), "num_heads": 4,
        "decoder_embed_dim": 32, "decoder_depth": 1, "decoder_num_heads": 4,
        "mask_ratio": 0.75,
    })
    rs = np.random.RandomState(2)
    batch = jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32)
    state, out = _train(model, batch)
    assert np.isfinite([o["loss"] for o in out]).all()
    assert out[-1]["loss"] < out[0]["loss"]


def test_convvit_classifier(mesh, rng):
    model = build_model({
        "name": "ConvViT", "img_size": 32, "patch_sizes": (2, 2, 2),
        "embed_dims": (16, 32, 64), "depths": (1, 1, 1), "num_heads": 4,
        "num_classes": 10,
    })
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    v = jax.jit(functools.partial(model.init, train=False))({"params": rng}, x)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 10)


def test_dino_probe(mesh, rng):
    model = build_model({
        "name": "DINOLinearProbe",
        "encoder": {"img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 4, "num_heads": 4},
        "num_classes": 10, "n_last_blocks": 2,
    })
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    v = jax.jit(functools.partial(model.init, train=False))({"params": rng}, x)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 10)


def test_dvae_tokenize_and_train(mesh, rng):
    model = build_model({"name": "DiscreteVAE", "vocab_size": 64, "hidden_dim": 32,
                         "num_resblocks": 1})
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    v = jax.jit(functools.partial(model.init, train=True))(
        {"params": rng, "masking": rng}, x)
    ids = model.apply(v, x, method="tokenize")
    assert ids.shape == (2, 16)  # /8 grid of 32px
    assert int(ids.max()) < 64
    out = model.apply(v, x, train=True, rngs={"masking": rng})
    assert np.isfinite(float(out["loss"]))


def test_dvae_hard_gumbel_grad_flows(mesh, rng):
    # straight-through path: loss finite AND gradient reaches the
    # encoder logits (the ST estimator must not sever the graph)
    model = build_model({"name": "DiscreteVAE", "vocab_size": 64, "hidden_dim": 32,
                         "num_resblocks": 1, "hard": True})
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    v = jax.jit(functools.partial(model.init, train=True))(
        {"params": rng, "masking": rng}, x)

    def loss_fn(params):
        out = model.apply({"params": params}, x, train=True, rngs={"masking": rng})
        return out["loss"]

    g = jax.grad(loss_fn)(v["params"])
    leaf = g["to_logits"]["kernel"]
    assert np.isfinite(float(loss_fn(v["params"])))
    assert float(jnp.abs(leaf).max()) > 0.0
