"""LVViT token-label training: dataset, MixToken, sparse soft-CE.

Reference behavior: passl_v110/datasets/lvdataset.py (image + .npy
score maps, label-aware crop/flip) + LVViTWrapper.py LVViTLoss
(cls + dense token soft-CE with MixToken box mixing)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (smoke tier skips)


def test_synthetic_token_label_dataset_shapes():
    from passl_tpu.data import build_dataset

    ds = build_dataset({"name": "SyntheticTokenLabelDataset", "size": 8,
                        "image_size": 32, "grid_size": 4, "num_classes": 10, "topk": 3})
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["token_value"].shape == (4, 4, 3)
    assert s["token_idx"].shape == (4, 4, 3)
    assert s["token_idx"][..., 0].min() == s["label"]  # gt class present
    np.testing.assert_allclose(s["token_value"].sum(-1), 1.0, rtol=1e-5)


def test_token_label_rrc_crops_map_with_image():
    from PIL import Image

    from passl_tpu.data.token_label import (TokenLabelFlip,
                                            TokenLabelRandomResizedCrop)

    rs = np.random.RandomState(0)
    img = Image.fromarray(rs.randint(0, 256, (64, 64, 3), np.uint8))
    lab = rs.rand(2, 3, 8, 8).astype(np.float32)
    t = TokenLabelRandomResizedCrop(32, grid_size=4)
    out_img, out_lab = t((img, lab))
    assert out_img.size == (32, 32)
    assert out_lab.shape == (2, 3, 4, 4)
    # flip flips the map's width axis
    f = TokenLabelFlip(prob=1.0)
    fi, fl = f((out_img, out_lab))
    np.testing.assert_array_equal(fl, out_lab[:, :, :, ::-1])


def test_lvvit_token_label_trains(mesh):
    import jax
    import jax.numpy as jnp

    from passl_tpu.core import TrainState
    from passl_tpu.engine.steps import make_train_step
    from passl_tpu.models import build_model
    from passl_tpu.optimizer import build_optimizer
    from passl_tpu.scheduler import build_lr_scheduler

    model = build_model({"name": "LVViTTokenLabel", "img_size": 32, "patch_size": 8,
                         "embed_dim": 64, "depth": 2, "num_heads": 4,
                         "num_classes": 10, "dense_weight": 0.5})
    rs = np.random.RandomState(0)
    g, k = 4, 3
    vals = rs.rand(16, g, g, k).astype(np.float32)
    vals /= vals.sum(-1, keepdims=True)
    batch = {"image": jnp.asarray(rs.rand(16, 32, 32, 3), jnp.float32),
             "label": jnp.asarray(rs.randint(0, 10, 16), jnp.int32),
             "token_value": jnp.asarray(vals),
             "token_idx": jnp.asarray(rs.randint(0, 10, (16, g, g, k)), jnp.int32)}
    rng = jax.random.PRNGKey(0)
    rngs = {n: jax.random.fold_in(rng, i) for i, n in enumerate(
        ("params", "dropout", "mixup"))}
    variables = model.init(rngs, batch, train=True)
    params = variables["params"]
    # param tree matches the plain LVViT classifier (weights transfer)
    lv = build_model({"name": "lvvit_s", "img_size": 32, "patch_size": 8,
                      "embed_dim": 64, "depth": 2, "num_heads": 4, "num_classes": 10})
    lv_vars = lv.init(rngs, batch["image"], train=False)
    assert set(params) == set(lv_vars["params"])

    opt = build_optimizer({"name": "AdamW", "weight_decay": 0.05}, params)
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 1e-3}, 1, 1)
    state = TrainState.create(params, {k_: v for k_, v in variables.items() if k_ != "params"},
                              opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn), donate_argnums=0)
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizes the fixed batch
    assert float(m["loss_aux"]) > 0 and float(m["loss_cls"]) > 0
