"""Backbone zoo forward-shape tests (tiny configs, CPU mesh)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (smoke tier skips)

from passl_tpu.models import build_model

CASES = [
    ({"name": "VisionTransformer", "img_size": 32, "patch_size": 8, "embed_dim": 64,
      "depth": 2, "num_heads": 4, "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
    ({"name": "DistilledVisionTransformer", "img_size": 32, "patch_size": 8, "embed_dim": 64,
      "depth": 2, "num_heads": 4, "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
    ({"name": "CaiT", "img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2,
      "num_heads": 4, "depth_token_only": 1, "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
    ({"name": "SwinTransformer", "img_size": 32, "patch_size": 4, "embed_dim": 32,
      "depths": (1, 1), "num_heads": (2, 4), "window_size": 4, "num_classes": 10},
     (2, 32, 32, 3), (2, 10)),
    ({"name": "ConvNeXt", "depths": (1, 1, 1, 1), "dims": (16, 32, 64, 128),
      "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
    ({"name": "resnet50", "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
]


@pytest.mark.parametrize("cfg,in_shape,out_shape", CASES, ids=[c[0]["name"] for c in CASES])
def test_backbone_forward(cfg, in_shape, out_shape, rng):
    model = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(*in_shape), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))({"params": rng}, x)
    out = jax.jit(functools.partial(model.apply, train=False))(variables, x)
    assert out.shape == out_shape
    assert np.isfinite(np.asarray(out)).all()


def test_space_to_depth_stem_exact(rng):
    """s2d stem == 7x7/s2 conv (values + grads) with the SAME kernel
    param — checkpoint-compatible exact reformulation (resnet.py
    SpaceToDepthStem)."""
    import flax.linen as nn

    from passl_tpu.models.resnet import SpaceToDepthStem

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    stem = SpaceToDepthStem(features=16)
    v = stem.init(rng, x)
    k = v["params"]["kernel"]
    assert k.shape == (7, 7, 3, 16)
    conv = nn.Conv(16, (7, 7), strides=(2, 2), padding=3, use_bias=False)
    y_conv = conv.apply({"params": {"kernel": k}}, x)
    y_s2d = stem.apply(v, x)
    assert y_conv.shape == y_s2d.shape == (2, 16, 16, 16)
    assert np.allclose(np.asarray(y_conv), np.asarray(y_s2d), atol=1e-5)
    g1 = jax.grad(lambda k: jnp.sum(jnp.sin(conv.apply({"params": {"kernel": k}}, x))))(k)
    g2 = jax.grad(lambda k: jnp.sum(jnp.sin(stem.apply({"params": {"kernel": k}}, x))))(k)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_resnet_s2d_stem_model_matches_conv7(rng):
    from passl_tpu.models import build_model

    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    m1 = build_model({"name": "resnet18", "num_classes": 10})
    m2 = build_model({"name": "resnet18", "num_classes": 10, "stem_impl": "s2d"})
    v = m1.init({"params": rng}, x, train=False)
    y1 = m1.apply(v, x, train=False)
    y2 = m2.apply(v, x, train=False)  # same params, same path names
    assert np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


def test_swin_shifted_window_mask():
    from passl_tpu.models.swin_transformer import _shift_attn_mask, window_partition, window_reverse

    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert (m == 0).any() and (m == -100).any()
    # partition/reverse roundtrip
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    assert np.allclose(np.asarray(back), np.asarray(x))


def test_swin_packed_window_attention_matches_unpacked(rng):
    """win_pack=2 (block-diag masked packed attention) must reproduce the
    unpacked computation with the same params — incl. shifted blocks."""
    cfg = {"name": "SwinTransformer", "img_size": 32, "patch_size": 4, "embed_dim": 32,
           "depths": (2, 2), "num_heads": (2, 4), "window_size": 4, "num_classes": 10,
           "drop_path_rate": 0.0}
    m1 = build_model(dict(cfg, win_pack=1))
    m2 = build_model(dict(cfg, win_pack=2))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    variables = jax.jit(functools.partial(m1.init, train=False))({"params": rng}, x)
    o1 = jax.jit(functools.partial(m1.apply, train=False))(variables, x)
    o2 = jax.jit(functools.partial(m2.apply, train=False))(variables, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)


def test_swin_lane_pad_matches_unpadded(rng):
    """lane_pad (q/k/v zero-padded to a lane multiple, padded keys masked
    at -100) must reproduce the unpadded computation with the same
    params — forward AND gradients, incl. shifted blocks."""
    cfg = {"name": "SwinTransformer", "img_size": 32, "patch_size": 4, "embed_dim": 32,
           "depths": (2, 2), "num_heads": (2, 4), "window_size": 4, "num_classes": 10,
           "drop_path_rate": 0.0, "win_pack": 2}
    m1 = build_model(dict(cfg))
    m2 = build_model(dict(cfg, lane_pad=48))  # 2*16=32-token seq -> 48: real padding
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    variables = jax.jit(functools.partial(m1.init, train=False))({"params": rng}, x)
    o1 = jax.jit(functools.partial(m1.apply, train=False))(variables, x)
    o2 = jax.jit(functools.partial(m2.apply, train=False))(variables, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)

    def loss(m):
        def f(p):
            return jnp.sum(jnp.sin(m.apply({"params": p}, x, train=False)))
        return f

    g1 = jax.jit(jax.grad(loss(m1)))(variables["params"])
    g2 = jax.jit(jax.grad(loss(m2)))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=5e-5, atol=5e-5), g1, g2)


def test_swin_and_vit_remat_policies_match_no_remat(rng):
    """remat/remat_policy must not change outputs or gradients."""
    cfg = {"name": "SwinTransformer", "img_size": 32, "patch_size": 4, "embed_dim": 32,
           "depths": (1, 1), "num_heads": (2, 4), "window_size": 4, "num_classes": 10,
           "drop_path_rate": 0.0}
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    m0 = build_model(cfg)
    variables = m0.init({"params": rng, "dropout": rng}, x, train=True)

    def gsum(m):
        g = jax.jit(jax.grad(lambda p: jnp.sum(m.apply(
            {**variables, "params": p}, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(7)}) ** 2)))(variables["params"])
        return float(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0))

    base = gsum(m0)
    for pol in ("nothing", "dots_no_batch", "dots"):
        m = build_model(dict(cfg, remat=True, remat_policy=pol))
        np.testing.assert_allclose(gsum(m), base, rtol=1e-6)

    vit_cfg = {"name": "ViT_tiny_patch16_224", "img_size": 32, "num_classes": 10}
    mv0 = build_model(vit_cfg)
    vv = mv0.init({"params": rng, "dropout": rng}, x, train=True)

    def vgsum(m):
        g = jax.jit(jax.grad(lambda p: jnp.sum(m.apply(
            {**vv, "params": p}, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(7)}) ** 2)))(vv["params"])
        return float(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0))

    vbase = vgsum(mv0)
    for pol in ("nothing", "dots_no_batch"):
        m = build_model(dict(vit_cfg, remat=True, remat_policy=pol))
        np.testing.assert_allclose(vgsum(m), vbase, rtol=1e-6)


def test_vit_pos_embed_interpolation():
    from passl_tpu.models.vision_transformer import interpolate_pos_embed

    pe = jnp.asarray(np.random.RandomState(0).rand(1, 1 + 16, 8), jnp.float32)
    out = interpolate_pos_embed(pe, new_grid=8)
    assert out.shape == (1, 1 + 64, 8)
    # prefix (cls) slot preserved exactly
    assert np.allclose(np.asarray(out[:, 0]), np.asarray(pe[:, 0]))


EXTRA_CASES = [
    ({"name": "MlpMixer", "img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2,
      "tokens_mlp_dim": 32, "channels_mlp_dim": 128, "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
    ({"name": "RegNet", "w_a": 24.48, "w_0": 24, "w_m": 2.54, "depth": 6,
      "group_width": 8, "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
    ({"name": "XCiT", "img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2,
      "num_heads": 4, "cls_attn_layers": 1, "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
    ({"name": "CvT", "embed_dims": (16, 32, 64), "depths": (1, 1, 2),
      "num_heads": (1, 2, 4), "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
    ({"name": "T2TViT", "img_size": 64, "token_dim": 16, "embed_dim": 64, "depth": 2,
      "num_heads": 4, "num_classes": 10}, (2, 64, 64, 3), (2, 10)),
    ({"name": "LVViT", "img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2,
      "num_heads": 4, "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
    ({"name": "BEiTFinetune", "encoder": {"img_size": 32, "patch_size": 8, "embed_dim": 64,
      "depth": 2, "num_heads": 4}, "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
    ({"name": "CAEFinetune", "img_size": 32, "patch_size": 8, "embed_dim": 64, "depth": 2,
      "num_heads": 4, "num_classes": 10}, (2, 32, 32, 3), (2, 10)),
]


@pytest.mark.parametrize("cfg,in_shape,out_shape", EXTRA_CASES,
                         ids=[c[0]["name"] for c in EXTRA_CASES])
def test_extra_backbone_forward(cfg, in_shape, out_shape, rng):
    model = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(*in_shape), jnp.float32)
    init_rngs = {"params": rng}
    variables = jax.jit(functools.partial(model.init, train=False))(init_rngs, x)
    out = jax.jit(functools.partial(model.apply, train=False))(variables, x)
    assert out.shape == out_shape
    assert np.isfinite(np.asarray(out)).all()
