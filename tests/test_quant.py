"""int8 W8A8 post-training quantization (nn/quant.py).

Deploy feature beyond the reference (its predictor serves fp32/fp16
only, deploy/utils/predictor.py:35-70): Dense layers run int8xint8 on
the MXU with per-channel weight scales and dynamic per-token activation
scales. Tests pin (1) the quantized-matmul math against a numpy
reference, (2) end-to-end logits fidelity on a ViT, (3) that only real
Dense kernels are rewritten, and (4) that the quantized graph exports
to a StableHLO artifact that reproduces the in-process quantized
logits.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from passl_tpu.models import build_model
from passl_tpu.nn import quant


def _tiny_vit(num_classes=10):
    return build_model({"name": "VisionTransformer", "img_size": 32,
                        "patch_size": 8, "embed_dim": 64, "depth": 2,
                        "num_heads": 4, "num_classes": num_classes})


def test_w8a8_dense_matches_numpy_reference():
    r = np.random.RandomState(0)
    x = r.randn(5, 7, 16).astype(np.float32)
    w = (r.randn(16, 12) * 0.3).astype(np.float32)
    b = r.randn(12).astype(np.float32)

    s_w = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    s_x = np.maximum(np.abs(x).max(axis=-1, keepdims=True), 127e-8) / 127.0
    x_q = np.clip(np.round(x / s_x), -127, 127).astype(np.int8)
    ref = (x_q.astype(np.int32) @ w_q.astype(np.int32)) * s_x * s_w + b

    got = quant.w8a8_dense(jnp.asarray(x), jnp.asarray(w_q),
                           jnp.asarray(s_w), jnp.asarray(b), jnp.float32)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)
    # and the quantization error itself is bounded by the step sizes
    full = x @ w + b
    step = np.abs(x).max(axis=-1, keepdims=True) / 127.0 * np.abs(w).sum(0) \
        + np.abs(w).max(axis=0) / 127.0 * np.abs(x).sum(-1, keepdims=True)
    assert (np.abs(ref - full) <= step + 1e-4).all()


@pytest.mark.parametrize("act_mode,cos_bar", [("dynamic", 0.999),
                                              ("static", 0.995)])
def test_vit_quantized_logits_match_f32(act_mode, cos_bar):
    model = _tiny_vit()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (8, 32, 32, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": rng}, x)
    ref = np.asarray(model.apply(variables, x, train=False))

    qfwd, qparams = quant.quantize_for_inference(model, variables, x,
                                                 act_mode=act_mode,
                                                 train=False)
    got = np.asarray(jax.jit(qfwd)(qparams, x))

    cos = float((ref * got).sum()
                / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > cos_bar, (act_mode, cos)
    assert (ref.argmax(-1) == got.argmax(-1)).mean() >= 0.875
    assert np.isfinite(got).all()
    # static mode ships one calibrated scalar per quantized layer
    # (9 Dense + the patch-embed Conv)
    n_scales = sum(1 for k in traverse_util.flatten_dict(qparams)
                   if k[-1] == "act_scale")
    assert n_scales == (10 if act_mode == "static" else 0)


def test_static_calibration_covers_unseen_batch():
    """Static scales calibrated on one batch must stay accurate on a
    different batch drawn from the same distribution (the clip guard
    is the margin knob; abs-max calibration is conservative)."""
    model = _tiny_vit()
    rng = jax.random.PRNGKey(0)
    x_cal = jax.random.normal(jax.random.fold_in(rng, 1), (8, 32, 32, 3))
    x_new = jax.random.normal(jax.random.fold_in(rng, 2), (8, 32, 32, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": rng}, x_cal)
    qfwd, qparams = quant.quantize_for_inference(model, variables, x_cal,
                                                 act_mode="static",
                                                 train=False)
    ref = np.asarray(model.apply(variables, x_new, train=False))
    got = np.asarray(jax.jit(qfwd)(qparams, x_new))
    cos = float((ref * got).sum()
                / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > 0.99, cos


def test_only_dense_kernels_quantized():
    model = _tiny_vit()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": rng}, x)
    params = variables["params"]
    paths = quant.collect_dense_kernel_paths(model, variables, x,
                                             train=False)
    # 2 blocks x (qkv, proj, fc1, fc2) + head
    assert len(paths) == 9, sorted(paths)
    qparams = quant.quantize_dense_params(params, paths)

    flat = traverse_util.flatten_dict(params)
    qflat = traverse_util.flatten_dict(qparams)
    n_int8 = sum(1 for v in qflat.values() if v.dtype == jnp.int8)
    assert n_int8 == len(paths)
    for k, v in flat.items():
        if tuple(k) in paths:
            assert k not in qflat  # kernel replaced by kernel_q/scale
        else:
            # conv stem, norms, biases, cls/pos tokens: bit-identical
            np.testing.assert_array_equal(np.asarray(qflat[k]),
                                          np.asarray(v))
    # int8 leaves exist for every quantized kernel, and round-trip:
    for k in paths:
        w = np.asarray(flat[k], np.float32)
        w_q = np.asarray(qflat[k[:-1] + ("kernel_q",)], np.float32)
        s = np.asarray(qflat[k[:-1] + ("kernel_scale",)], np.float32)
        np.testing.assert_allclose(w_q * s, w, atol=np.abs(w).max() / 120)


def test_w8a8_conv_matches_integer_reference():
    """The int8 conv accumulates exactly like an f32 conv over the
    same quantized operands (int32 accumulation is exact for these
    magnitudes), including stride + int padding + rescale + bias."""
    import flax.linen as nn

    r = np.random.RandomState(1)
    x = r.randn(2, 9, 9, 5).astype(np.float32)
    conv = nn.Conv(7, (3, 3), strides=(2, 2), padding=1, dtype=jnp.float32)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])
    b = np.asarray(variables["params"]["bias"])

    s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-8) / 127.0
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    s_x = np.maximum(np.abs(x).max(axis=(1, 2, 3), keepdims=True),
                     127e-8) / 127.0
    x_q = np.clip(np.round(x / s_x), -127, 127).astype(np.int8)
    # f32 conv over the quantized operands == exact int accumulation
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(x_q, jnp.float32), jnp.asarray(w_q, jnp.float32),
        (2, 2), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(acc) * s_x * s_w + b

    got = quant.w8a8_conv(jnp.asarray(x), jnp.asarray(w_q),
                          jnp.asarray(s_w), jnp.asarray(b), conv,
                          jnp.float32)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_resnet_quantized_logits_match_f32():
    """Conv quantization end-to-end on a small ResNet (BN in inference
    mode, strided convs, downsample branches)."""
    model = build_model({"name": "resnet18", "num_classes": 10})
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 3), (4, 32, 32, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": rng}, x)
    ref = np.asarray(model.apply(variables, x, train=False))

    qfwd, qparams = quant.quantize_for_inference(model, variables, x,
                                                 act_mode="dynamic",
                                                 train=False)
    got = np.asarray(jax.jit(qfwd)(qparams, x))
    cos = float((ref * got).sum()
                / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > 0.99, cos
    n_int8 = sum(1 for v in traverse_util.flatten_dict(qparams).values()
                 if v.dtype == jnp.int8)
    assert n_int8 >= 20  # every conv + the head

    # conv=False leaves convs alone: only the head Dense quantizes
    _, qp2 = quant.quantize_for_inference(model, variables, x,
                                          conv=False, train=False)
    n2 = sum(1 for v in traverse_util.flatten_dict(qp2).values()
             if v.dtype == jnp.int8)
    assert n2 == 1


def test_unknown_quantize_mode_raises(tmp_path):
    from passl_tpu.utils import io

    model = _tiny_vit()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.PRNGKey(0)}, x)
    with pytest.raises(ValueError, match="quantize"):
        io.export(model, variables, x, str(tmp_path), quantize="fp4")


@pytest.mark.slow
def test_quantized_export_roundtrip(tmp_path):
    """Export.quantize=int8 bakes the int8 graph into the StableHLO
    artifact; the Predictor serves it and reproduces the in-process
    quantized logits exactly (same graph, same platform)."""
    from passl_tpu.engine.inference import Predictor
    from passl_tpu.utils import io

    model = _tiny_vit()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 2), (4, 32, 32, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": rng}, x)
    io.export(model, variables, x, str(tmp_path), quantize="int8")

    qfwd, qparams = quant.quantize_for_inference(model, variables, x,
                                                 train=False)
    direct = np.asarray(jax.jit(qfwd)(qparams, x))

    pred = Predictor(str(tmp_path))
    served = pred.predict(np.asarray(x))
    np.testing.assert_allclose(served, direct, rtol=1e-5, atol=1e-5)
