"""Post-training int8 quantization for inference (W8A8).

TPU-native deploy feature beyond the reference (PASSL's deploy story,
`deploy/utils/predictor.py:35-70`, serves fp32/fp16 artifacts only):
TPU v5e executes int8xint8->int32 matmuls on the MXU at ~2x the bf16
peak (394 vs 197 TOPS), so a quantized serving artifact can double
inference throughput on the same chip.

Scheme (the standard LLM/ViT serving recipe):
  - weights: symmetric per-output-channel int8,
    `w_q = round(w / s_w)`, `s_w[j] = max_i |w[i, j]| / 127`
  - activations: symmetric int8, either *static* per-tensor scales
    calibrated by one forward over sample data (default; quantize is a
    single fused elementwise pass) or *dynamic* per-token scales
    `s_x = max_j |x[..., j]| / 127` computed in-graph (no calibration,
    one extra reduce pass per Dense)
  - accumulate int32 on the MXU, rescale `y = (x_q @ w_q) * s_x * s_w`
    in f32, add bias, cast back to the model's activation dtype.

`flax.linen.Dense` layers (qkv/proj/mlp/head — the dominant FLOPs of
every transformer in the zoo) and plain 2-D `flax.linen.Conv` layers
(ResNet bodies, patch-embed stems) are quantized. Layer norms and the
attention score/AV einsums stay in the model's compute dtype; they are
a small FLOP share and the accuracy-sensitive part.

Measured on-chip (v5e, bs512 inference, fetch-synced):
  - ViT-B/16: static 2148.8 imgs/s vs bf16 1900.4 = 1.13x; dynamic
    1819.1 = 0.96x (per-token abs-max reduce costs more than the int8
    MXU saves at d=768). Logits cosine vs f32 > 0.995.
  - ResNet50 (conv path): static 13095.5 vs bf16 11818.6 = 1.11x,
    cosine 0.99982; dynamic 8837.1 = 0.75x — a measured NEGATIVE: the
    per-sample abs-max over H*W*C activations is pure VPU/HBM work
    re-run before all 53 convs and swamps the MXU saving. Use static
    (the default) for convnets.

No model changes are needed: quantized apply runs the unmodified module
under `flax.linen.intercept_methods`, replacing each Dense call whose
params carry `kernel_q`/`kernel_scale` with the int8 path. Dense
kernels are *discovered* by a recording trace (not guessed from the
param tree), so 2-D params that are not Dense kernels are left alone.

The quantized function traces to plain StableHLO, so `io.export` can
bake it into the serving artifact (`Export.quantize: int8`) and both
runtimes (JAX Predictor, TF SavedModel) serve int8 with no new code.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, FrozenSet, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import traverse_util

PathT = Tuple[str, ...]


def w8a8_dense(x: jax.Array, kernel_q: jax.Array, kernel_scale: jax.Array,
               bias, out_dtype, act_scale=None) -> jax.Array:
    """int8 activation x int8 weight matmul with f32 rescale.

    x: [..., d_in] float; kernel_q: [d_in, d_out] int8;
    kernel_scale: [d_out] f32 (per-output-channel weight scale);
    act_scale: None for dynamic per-token activation scales (an extra
    abs-max reduce pass over x), or a calibrated f32 scalar for static
    per-tensor quantization (one fused elementwise pass — measured
    faster end-to-end on v5e, see docs/benchmarks.md int8 row).
    """
    xf = x.astype(jnp.float32)
    if act_scale is None:
        s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        s_x = jnp.maximum(s_x, 1e-8)
    else:
        s_x = act_scale.astype(jnp.float32)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, kernel_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * kernel_scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _conv_is_supported(mod) -> bool:
    """Only the plain-conv surface the int8 path reimplements exactly:
    2-D NHWC, no dilation, no mask, no circular padding."""
    def _trivial(dil):
        return dil is None or dil == 1 or (
            hasattr(dil, "__iter__") and all(d == 1 for d in dil))

    return (_trivial(mod.input_dilation) and _trivial(mod.kernel_dilation)
            and getattr(mod, "mask", None) is None
            and not (isinstance(mod.padding, str)
                     and mod.padding.upper() == "CIRCULAR"))


def collect_quantizable_paths(model, variables, *args, conv: bool = True,
                              **apply_kwargs) -> Dict[PathT, str]:
    """Abstractly trace one apply and record every quantizable kernel:
    {kernel_path: "dense" | "conv"}.

    Runs under jax.eval_shape, so no FLOPs execute and no backend is
    required; the interceptor's side effect (path recording) happens at
    trace time.
    """
    paths: Dict[PathT, str] = {}

    def recorder(next_fn, fargs, fkwargs, context):
        mod = context.module
        if context.method_name == "__call__":
            if type(mod) is nn.Dense:
                paths[tuple(mod.path) + ("kernel",)] = "dense"
            elif conv and type(mod) is nn.Conv and fargs[0].ndim == 4 \
                    and _conv_is_supported(mod):
                paths[tuple(mod.path) + ("kernel",)] = "conv"
        return next_fn(*fargs, **fkwargs)

    def run(v, a):
        with nn.intercept_methods(recorder):
            return model.apply(v, *a, **apply_kwargs)

    jax.eval_shape(run, variables, args)
    return paths


def collect_dense_kernel_paths(model, variables, *args,
                               **apply_kwargs) -> FrozenSet[PathT]:
    """Dense-only view of collect_quantizable_paths."""
    return frozenset(
        k for k, kind in collect_quantizable_paths(
            model, variables, *args, conv=False, **apply_kwargs).items()
        if kind == "dense")


def calibrate_act_scales(model, variables, calib_x, paths,
                         margin: float = 1.0, **apply_kwargs):
    """Run one real forward over a calibration batch, recording the
    abs-max input each quantized layer sees. Returns {kernel_path:
    scalar f32 scale} for static per-tensor activation quantization.

    margin > 1 leaves clip headroom for activations beyond the
    calibration batch's range (abs-max calibration, the simplest and
    most conservative PTQ recipe).
    """
    maxes: Dict[PathT, Any] = {}

    def recorder(next_fn, fargs, fkwargs, context):
        mod = context.module
        if type(mod) in (nn.Dense, nn.Conv) \
                and context.method_name == "__call__":
            k = tuple(mod.path) + ("kernel",)
            if k in paths:
                m = jnp.max(jnp.abs(fargs[0].astype(jnp.float32)))
                maxes[k] = jnp.maximum(maxes[k], m) if k in maxes else m
        return next_fn(*fargs, **fkwargs)

    with nn.intercept_methods(recorder):
        model.apply(variables, calib_x, **apply_kwargs)
    return {k: jnp.maximum(m * margin / 127.0, 1e-8)
            for k, m in maxes.items()}


def quantize_dense_params(params, paths, act_scales=None):
    """Replace each quantizable `kernel` leaf with int8 `kernel_q` +
    per-output-channel f32 `kernel_scale` (+ a calibrated scalar
    `act_scale` when static activation quantization is requested).
    `paths` is the kind map from collect_quantizable_paths (a plain
    set/frozenset of Dense paths also works). All other leaves
    (biases, norms, unlisted 2-D params) pass through untouched."""
    kinds = paths if isinstance(paths, dict) else {k: "dense" for k in paths}
    flat = traverse_util.flatten_dict(params)
    qflat: Dict[PathT, Any] = {}
    n_q = 0
    for k, v in flat.items():
        k = tuple(k)
        if k in kinds:
            want = 2 if kinds[k] == "dense" else 4
            if v.ndim != want:  # Dense [din,dout]; Conv [kh,kw,cin,cout]
                raise ValueError(f"{kinds[k]} kernel at {k} has ndim={v.ndim}")
            w = jnp.asarray(v, jnp.float32)
            reduce_axes = tuple(range(v.ndim - 1))
            scale = jnp.maximum(jnp.max(jnp.abs(w), axis=reduce_axes),
                                1e-8) / 127.0
            w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
            qflat[k[:-1] + ("kernel_q",)] = w_q
            qflat[k[:-1] + ("kernel_scale",)] = scale
            if act_scales is not None:
                qflat[k[:-1] + ("act_scale",)] = jnp.asarray(
                    act_scales[k], jnp.float32)
            n_q += 1
        else:
            qflat[k] = v
    if n_q == 0:
        raise ValueError("no quantizable kernels found")
    return traverse_util.unflatten_dict(qflat)


def _canon_conv_padding(padding, nd: int):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * nd
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def w8a8_conv(x: jax.Array, kernel_q: jax.Array, kernel_scale: jax.Array,
              bias, mod, out_dtype, act_scale=None) -> jax.Array:
    """int8 NHWC conv with f32 rescale (the conv analogue of
    w8a8_dense). Zero-padding is exact under symmetric quantization
    (0 maps to 0), so padding-then-quantizing == quantizing-then-
    padding. Dynamic mode uses a per-sample scale (each output row
    depends on one input image only, so per-sample scaling is exact
    linearity, like per-token for Dense)."""
    nd = kernel_q.ndim - 2
    xf = x.astype(jnp.float32)
    if act_scale is None:
        s_x = jnp.max(jnp.abs(xf), axis=tuple(range(1, x.ndim)),
                      keepdims=True) / 127.0
        s_x = jnp.maximum(s_x, 1e-8)
    else:
        s_x = act_scale.astype(jnp.float32)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    strides = mod.strides if mod.strides is not None else 1
    if isinstance(strides, int):
        strides = (strides,) * nd
    acc = jax.lax.conv_general_dilated(
        x_q, kernel_q, tuple(strides),
        _canon_conv_padding(mod.padding, nd),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * kernel_scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def quant_interceptor(next_fn, args, kwargs, context):
    """flax method interceptor: swap Dense/Conv calls onto the int8
    path when the bound params carry quantized weights."""
    mod = context.module
    if context.method_name == "__call__" and type(mod) in (nn.Dense, nn.Conv):
        p = mod.variables.get("params", {})
        if "kernel_q" in p:
            (x,) = args
            bias = p.get("bias") if mod.use_bias else None
            out_dtype = mod.dtype if mod.dtype is not None else x.dtype
            if type(mod) is nn.Dense:
                return w8a8_dense(x, p["kernel_q"], p["kernel_scale"],
                                  bias, out_dtype,
                                  act_scale=p.get("act_scale"))
            return w8a8_conv(x, p["kernel_q"], p["kernel_scale"],
                             bias, mod, out_dtype,
                             act_scale=p.get("act_scale"))
    return next_fn(*args, **kwargs)


def quantize_for_inference(model, variables, *sample_args,
                           act_mode: str = "static", conv: bool = True,
                           **apply_kwargs) -> Tuple[Callable, Any]:
    """Build the int8 serving pair for an unmodified flax model.

    Returns (qfwd, qparams): `qfwd(qparams, x)` runs inference with all
    Dense (and, by default, 2-D Conv) layers on the int8 MXU path.
    `sample_args`/`apply_kwargs` must match how the model will be
    called (e.g. `train=False`).

    act_mode:
      - "static" (default): per-tensor activation scales calibrated by
        one forward over `sample_args[0]` (abs-max). Fastest — the
        quantize step is a single fused elementwise pass. Calibrate
        with representative data for accuracy-sensitive serving.
      - "dynamic": per-token (Dense) / per-sample (Conv) scales
        computed in-graph. No calibration data needed and robust to
        range drift, at the cost of an extra abs-max reduce pass per
        quantized layer.
    """
    if act_mode not in ("static", "dynamic"):
        raise ValueError(f"act_mode must be static|dynamic, got {act_mode!r}")
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    paths = collect_quantizable_paths(
        model, variables, *sample_args, conv=conv, **apply_kwargs)
    act_scales = None
    if act_mode == "static":
        act_scales = calibrate_act_scales(
            model, variables, sample_args[0], paths, **apply_kwargs)
    qparams = quantize_dense_params(params, paths, act_scales=act_scales)

    def qfwd(p, x):
        with nn.intercept_methods(quant_interceptor):
            return model.apply({"params": p, **model_state}, x,
                               **apply_kwargs)

    return qfwd, qparams
