"""ResNet family, TPU-native (NHWC, XLA convs, bf16 compute).

Capability parity with reference `passl/models/resnet.py` (wrapping
paddle.vision ResNet: resnet18/34/50/101/152 + wide variants, optional
head removal) and the v110 backbones (`passl_v110/modeling/backbones/
resnet.py`), including the SSL-specific knobs the methods need:
`zero_init_residual`, `bn_splits` (SplitBatchNorm for MoCo shuffle-BN
parity, see passl_tpu/nn/norm.py), frozen-BN linear-probe mode, and a
CIFAR stem variant (3x3/1 conv, no maxpool) used by the cifar configs.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn import init as tinit
from ..nn.norm import (FusedGradBatchNorm, GhostGradBatchNorm,
                       SplitBatchNorm, SubsampledBatchNorm)
from .base import Model, register_model

Dtype = Any


def _make_norm(bn_splits: int, dtype, name: str, use_running_average: bool, momentum: float = 0.9,
               bn_stats_stride: int = 1, bn_stats_slice: int = 1, bn_impl: str = "flax"):
    if bn_splits > 1 and (bn_stats_stride > 1 or bn_stats_slice > 1):
        raise ValueError("bn_splits and bn_stats_stride/slice are mutually exclusive "
                         "(SplitBatchNorm already computes per-split stats)")
    if bn_impl == "ghost_grad" and bn_splits <= 1 and bn_stats_stride <= 1 and bn_stats_slice <= 1:
        # exact forward, stats-as-constants backward: -12.7% R50 step
        # (see nn/norm.py GhostGradBatchNorm; learning-check validated)
        return GhostGradBatchNorm(
            use_running_average=use_running_average,
            momentum=momentum,
            epsilon=1e-5,
            dtype=dtype,
            name=name,
        )
    if bn_impl == "fused_grad" and bn_splits <= 1 and bn_stats_stride <= 1 and bn_stats_slice <= 1:
        # exact BN with a closed-form custom-VJP backward: measured
        # PARITY with flax autodiff on v5e (clean A/B +0.4%/-0.7%) —
        # XLA already derives the closed form; kept as the documented
        # negative (docs/benchmarks.md)
        return FusedGradBatchNorm(
            use_running_average=use_running_average,
            momentum=momentum,
            epsilon=1e-5,
            dtype=dtype,
            name=name,
        )
    if bn_splits > 1:
        return SplitBatchNorm(
            num_splits=bn_splits,
            use_running_average=use_running_average,
            momentum=momentum,
            epsilon=1e-5,
            dtype=dtype,
            name=name,
        )
    if bn_stats_stride > 1 or bn_stats_slice > 1:
        return SubsampledBatchNorm(
            stats_stride=bn_stats_stride,
            stats_slice=bn_stats_slice,
            use_running_average=use_running_average,
            momentum=momentum,
            epsilon=1e-5,
            dtype=dtype,
            name=name,
        )
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=momentum,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class SpaceToDepthStem(nn.Module):
    """Exact space-to-depth reformulation of the 7x7/s2 stem conv (the
    classic TPU ResNet optimization, e.g. MLPerf TPU submissions).

    A 7x7 stride-2 conv on 3-channel input runs the MXU at 3/128 lane
    occupancy on the contraction. Equivalent computation: zero-pad the
    kernel to 8x8 at the top-left, 2x2-space-to-depth the input
    ([H,W,3] -> [H/2,W/2,12]) and the kernel ([8,8,3,F] ->
    [4,4,12,F]), then convolve stride-1 VALID. Bit-equivalent modulo
    float summation order (test_backbones.py asserts numerics).

    The parameter keeps the canonical [7,7,C,F] shape under the same
    "conv1/kernel" path, so checkpoints interchange freely with the
    nn.Conv stem and the transform stays inside the jitted graph
    (differentiable; XLA folds the kernel reshape into a constant-like
    preamble per step — negligible next to the conv itself).
    """

    features: int = 64
    dtype: Dtype = jnp.float32
    kernel_init: Callable = tinit.kaiming_normal_(mode="fan_out", nonlinearity="relu")

    @nn.compact
    def __call__(self, x):
        import jax

        n, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, "s2d stem needs even spatial dims"
        k = self.param("kernel", self.kernel_init, (7, 7, c, self.features),
                       jnp.float32)
        # window for output i covers rows 2i-3..2i+3 (pad=3); prepend a
        # zero kernel row/col so the window start 2i-4 is block-aligned
        k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = (k8.reshape(4, 2, 4, 2, c, self.features)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(4, 4, 4 * c, self.features))
        xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
        hh, ww = (h + 6) // 2, (w + 6) // 2
        xs = (xp.reshape(n, hh, 2, ww, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, hh, ww, 4 * c))
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), k4.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    downsample: bool = False
    bn_splits: int = 0
    bn_stats_stride: int = 1
    bn_stats_slice: int = 1
    bn_impl: str = "flax"
    dtype: Dtype = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = functools.partial(
            nn.Conv, use_bias=False, dtype=self.dtype,
            kernel_init=tinit.kaiming_normal_(mode="fan_out", nonlinearity="relu"),
        )
        norm = functools.partial(_make_norm, self.bn_splits, self.dtype, use_running_average=not train, bn_stats_stride=self.bn_stats_stride, bn_stats_slice=self.bn_stats_slice, bn_impl=self.bn_impl)
        identity = x
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides), padding=1, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=1, name="conv2")(y)
        y = _make_norm(self.bn_splits, self.dtype, "bn2", not train, bn_stats_stride=self.bn_stats_stride, bn_stats_slice=self.bn_stats_slice, bn_impl=self.bn_impl)(y)
        if self.downsample:
            identity = conv(self.filters, (1, 1), strides=(self.strides, self.strides), name="downsample_conv")(x)
            identity = norm(name="downsample_bn")(identity)
        return nn.relu(y + identity)


class BottleneckBlock(nn.Module):
    filters: int
    strides: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    bn_splits: int = 0
    bn_stats_stride: int = 1
    bn_stats_slice: int = 1
    bn_impl: str = "flax"
    dtype: Dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        conv = functools.partial(
            nn.Conv, use_bias=False, dtype=self.dtype,
            kernel_init=tinit.kaiming_normal_(mode="fan_out", nonlinearity="relu"),
        )
        norm = functools.partial(_make_norm, self.bn_splits, self.dtype, use_running_average=not train, bn_stats_stride=self.bn_stats_stride, bn_stats_slice=self.bn_stats_slice, bn_impl=self.bn_impl)
        identity = x
        y = conv(width, (1, 1), name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = conv(width, (3, 3), strides=(self.strides, self.strides), padding=1,
                 feature_group_count=self.groups, name="conv2")(y)
        y = nn.relu(norm(name="bn2")(y))
        y = conv(self.filters * self.expansion, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)
        if self.downsample:
            identity = conv(self.filters * self.expansion, (1, 1),
                            strides=(self.strides, self.strides), name="downsample_conv")(x)
            identity = norm(name="downsample_bn")(identity)
        return nn.relu(y + identity)


@register_model
class ResNet(Model):
    """ResNet backbone/classifier.

    num_classes=0 removes the head (feature extractor, like the
    reference SSL usage `paddle.vision.resnet50(num_classes=0)`).
    """

    block: str = "bottleneck"  # "basic" | "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    bn_splits: int = 0
    bn_stats_stride: int = 1  # >1: subsampled BN stats (experimental; see nn.norm)
    bn_stats_slice: int = 1  # >1: prefix-slice BN stats (experimental; see nn.norm)
    bn_impl: str = "flax"  # "flax" | "fused_grad" (exact, parity) | "ghost_grad" (-12.7% step, approx backward)
    with_pool: bool = True
    cifar_stem: bool = False
    stem_impl: str = "conv7"  # "conv7" | "s2d" (space-to-depth, exact; see SpaceToDepthStem)
    dtype: Any = jnp.float32
    head_init_std: Optional[float] = None  # e.g. 0.01 for linear probe

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_cls = BasicBlock if self.block == "basic" else BottleneckBlock
        conv = functools.partial(
            nn.Conv, use_bias=False, dtype=self.dtype,
            kernel_init=tinit.kaiming_normal_(mode="fan_out", nonlinearity="relu"),
        )
        if self.cifar_stem:
            x = conv(64, (3, 3), padding=1, name="conv1")(x)
        elif self.stem_impl == "s2d":
            x = SpaceToDepthStem(features=64, dtype=self.dtype, name="conv1")(x)
        else:
            x = conv(64, (7, 7), strides=(2, 2), padding=3, name="conv1")(x)
        x = _make_norm(self.bn_splits, self.dtype, "bn1", not train, bn_stats_stride=self.bn_stats_stride, bn_stats_slice=self.bn_stats_slice, bn_impl=self.bn_impl)(x)
        x = nn.relu(x)
        if not self.cifar_stem:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        filters = 64
        for i, n_blocks in enumerate(self.layers):
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                in_ch = x.shape[-1]
                out_ch = filters * block_cls.expansion
                kw = dict(
                    filters=filters,
                    strides=strides,
                    downsample=(strides != 1 or in_ch != out_ch),
                    bn_splits=self.bn_splits,
                    bn_stats_stride=self.bn_stats_stride,
                    bn_stats_slice=self.bn_stats_slice,
                    bn_impl=self.bn_impl,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )
                if block_cls is BottleneckBlock:
                    kw.update(groups=self.groups, base_width=self.width_per_group)
                x = block_cls(**kw)(x, train=train)
            filters *= 2

        if self.with_pool:
            x = jnp.mean(x, axis=(1, 2))  # global average pool
        if self.num_classes > 0:
            head_init = (
                tinit.normal_(0.0, self.head_init_std)
                if self.head_init_std
                else nn.initializers.lecun_normal()
            )
            x = nn.Dense(self.num_classes, dtype=self.dtype, kernel_init=head_init, name="fc")(x)
        return x


# Named factories (registered so configs can say `name: resnet50`).
@register_model(name="resnet18")
def resnet18(**kw):
    return ResNet(block="basic", layers=(2, 2, 2, 2), **kw)


@register_model(name="resnet34")
def resnet34(**kw):
    return ResNet(block="basic", layers=(3, 4, 6, 3), **kw)


@register_model(name="resnet50")
def resnet50(**kw):
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3), **kw)


@register_model(name="resnet101")
def resnet101(**kw):
    return ResNet(block="bottleneck", layers=(3, 4, 23, 3), **kw)


@register_model(name="resnet152")
def resnet152(**kw):
    return ResNet(block="bottleneck", layers=(3, 8, 36, 3), **kw)


@register_model(name="wide_resnet50_2")
def wide_resnet50_2(**kw):
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3), width_per_group=128, **kw)


@register_model(name="wide_resnet101_2")
def wide_resnet101_2(**kw):
    return ResNet(block="bottleneck", layers=(3, 4, 23, 3), width_per_group=128, **kw)


@register_model(name="resnext50_32x4d")
def resnext50_32x4d(**kw):
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3), groups=32, width_per_group=4, **kw)
