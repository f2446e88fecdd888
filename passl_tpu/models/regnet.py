"""RegNet (X/Y).

Capability parity with reference `passl_v110/modeling/backbones/
regnet.py`: quantized-width stage design from (w_a, w_0, w_m, depth),
group conv bottlenecks, optional SE (RegNetY).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .base import MODELS, Model, register_model


def generate_regnet(w_a: float, w_0: int, w_m: float, depth: int, q: int = 8) -> Tuple[List[int], List[int]]:
    """Per-stage widths/depths from the RegNet design-space params."""
    ws_cont = np.arange(depth) * w_a + w_0
    ks = np.round(np.log(ws_cont / w_0) / np.log(w_m))
    ws = w_0 * np.power(w_m, ks)
    ws = np.round(ws / q) * q
    num_stages = len(np.unique(ws))
    ws = ws.astype(int).tolist()
    stage_widths = sorted(set(ws))
    stage_depths = [ws.count(w) for w in stage_widths]
    return stage_widths, stage_depths


def adjust_widths_groups(widths: List[int], group_width: int) -> Tuple[List[int], List[int]]:
    """Round each stage width to a multiple of its (capped) group width
    (reference regnet.py adjust_ws_gs semantics) — without this, large
    group widths (e.g. RegNetY-160's 112) leave widths the grouped conv
    cannot split."""
    gs = [min(group_width, w) for w in widths]
    ws = [int(round(w / g) * g) for w, g in zip(widths, gs)]
    return ws, gs


class SE(nn.Module):
    reduced: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="fc1")(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(s))
        return x * s


class XBlock(nn.Module):
    w_out: int
    stride: int
    group_width: int
    se_ratio: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = lambda f, k, s, g, name: nn.Conv(f, (k, k), strides=(s, s), padding=k // 2,
                                                feature_group_count=g, use_bias=False,
                                                dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype, name=name)
        groups = max(1, self.w_out // self.group_width)
        identity = x
        y = nn.relu(bn("bn1")(conv(self.w_out, 1, 1, 1, "conv1")(x)))
        y = nn.relu(bn("bn2")(conv(self.w_out, 3, self.stride, groups, "conv2")(y)))
        if self.se_ratio > 0:
            y = SE(max(1, int(x.shape[-1] * self.se_ratio)), self.dtype, name="se")(y)
        y = bn("bn3")(conv(self.w_out, 1, 1, 1, "conv3")(y))
        if self.stride != 1 or x.shape[-1] != self.w_out:
            identity = bn("bn_proj")(conv(self.w_out, 1, self.stride, 1, "conv_proj")(x))
        return nn.relu(y + identity)


@register_model
class RegNet(Model):
    w_a: float = 24.48
    w_0: int = 24
    w_m: float = 2.54
    depth: int = 22
    group_width: int = 16
    se_ratio: float = 0.0  # >0 → RegNetY
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        widths, depths = generate_regnet(self.w_a, self.w_0, self.w_m, self.depth)
        widths, group_ws = adjust_widths_groups(widths, self.group_width)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        for si, (w, gw, d) in enumerate(zip(widths, group_ws, depths)):
            for bi in range(d):
                x = XBlock(w, 2 if bi == 0 else 1, gw, self.se_ratio,
                           self.dtype, name=f"s{si + 1}_b{bi}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x


for _name, _cfg in {
    "RegNetX_200MF": dict(w_a=36.44, w_0=24, w_m=2.49, depth=13, group_width=8),
    "RegNetX_400MF": dict(w_a=24.48, w_0=24, w_m=2.54, depth=22, group_width=16),
    "RegNetX_1600MF": dict(w_a=34.01, w_0=80, w_m=2.25, depth=18, group_width=24),
    "RegNetX_4GF": dict(w_a=38.65, w_0=96, w_m=2.43, depth=23, group_width=40),
    "RegNetY_400MF": dict(w_a=27.89, w_0=48, w_m=2.09, depth=16, group_width=8, se_ratio=0.25),
    "RegNetY_4GF": dict(w_a=31.41, w_0=96, w_m=2.24, depth=22, group_width=64, se_ratio=0.25),
    # XCiT distillation teacher (reference configs/xcit/*_dist.yaml:
    # RegNet w_a 106.23, w_0 200, w_m 2.48, d 18, group_w 112, se_on)
    "RegNetY_160": dict(w_a=106.23, w_0=200, w_m=2.48, depth=18, group_width=112, se_ratio=0.25),
}.items():
    def _make(cfg=_cfg):
        def factory(**kw):
            merged = dict(cfg)
            merged.update(kw)
            return RegNet(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)
