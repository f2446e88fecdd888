"""ConvNeXt.

Capability parity with reference `passl/models/convnext.py` (231 LoC:
ConvNeXt blocks with 7x7 depthwise conv, channel-last LayerNorm,
pointwise MLP, LayerScale gamma, stochastic depth; tiny/small/base/
large/xlarge variants; head with trunc-normal init).

TPU-native: NHWC throughout — depthwise conv via feature_group_count,
LayerNorm directly on the channel-last layout (no permutes at all,
unlike the reference's NCHW⇄NLC transposes).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..nn import init as tinit
from ..nn.layers import DropPath
from .base import Model, register_model


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, kernel_init=tinit.trunc_normal_(std=0.02), name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, kernel_init=tinit.trunc_normal_(std=0.02),
                     name="pwconv1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, kernel_init=tinit.trunc_normal_(std=0.02),
                     name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param("gamma", tinit.constant_(self.layer_scale_init_value),
                               (self.dim,), jnp.float32)
            x = x * gamma
        x = DropPath(self.drop_path, name="drop_path")(x, deterministic=not train)
        return inp + x


@register_model
class ConvNeXt(Model):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    head_init_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dp_rates = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        for i in range(4):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                            kernel_init=tinit.trunc_normal_(std=0.02), name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"downsample_norm{i}")(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2), dtype=self.dtype,
                            kernel_init=tinit.trunc_normal_(std=0.02), name=f"downsample_conv{i}")(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(self.dims[i], float(dp_rates[cur]),
                                  self.layer_scale_init_value, self.dtype,
                                  name=f"stage{i}_block{j}")(x, train=train)
                cur += 1
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.num_classes > 0:
            # head_init_scale multiplies the trunc-normal init (reference
            # scales weight+bias post-init)
            x = nn.Dense(self.num_classes, dtype=self.dtype,
                         kernel_init=tinit.trunc_normal_(std=0.02 * self.head_init_scale),
                         name="head")(x)
        return x


_CONVNEXT = {
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "convnext_small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "convnext_base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "convnext_large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "convnext_xlarge": dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048)),
}

from .base import MODELS  # noqa: E402

for _name, _d in _CONVNEXT.items():
    def _make(defaults=_d):
        def factory(**kw):
            merged = dict(defaults)
            merged.update(kw)
            return ConvNeXt(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)
