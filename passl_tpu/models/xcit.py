"""XCiT: cross-covariance image transformer.

Capability parity with reference `passl_v110/modeling/backbones/
xcit.py`: XCA (attention over the channel dimension with learnable
temperature), LPI local patch interaction (depthwise convs), conv
patch projection, class-attention final stage.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import init as tinit
from ..nn.layers import DropPath, Mlp
from .base import MODELS, Model, register_model
from .cait import ClassAttention
from ..nn.norm import l2_normalize


class XCA(nn.Module):
    """Cross-covariance attention: softmax over (C/h x C/h) channel
    similarity of L2-normalized q/k, learnable per-head temperature."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, l, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x).reshape(n, l, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [n, l, h, d]
        q = l2_normalize(q.astype(jnp.float32), axis=1)  # normalize over tokens
        k = l2_normalize(k.astype(jnp.float32), axis=1)
        temp = self.param("temperature", nn.initializers.ones, (h, 1, 1), jnp.float32)
        attn = jnp.einsum("nlhd,nlhe->nhde", q, k) * temp  # [n, h, d, d]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhde,nlhe->nlhd", attn, v).reshape(n, l, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class LPI(nn.Module):
    """Local patch interaction: two 3x3 depthwise convs over the grid."""

    grid: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n, l, c = x.shape
        g = self.grid
        y = x.reshape(n, g, g, c)
        y = nn.Conv(c, (3, 3), padding=1, feature_group_count=c, dtype=self.dtype, name="conv1")(y)
        y = nn.gelu(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(y)
        y = nn.Conv(c, (3, 3), padding=1, feature_group_count=c, dtype=self.dtype, name="conv2")(y)
        return y.reshape(n, l, c)


class XCiTBlock(nn.Module):
    num_heads: int
    grid: int
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        det = not train
        g1 = self.param("gamma1", tinit.constant_(self.init_values), (c,), jnp.float32)
        g2 = self.param("gamma2", tinit.constant_(self.init_values), (c,), jnp.float32)
        g3 = self.param("gamma3", tinit.constant_(self.init_values), (c,), jnp.float32)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + DropPath(self.drop_path, name="dp1")(
            XCA(self.num_heads, self.dtype, name="attn")(y, det) * g1, deterministic=det)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x)
        x = x + DropPath(self.drop_path, name="dp3")(
            LPI(self.grid, self.dtype, name="local_mp")(y, train) * g3, deterministic=det)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + DropPath(self.drop_path, name="dp2")(
            Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, det) * g2,
            deterministic=det)
        return x


@register_model
class XCiT(Model):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 8
    cls_attn_layers: int = 2
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    drop_path_rate: float = 0.0
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = x.shape[0]
        # conv patch projection (3 stride-2 convs for /8, 4 for /16)
        steps = int(np.log2(self.patch_size))
        dim = self.embed_dim // (2 ** (steps - 1))
        for i in range(steps):
            x = nn.Conv(min(dim * (2**i), self.embed_dim), (3, 3), strides=(2, 2),
                        padding=1, dtype=self.dtype, name=f"patch_proj{i}")(x)
            if i < steps - 1:
                x = nn.gelu(x)
        g = x.shape[1]
        x = x.reshape(n, g * g, self.embed_dim)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = XCiTBlock(self.num_heads, g, self.mlp_ratio, self.init_values,
                          float(dpr[i]), self.dtype, name=f"blocks_{i}")(x, train=train)
        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                               (1, 1, self.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        for i in range(self.cls_attn_layers):
            u = jnp.concatenate([cls, x], axis=1)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"ca_norm{i}")(u)
            cls = cls + ClassAttention(self.num_heads, dtype=self.dtype,
                                       name=f"cls_attn_{i}")(y, not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(cls)[:, 0]
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype,
                         kernel_init=tinit.trunc_normal_(std=0.02), name="head")(x)
        return x


# full reference size table (configs/xcit/*.yaml: 7 sizes x {p16, p8});
# eta (LayerScale init) is 1.0 for 12-layer models and 1e-5 for 24-layer
# ones, matching the reference yamls (nano/tiny/small eta: 1.0,
# large eta: 1e-5)
_XCIT_SIZES = {
    "xcit_nano_12": dict(embed_dim=128, depth=12, num_heads=4, init_values=1.0),
    "xcit_tiny_12": dict(embed_dim=192, depth=12, num_heads=4, init_values=1.0),
    "xcit_tiny_24": dict(embed_dim=192, depth=24, num_heads=4, init_values=1e-5),
    "xcit_small_12": dict(embed_dim=384, depth=12, num_heads=8, init_values=1.0),
    "xcit_small_24": dict(embed_dim=384, depth=24, num_heads=8, init_values=1e-5),
    "xcit_medium_24": dict(embed_dim=512, depth=24, num_heads=8, init_values=1e-5),
    "xcit_large_24": dict(embed_dim=768, depth=24, num_heads=16, init_values=1e-5),
}

for _name, _cfg in {
    **{f"{s}_p16": dict(cfg, patch_size=16) for s, cfg in _XCIT_SIZES.items()},
    **{f"{s}_p8": dict(cfg, patch_size=8) for s, cfg in _XCIT_SIZES.items()},
}.items():
    def _make(cfg=_cfg):
        def factory(**kw):
            merged = dict(cfg)
            merged.update(kw)
            return XCiT(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)
