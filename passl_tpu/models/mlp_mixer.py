"""MLP-Mixer.

Capability parity with reference `passl_v110/modeling/backbones/
mlp_mixer.py`: token-mixing + channel-mixing MLP blocks over patch
tokens, s/b/l variants.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import Mlp, PatchEmbed
from .base import MODELS, Model, register_model


class MixerBlock(nn.Module):
    tokens_dim: int
    channels_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = y.transpose(0, 2, 1)
        y = Mlp(hidden_features=self.tokens_dim, dtype=self.dtype, name="token_mlp")(y, deterministic)
        x = x + y.transpose(0, 2, 1)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=self.channels_dim, dtype=self.dtype, name="channel_mlp")(y, deterministic)
        return x + y


@register_model
class MlpMixer(Model):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    tokens_mlp_dim: int = 384
    channels_mlp_dim: int = 3072
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       dtype=self.dtype, name="patch_embed")(x)
        for i in range(self.depth):
            x = MixerBlock(self.tokens_mlp_dim, self.channels_mlp_dim, self.dtype,
                           name=f"blocks_{i}")(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x, axis=1)
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros, name="head")(x)
        return x


for _name, _cfg in {
    "mixer_s16_224": dict(embed_dim=512, depth=8, tokens_mlp_dim=256, channels_mlp_dim=2048),
    "mixer_b16_224": dict(embed_dim=768, depth=12, tokens_mlp_dim=384, channels_mlp_dim=3072),
    "mixer_l16_224": dict(embed_dim=1024, depth=24, tokens_mlp_dim=512, channels_mlp_dim=4096),
}.items():
    def _make(cfg=_cfg):
        def factory(**kw):
            merged = dict(cfg)
            merged.update(kw)
            return MlpMixer(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)
