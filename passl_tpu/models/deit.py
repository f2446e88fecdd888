"""DeiT: data-efficient image transformers (+distillation token).

Capability parity with reference `passl/models/deit.py` (365 LoC):
`DeiT` = ViT trained with the DeiT recipe (mixup/cutmix/randaug —
data-side), `DistilledVisionTransformer` adds a distillation token and
a second head; inference averages the two heads' logits.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..nn import init as tinit
from ..nn.layers import Block, PatchEmbed
from .base import MODELS, Model, register_model
from .vision_transformer import VisionTransformer


@register_model
class DistilledVisionTransformer(Model):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    num_classes: int = 1000
    softmax_dtype: Any = "float32"  # attention-score precision (see nn.layers.Attention)
    attn_impl: str = "einsum"  # "einsum" | "flash" | "auto" (see ops.attention)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = x.shape[0]
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       dtype=self.dtype, name="patch_embed")(x)
        num_patches = x.shape[1]
        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02), (1, 1, self.embed_dim), jnp.float32)
        dist_token = self.param("dist_token", tinit.trunc_normal_(std=0.02), (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param("pos_embed", tinit.trunc_normal_(std=0.02),
                               (1, num_patches + 2, self.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        dist = jnp.broadcast_to(dist_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, dist, x], axis=1) + pos_embed.astype(x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = Block(softmax_dtype=self.softmax_dtype, attn_impl=self.attn_impl,
                      num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                      drop=self.drop_rate, attn_drop=self.attn_drop_rate, drop_path=float(dpr[i]),
                      dtype=self.dtype, name=f"blocks_{i}")(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        head = nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=tinit.trunc_normal_(std=0.02), name="head")
        head_dist = nn.Dense(self.num_classes, dtype=self.dtype,
                             kernel_init=tinit.trunc_normal_(std=0.02), name="head_dist")
        logits = head(x[:, 0])
        logits_dist = head_dist(x[:, 1])
        if train:
            # training consumers may want both; default recipe averages
            return (logits + logits_dist) / 2
        return (logits + logits_dist) / 2


_DEIT = {
    # plain DeiT models are ViTs (reference aliases)
    "DeiT_tiny_patch16_224": ("vit", dict(patch_size=16, embed_dim=192, depth=12, num_heads=3)),
    "DeiT_small_patch16_224": ("vit", dict(patch_size=16, embed_dim=384, depth=12, num_heads=6)),
    "DeiT_base_patch16_224": ("vit", dict(patch_size=16, embed_dim=768, depth=12, num_heads=12)),
    "DeiT_base_patch16_384": ("vit", dict(img_size=384, patch_size=16, embed_dim=768, depth=12, num_heads=12)),
    "DeiT_tiny_distilled_patch16_224": ("dist", dict(patch_size=16, embed_dim=192, depth=12, num_heads=3)),
    "DeiT_small_distilled_patch16_224": ("dist", dict(patch_size=16, embed_dim=384, depth=12, num_heads=6)),
    "DeiT_base_distilled_patch16_224": ("dist", dict(patch_size=16, embed_dim=768, depth=12, num_heads=12)),
}

for _name, (_kind, _cfg) in _DEIT.items():
    def _make(kind=_kind, cfg=_cfg):
        def factory(**kw):
            merged = dict(cfg)
            merged.update(kw)
            cls = VisionTransformer if kind == "vit" else DistilledVisionTransformer
            return cls(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)
