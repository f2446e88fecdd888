"""CaiT: class-attention in image transformers.

Capability parity with reference `passl/models/cait.py` (613 LoC):
talking-heads self-attention (linear mixing of attention maps before
and after softmax), LayerScale on both branches, self-attention stage
over patch tokens followed by class-attention blocks where only the
cls token queries, variants cait_xxs24/xs24/s24/s36 etc.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import init as tinit
from ..nn.layers import DropPath, Mlp, PatchEmbed
from ..ops.attention import _tpu_backend
from ..ops.pallas.talking_heads import talking_heads_softmax
from .base import MODELS, Model, register_model


def resolve_th_impl(impl: str) -> str:
    """`fused` = Pallas single-pass mix/softmax/mix (TPU only);
    `einsum` = three XLA ops; `auto` = fused on TPU, einsum elsewhere."""
    if impl not in ("einsum", "fused", "auto"):
        raise ValueError(f"unknown th_impl {impl!r}")
    if impl == "auto":
        return "fused" if _tpu_backend() else "einsum"
    if impl == "fused" and not _tpu_backend():
        # mirror resolve_attn_impl: an explicit request on the wrong
        # backend downgrades loudly instead of dying deep in pallas_call
        # with an opaque Mosaic error (trace-time only: once per compile)
        import warnings

        warnings.warn("th_impl=fused requires a TPU backend; falling back "
                      "to einsum", stacklevel=2)
        return "einsum"
    return impl


class TalkingHeadAttention(nn.Module):
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32  # score/head-mix/softmax precision
    th_impl: str = "auto"  # fused pallas vs 3-op XLA chain (see resolve_th_impl)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, l, c = x.shape
        h = self.num_heads
        head_dim = c // h
        scale = head_dim**-0.5
        acc = jnp.dtype(self.softmax_dtype) if isinstance(self.softmax_dtype, str) else self.softmax_dtype
        qkv = nn.Dense(3 * c, dtype=self.dtype, kernel_init=tinit.trunc_normal_(std=0.02), name="qkv")(x)
        qkv = qkv.reshape(n, l, 3, h, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        proj_l = self.param("proj_l", tinit.trunc_normal_(std=0.02), (h, h), jnp.float32)
        proj_w = self.param("proj_w", tinit.trunc_normal_(std=0.02), (h, h), jnp.float32)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k, preferred_element_type=acc)
        if resolve_th_impl(self.th_impl) == "fused":
            attn = talking_heads_softmax(attn, proj_l, proj_w)
        else:
            # talking heads: mix across heads pre-softmax
            attn = jnp.einsum("nhqk,hg->ngqk", attn, proj_l.astype(acc))
            attn = jax.nn.softmax(attn, axis=-1)
            attn = jnp.einsum("nhqk,hg->ngqk", attn, proj_w.astype(acc))
        attn = nn.Dropout(self.attn_drop)(attn.astype(self.dtype), deterministic=deterministic)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, l, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=tinit.trunc_normal_(std=0.02), name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class ClassAttention(nn.Module):
    """Only the cls token forms queries (reference ClassAttn)."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, l, c = x.shape
        h = self.num_heads
        head_dim = c // h
        scale = head_dim**-0.5
        q = nn.Dense(c, dtype=self.dtype, name="q")(x[:, :1]).reshape(n, 1, h, head_dim)
        k = nn.Dense(c, dtype=self.dtype, name="k")(x).reshape(n, l, h, head_dim)
        v = nn.Dense(c, dtype=self.dtype, name="v")(x).reshape(n, l, h, head_dim)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, 1, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class CaiTSABlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1e-4
    drop_path: float = 0.0
    dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    th_impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        g1 = self.param("gamma_1", tinit.constant_(self.init_values), (c,), jnp.float32)
        g2 = self.param("gamma_2", tinit.constant_(self.init_values), (c,), jnp.float32)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = TalkingHeadAttention(self.num_heads, dtype=self.dtype,
                                 softmax_dtype=self.softmax_dtype,
                                 th_impl=self.th_impl, name="attn")(y, deterministic)
        x = x + DropPath(self.drop_path, name="dp1")(y * g1, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path, name="dp2")(y * g2, deterministic=deterministic)


class CaiTCABlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1e-4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_cls, x_patches, deterministic: bool = True):
        c = x_cls.shape[-1]
        g1 = self.param("gamma_1", tinit.constant_(self.init_values), (c,), jnp.float32)
        g2 = self.param("gamma_2", tinit.constant_(self.init_values), (c,), jnp.float32)
        u = jnp.concatenate([x_cls, x_patches], axis=1)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(u)
        y = ClassAttention(self.num_heads, dtype=self.dtype, name="attn")(y, deterministic)
        x_cls = x_cls + y * g1
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x_cls)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, deterministic)
        return x_cls + y * g2


@register_model
class CaiT(Model):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 24
    num_heads: int = 8
    depth_token_only: int = 2
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    drop_path_rate: float = 0.0
    num_classes: int = 1000
    softmax_dtype: Any = "float32"  # attention-score precision
    th_impl: str = "auto"  # talking-heads impl: fused pallas | einsum | auto
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = x.shape[0]
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       dtype=self.dtype, name="patch_embed")(x)
        num_patches = x.shape[1]
        pos_embed = self.param("pos_embed", tinit.trunc_normal_(std=0.02),
                               (1, num_patches, self.embed_dim), jnp.float32)
        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                               (1, 1, self.embed_dim), jnp.float32)
        x = x + pos_embed.astype(x.dtype)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = CaiTSABlock(self.num_heads, self.mlp_ratio, self.init_values, float(dpr[i]),
                            self.dtype, self.softmax_dtype, self.th_impl,
                            name=f"blocks_{i}")(x, deterministic=not train)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        for i in range(self.depth_token_only):
            cls = CaiTCABlock(self.num_heads, self.mlp_ratio, self.init_values,
                              self.dtype, name=f"blocks_token_only_{i}")(cls, x, deterministic=not train)
        x = jnp.concatenate([cls, x], axis=1)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        feats = x[:, 0]
        if self.num_classes > 0:
            feats = nn.Dense(self.num_classes, dtype=self.dtype,
                             kernel_init=tinit.trunc_normal_(std=0.02), name="head")(feats)
        return feats


_CAIT = {
    "cait_xxs24_224": dict(embed_dim=192, depth=24, num_heads=4, init_values=1e-5),
    "cait_xs24_384": dict(img_size=384, embed_dim=288, depth=24, num_heads=6, init_values=1e-5),
    "cait_s24_224": dict(embed_dim=384, depth=24, num_heads=8, init_values=1e-5),
    "cait_s24_384": dict(img_size=384, embed_dim=384, depth=24, num_heads=8, init_values=1e-5),
    "cait_s36_384": dict(img_size=384, embed_dim=384, depth=36, num_heads=8, init_values=1e-6),
    "cait_m36_384": dict(img_size=384, embed_dim=768, depth=36, num_heads=16, init_values=1e-6),
    "cait_m48_448": dict(img_size=448, embed_dim=768, depth=48, num_heads=16, init_values=1e-6),
}

for _name, _cfg in _CAIT.items():
    def _make(cfg=_cfg):
        def factory(**kw):
            merged = dict(cfg)
            merged.update(kw)
            return CaiT(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)
