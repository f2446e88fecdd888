"""CvT: convolutional vision transformer.

Capability parity with reference `passl_v110/modeling/backbones/cvt.py`:
3-stage pyramid with overlapping conv token embeddings and attention
whose q/k/v projections are depthwise convs (k/v strided for
efficiency); cls token only in the last stage.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import init as tinit
from ..nn.layers import DropPath, Mlp
from .base import MODELS, Model, register_model


class ConvAttention(nn.Module):
    num_heads: int
    grid: Any  # (h, w)
    kv_stride: int = 2
    with_cls: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, l, c = x.shape
        h, w = self.grid
        heads = self.num_heads
        d = c // heads
        if self.with_cls:
            cls, tok = x[:, :1], x[:, 1:]
        else:
            cls, tok = None, x
        grid_x = tok.reshape(n, h, w, c)

        def conv_proj(inp, stride, name):
            y = nn.Conv(c, (3, 3), strides=(stride, stride), padding=1,
                        feature_group_count=c, use_bias=False, dtype=self.dtype,
                        name=f"{name}_dw")(inp)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"{name}_ln")(y)
            return y.reshape(n, -1, c)

        q_t = conv_proj(grid_x, 1, "q")
        k_t = conv_proj(grid_x, self.kv_stride, "k")
        v_t = conv_proj(grid_x, self.kv_stride, "v")
        if cls is not None:
            q_t = jnp.concatenate([cls, q_t], axis=1)
            k_t = jnp.concatenate([cls, k_t], axis=1)
            v_t = jnp.concatenate([cls, v_t], axis=1)
        q = nn.Dense(c, dtype=self.dtype, name="proj_q")(q_t).reshape(n, -1, heads, d)
        k = nn.Dense(c, dtype=self.dtype, name="proj_k")(k_t).reshape(n, -1, heads, d)
        v = nn.Dense(c, dtype=self.dtype, name="proj_v")(v_t).reshape(n, -1, heads, d)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * d**-0.5, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, -1, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class CvTBlock(nn.Module):
    num_heads: int
    grid: Any
    kv_stride: int = 2
    with_cls: bool = False
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = ConvAttention(self.num_heads, self.grid, self.kv_stride, self.with_cls,
                          self.dtype, name="attn")(y, deterministic)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path, name="dp2")(y, deterministic=deterministic)


@register_model
class CvT(Model):
    embed_dims: Sequence[int] = (64, 192, 384)
    depths: Sequence[int] = (1, 2, 10)
    num_heads: Sequence[int] = (1, 3, 6)
    patch_sizes: Sequence[int] = (7, 3, 3)
    patch_strides: Sequence[int] = (4, 2, 2)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = x.shape[0]
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        cls = None
        for s in range(3):
            p, st = self.patch_sizes[s], self.patch_strides[s]
            x = nn.Conv(self.embed_dims[s], (p, p), strides=(st, st), padding=p // 2,
                        dtype=self.dtype, name=f"stage{s}_embed")(x)
            h, w = x.shape[1], x.shape[2]
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"stage{s}_ln")(x)
            x = x.reshape(n, h * w, self.embed_dims[s])
            with_cls = s == 2
            if with_cls:
                cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                                       (1, 1, self.embed_dims[s]), jnp.float32)
                x = jnp.concatenate(
                    [jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dims[s])), x], axis=1)
            for b in range(self.depths[s]):
                x = CvTBlock(self.num_heads[s], (h, w), 2, with_cls, 4.0,
                             float(dpr[cur]), self.dtype,
                             name=f"stage{s}_block{b}")(x, deterministic=not train)
                cur += 1
            if with_cls:
                cls, x = x[:, 0], x[:, 1:]
            x = x.reshape(n, h, w, self.embed_dims[s])
        feats = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(cls)
        if self.num_classes > 0:
            feats = nn.Dense(self.num_classes, dtype=self.dtype,
                             kernel_init=tinit.trunc_normal_(std=0.02), name="head")(feats)
        return feats


for _name, _cfg in {
    "CvT_13_224": dict(depths=(1, 2, 10), embed_dims=(64, 192, 384), num_heads=(1, 3, 6)),
    "CvT_21_224": dict(depths=(1, 4, 16), embed_dims=(64, 192, 384), num_heads=(1, 3, 6)),
    # 384 finetune variants (reference configs/cvt/cvt_{13,21}_384.yaml)
    # — conv-stage model, resolution comes from the data pipeline; the
    # aliases keep the reference recipe names resolvable
    "CvT_13_384": dict(depths=(1, 2, 10), embed_dims=(64, 192, 384), num_heads=(1, 3, 6)),
    "CvT_21_384": dict(depths=(1, 4, 16), embed_dims=(64, 192, 384), num_heads=(1, 3, 6)),
    "CvT_W24_384": dict(depths=(2, 2, 20), embed_dims=(192, 768, 1024), num_heads=(3, 12, 16)),
}.items():
    def _make(cfg=_cfg):
        def factory(**kw):
            merged = dict(cfg)
            merged.update(kw)
            return CvT(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)
