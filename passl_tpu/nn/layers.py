"""Shared NN building blocks (transformer + conv families).

TPU-first conventions: NHWC image layout, bf16-friendly compute dtype
threaded via `dtype`, params kept fp32. Blocks mirror the behavioral
surface of reference `passl/models/vision_transformer.py` (Mlp,
DropPath, PatchEmbed, Attention, Block) without translating its code.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import einsum_attention, multi_head_attention, resolve_attn_impl
from . import init as tinit

Dtype = Any


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return x


class DropPath(nn.Module):
    """Stochastic depth per sample (reference vision_transformer.py DropPath)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    act: Callable = nn.gelu
    drop: float = 0.0
    dtype: Dtype = jnp.float32
    kernel_init: Callable = tinit.xavier_uniform_()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_features = x.shape[-1]
        hidden = self.hidden_features or in_features
        out = self.out_features or in_features
        x = nn.Dense(hidden, dtype=self.dtype, kernel_init=self.kernel_init, bias_init=self.bias_init, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out, dtype=self.dtype, kernel_init=self.kernel_init, bias_init=self.bias_init, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class PatchEmbed(nn.Module):
    """Image → patch tokens via strided conv. Input NHWC."""

    patch_size: int = 16
    embed_dim: int = 768
    dtype: Dtype = jnp.float32
    kernel_init: Callable = tinit.xavier_uniform_()
    use_bias: bool = True
    flatten: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="proj",
        )(x)
        if self.flatten:
            n, h, w, c = x.shape
            x = x.reshape(n, h * w, c)
        return x


class Attention(nn.Module):
    """Multi-head self-attention, fused-QKV, MXU-friendly einsums."""

    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    softmax_dtype: Dtype = jnp.float32  # score/softmax precision; bf16 matches fp16-O2 recipes
    attn_impl: str = "einsum"  # "einsum" | "flash" (pallas) | "auto"
    kernel_init: Callable = tinit.xavier_uniform_()

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, l, c = x.shape
        h = self.num_heads
        head_dim = c // h
        scale = self.qk_scale or head_dim**-0.5
        acc = jnp.dtype(self.softmax_dtype) if isinstance(self.softmax_dtype, str) else self.softmax_dtype
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, kernel_init=self.kernel_init, name="qkv")(x)
        qkv = qkv.reshape(n, l, 3, h, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [n, l, h, d]
        impl = resolve_attn_impl(self.attn_impl, l, self.attn_drop, deterministic)
        if impl == "flash":
            out = multi_head_attention(q, k, v, scale, impl="flash",
                                       out_dtype=self.dtype)
        elif self.attn_drop > 0.0 and not deterministic:
            # dropout on the attention probs needs the materialized scores
            attn = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k, preferred_element_type=acc)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, l, c)
        else:
            out = einsum_attention(q, k, v, scale, acc, self.dtype)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=self.kernel_init, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-norm transformer block (reference Block)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    init_values: Optional[float] = None  # LayerScale (CaiT/DINOv2)
    act: Callable = nn.gelu
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    softmax_dtype: Dtype = jnp.float32
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        y = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            softmax_dtype=self.softmax_dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )(y, deterministic=deterministic)
        if self.init_values is not None:
            gamma1 = self.param("gamma_1", tinit.constant_(self.init_values), (dim,), jnp.float32)
            y = y * gamma1
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            hidden_features=int(dim * self.mlp_ratio),
            act=self.act,
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        if self.init_values is not None:
            gamma2 = self.param("gamma_2", tinit.constant_(self.init_values), (dim,), jnp.float32)
            y = y * gamma2
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic=deterministic)
        return x
