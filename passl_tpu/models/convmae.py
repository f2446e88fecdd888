"""ConvMAE: convolution-stem masked autoencoder.

Capability parity with reference `passl/models/convmae/conv_mae.py`
(`MaskedAutoencoderConvViT:32-330`) and `conv_vit.py` (CBlock/CMlp/
CPatchEmbed + ConvViT finetune model): 3-stage encoder (two conv
stages with *masked* depthwise-conv blocks so masked patches never
leak, then a transformer stage on visible tokens), stage-1/2 outputs
strided-conv-decoded to stage-3 resolution and added residually,
MAE-style decoder + norm-pix loss.

The reference upsamples the 14x14 stage-3 mask to 56/28 grids with a
reshape/transpose dance (conv_mae.py:240-246); NHWC-native this is a
nearest-neighbor `jnp.repeat` on both spatial axes.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import init as tinit
from ..nn.layers import Block, DropPath
from .base import Model, register_model
from .mae import patchify
from .utils.pos_embed import get_2d_sincos_pos_embed


class CMlp(nn.Module):
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(x)


class CBlock(nn.Module):
    """Conv block with mask-gated token mixing (reference CBlock:55-100):
    x += dp(conv2(dwconv(mask ⊙ conv1(ln(x))))); x += dp(cmlp(ln(x)))."""

    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, vis_mask=None, train: bool = True):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv1")(y)
        if vis_mask is not None:
            y = y * vis_mask  # zero masked patches before spatial mixing
        y = nn.Conv(c, (5, 5), padding=2, feature_group_count=c, dtype=self.dtype, name="attn")(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv2")(y)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic=not train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = CMlp(4 * c, self.dtype, name="mlp")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, deterministic=not train)


@register_model
class MaskedAutoencoderConvViT(Model):
    img_size: int = 224
    patch_sizes: Sequence[int] = (4, 2, 2)
    embed_dims: Sequence[int] = (256, 384, 768)
    depths: Sequence[int] = (2, 2, 11)
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    mask_ratio: float = 0.75
    norm_pix_loss: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, train: bool = True):
        imgs = batch[0] if isinstance(batch, (tuple, list)) else batch
        n = imgs.shape[0]
        p1, p2, p3 = self.patch_sizes
        total_patch = p1 * p2 * p3  # stage-3 patch size in pixels (16)
        g3 = self.img_size // total_patch  # final grid (14)
        l3 = g3 * g3

        # mask decided on the stage-3 grid (argsort-of-noise, as in MAE)
        rng = self.make_rng("masking") if train else jax.random.PRNGKey(0)
        len_keep = int(l3 * (1 - self.mask_ratio))
        noise = jax.random.uniform(rng, (n, l3))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        mask = jnp.ones((n, l3), jnp.float32).at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)

        vis3 = (1.0 - mask).reshape(n, g3, g3, 1)
        vis1 = jnp.repeat(jnp.repeat(vis3, p2 * p3, axis=1), p2 * p3, axis=2)
        vis2 = jnp.repeat(jnp.repeat(vis3, p3, axis=1), p3, axis=2)

        x = nn.Conv(self.embed_dims[0], (p1, p1), strides=(p1, p1), padding="VALID",
                    dtype=self.dtype, name="patch_embed1")(imgs)
        for i in range(self.depths[0]):
            x = CBlock(dtype=self.dtype, name=f"blocks1_{i}")(x, vis1.astype(x.dtype), train=train)
        s1 = nn.Conv(self.embed_dims[2], (p2 * p3, p2 * p3), strides=(p2 * p3, p2 * p3),
                     padding="VALID", dtype=self.dtype, name="stage1_output_decode")(x)
        s1 = s1.reshape(n, l3, self.embed_dims[2])

        x = nn.Conv(self.embed_dims[1], (p2, p2), strides=(p2, p2), padding="VALID",
                    dtype=self.dtype, name="patch_embed2")(x)
        for i in range(self.depths[1]):
            x = CBlock(dtype=self.dtype, name=f"blocks2_{i}")(x, vis2.astype(x.dtype), train=train)
        s2 = nn.Conv(self.embed_dims[2], (p3, p3), strides=(p3, p3), padding="VALID",
                     dtype=self.dtype, name="stage2_output_decode")(x)
        s2 = s2.reshape(n, l3, self.embed_dims[2])

        x = nn.Conv(self.embed_dims[2], (p3, p3), strides=(p3, p3), padding="VALID",
                    dtype=self.dtype, name="patch_embed3")(x)
        x = x.reshape(n, l3, self.embed_dims[2])
        x = nn.Dense(self.embed_dims[2], dtype=self.dtype, name="patch_embed4")(x)
        pos = jnp.asarray(get_2d_sincos_pos_embed(self.embed_dims[2], g3))[None]
        x = x + pos.astype(x.dtype)
        x = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        s1 = jnp.take_along_axis(s1, ids_keep[:, :, None], axis=1)
        s2 = jnp.take_along_axis(s2, ids_keep[:, :, None], axis=1)
        for i in range(self.depths[2]):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                      dtype=self.dtype, name=f"blocks3_{i}")(x, deterministic=not train)
        x = x + s1 + s2
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        # ---------- decoder (no cls token, reference forward_decoder)
        x = nn.Dense(self.decoder_embed_dim, dtype=self.dtype, name="decoder_embed")(x)
        mask_token = self.param("mask_token", tinit.normal_(std=0.02),
                                (1, 1, self.decoder_embed_dim), jnp.float32)
        mts = jnp.broadcast_to(mask_token.astype(x.dtype), (n, l3 - x.shape[1], self.decoder_embed_dim))
        x_ = jnp.concatenate([x, mts], axis=1)
        x = jnp.take_along_axis(x_, ids_restore[:, :, None].astype(jnp.int32), axis=1)
        dpos = jnp.asarray(get_2d_sincos_pos_embed(self.decoder_embed_dim, g3))[None]
        x = x + dpos.astype(x.dtype)
        for i in range(self.decoder_depth):
            x = Block(num_heads=self.decoder_num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                      dtype=self.dtype, name=f"decoder_blocks_{i}")(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="decoder_norm")(x)
        pred = nn.Dense(total_patch * total_patch * 3, dtype=self.dtype, name="decoder_pred")(x)

        target = patchify(imgs.astype(jnp.float32), total_patch)
        if self.norm_pix_loss:
            mean = jnp.mean(target, axis=-1, keepdims=True)
            var = jnp.var(target, axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - target), axis=-1)
        loss = jnp.sum(loss * mask) / jnp.sum(mask)
        return {"loss": loss}


@register_model
class ConvViT(Model):
    """ConvMAE's finetune/linear-probe backbone (reference conv_vit.py):
    the 3-stage encoder over the full image + pooled head."""

    img_size: int = 224
    patch_sizes: Sequence[int] = (4, 2, 2)
    embed_dims: Sequence[int] = (256, 384, 768)
    depths: Sequence[int] = (2, 2, 11)
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    num_classes: int = 1000
    global_pool: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = x.shape[0]
        p1, p2, p3 = self.patch_sizes
        g3 = self.img_size // (p1 * p2 * p3)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        x = nn.Conv(self.embed_dims[0], (p1, p1), strides=(p1, p1), padding="VALID",
                    dtype=self.dtype, name="patch_embed1")(x)
        for i in range(self.depths[0]):
            x = CBlock(float(dpr[cur]), self.dtype, name=f"blocks1_{i}")(x, None, train=train)
            cur += 1
        x = nn.Conv(self.embed_dims[1], (p2, p2), strides=(p2, p2), padding="VALID",
                    dtype=self.dtype, name="patch_embed2")(x)
        for i in range(self.depths[1]):
            x = CBlock(float(dpr[cur]), self.dtype, name=f"blocks2_{i}")(x, None, train=train)
            cur += 1
        x = nn.Conv(self.embed_dims[2], (p3, p3), strides=(p3, p3), padding="VALID",
                    dtype=self.dtype, name="patch_embed3")(x)
        x = x.reshape(n, g3 * g3, self.embed_dims[2])
        x = nn.Dense(self.embed_dims[2], dtype=self.dtype, name="patch_embed4")(x)
        pos = jnp.asarray(get_2d_sincos_pos_embed(self.embed_dims[2], g3))[None]
        x = x + pos.astype(x.dtype)
        for i in range(self.depths[2]):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                      drop_path=float(dpr[cur]), dtype=self.dtype,
                      name=f"blocks3_{i}")(x, deterministic=not train)
            cur += 1
        if self.global_pool:
            x = jnp.mean(x, axis=1)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="fc_norm")(x)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)[:, 0]
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype,
                         kernel_init=tinit.trunc_normal_(std=0.02), name="head")(x)
        return x


def _register(name, cls, **defaults):
    from .base import MODELS

    def factory(**kw):
        merged = dict(defaults)
        merged.update(kw)
        return cls(**merged)

    factory.__name__ = name
    MODELS.register(factory, name=name)


_register("convmae_convvit_base_patch16", MaskedAutoencoderConvViT,
          embed_dims=(256, 384, 768), depths=(2, 2, 11), num_heads=12,
          decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16)
_register("convvit_base_patch16", ConvViT,
          embed_dims=(256, 384, 768), depths=(2, 2, 11), num_heads=12)
