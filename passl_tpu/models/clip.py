"""CLIP: contrastive language-image pretraining (dual tower).

Capability parity with reference `passl_v110/modeling/backbones/clip.py`
(`CLIP:185-340`: ViT or ModifiedResNet visual tower, causal text
transformer, token/positional embeddings, ln_final, text_projection,
learnable `logit_scale` init log(1/0.07)) and
`architectures/CLIPWrapper.py:27` + `heads/clip_head.py` (symmetric
cross-entropy over image↔text similarity).

TPU notes: the text tower uses a static causal mask constant; EOT
feature gather is one take_along_axis; the similarity matrix spans the
global batch under jit (reference gathers across ranks).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import init as tinit
from ..nn.norm import l2_normalize
from .base import Model, register_model


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    num_heads: int
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, l, c = x.shape
        h = self.num_heads
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="attn_qkv")(y).reshape(n, l, 3, h, c // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * (c // h) ** -0.5, k,
                          preferred_element_type=jnp.float32)
        if self.causal:
            mask = np.triu(np.full((l, l), -np.inf, np.float32), k=1)
            attn = attn + jnp.asarray(mask)[None, None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        y = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, l, c)
        y = nn.Dense(c, dtype=self.dtype, name="attn_out")(y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * c, dtype=self.dtype, name="mlp_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


class CLIPVisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 32
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    out_dim: int = 512
    patch_bias: bool = False
    pre_norm: bool = True
    proj: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.width, (p, p), strides=(p, p), padding="VALID",
                    use_bias=self.patch_bias, dtype=self.dtype, name="conv1")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.width)
        scale = self.width**-0.5
        cls = self.param("class_embedding", tinit.normal_(std=scale), (self.width,), jnp.float32)
        pos = self.param("positional_embedding", tinit.normal_(std=scale),
                         (gh * gw + 1, self.width), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(x.dtype)[None, None], (n, 1, self.width))
        x = jnp.concatenate([cls, x], axis=1) + pos.astype(x.dtype)[None]
        if self.pre_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.depth):
            x = ResidualAttentionBlock(self.num_heads, dtype=self.dtype,
                                       name=f"resblocks_{i}")(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        if self.proj:
            w = self.param("proj", tinit.normal_(std=scale), (self.width, self.out_dim), jnp.float32)
            x = x @ w.astype(x.dtype)
        return x


class AttentionPool2d(nn.Module):
    """Query = mean token; learned spatial pos embedding (reference
    ModifiedResNet's pool)."""

    num_heads: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [N, H, W, C]
        n, h, w, c = x.shape
        x = x.reshape(n, h * w, c)
        x = jnp.concatenate([jnp.mean(x, axis=1, keepdims=True), x], axis=1)
        pos = self.param("positional_embedding", tinit.normal_(std=c**-0.5),
                         (h * w + 1, c), jnp.float32)
        x = x + pos.astype(x.dtype)[None]
        hn = self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x[:, :1]).reshape(n, 1, hn, c // hn)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x).reshape(n, -1, hn, c // hn)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x).reshape(n, -1, hn, c // hn)
        attn = jax.nn.softmax(
            jnp.einsum("nqhd,nkhd->nhqk", q * (c // hn) ** -0.5, k,
                       preferred_element_type=jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, c)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    """CLIP's ResNet: 3-conv stem, avg-pool antialiased downsampling,
    attention-pool head (reference clip.py:88-167)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    out_dim: int = 512
    num_heads: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = lambda f, k, s, name: nn.Conv(f, (k, k), strides=(s, s), padding=k // 2,
                                             use_bias=False, dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype, name=name)
        x = nn.relu(bn("bn1")(conv(self.width // 2, 3, 2, "conv1")(x)))
        x = nn.relu(bn("bn2")(conv(self.width // 2, 3, 1, "conv2")(x)))
        x = nn.relu(bn("bn3")(conv(self.width, 3, 1, "conv3")(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        def bottleneck(x, filters, stride, name):
            inp = x
            x = nn.relu(bn(f"{name}_bn1")(conv(filters, 1, 1, f"{name}_conv1")(x)))
            x = nn.relu(bn(f"{name}_bn2")(conv(filters, 3, 1, f"{name}_conv2")(x)))
            if stride > 1:
                x = nn.avg_pool(x, (stride, stride), strides=(stride, stride))
            x = bn(f"{name}_bn3")(conv(filters * 4, 1, 1, f"{name}_conv3")(x))
            if stride > 1 or inp.shape[-1] != filters * 4:
                if stride > 1:
                    inp = nn.avg_pool(inp, (stride, stride), strides=(stride, stride))
                inp = bn(f"{name}_bn_down")(conv(filters * 4, 1, 1, f"{name}_conv_down")(inp))
            return nn.relu(x + inp)

        filters = self.width
        for i, nblocks in enumerate(self.layers):
            for j in range(nblocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = bottleneck(x, filters, stride, f"layer{i + 1}_{j}")
            filters *= 2
        return AttentionPool2d(self.num_heads, self.out_dim, self.dtype, name="attnpool")(x)


@register_model
class CLIP(Model):
    embed_dim: int = 512
    # vision
    image_resolution: int = 224
    vision_layers: Any = 12  # int (ViT) or tuple (ModifiedResNet)
    vision_width: int = 768
    vision_patch_size: int = 32
    pre_norm: bool = True
    proj: bool = True
    patch_bias: bool = False
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    dtype: Any = jnp.float32

    def setup(self):
        if isinstance(self.vision_layers, (tuple, list)):
            self.visual = ModifiedResNet(
                layers=tuple(self.vision_layers), width=self.vision_width,
                out_dim=self.embed_dim, num_heads=self.vision_width * 32 // 64,
                dtype=self.dtype, name="visual")
        else:
            self.visual = CLIPVisionTransformer(
                img_size=self.image_resolution, patch_size=self.vision_patch_size,
                width=self.vision_width, depth=int(self.vision_layers),
                num_heads=max(1, self.vision_width // 64), out_dim=self.embed_dim,
                patch_bias=self.patch_bias, pre_norm=self.pre_norm, proj=self.proj,
                dtype=self.dtype, name="visual")
        self.token_embedding = nn.Embed(self.vocab_size, self.transformer_width,
                                        embedding_init=tinit.normal_(std=0.02),
                                        dtype=self.dtype, name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", tinit.normal_(std=0.01),
            (self.context_length, self.transformer_width), jnp.float32)
        self.resblocks = [
            ResidualAttentionBlock(self.transformer_heads, causal=True, dtype=self.dtype,
                                   name=f"transformer_resblocks_{i}")
            for i in range(self.transformer_layers)
        ]
        self.ln_final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")
        self.text_projection = self.param(
            "text_projection", tinit.normal_(std=self.transformer_width**-0.5),
            (self.transformer_width, self.embed_dim), jnp.float32)
        self.logit_scale = self.param("logit_scale", tinit.constant_(math.log(1 / 0.07)),
                                      (1,), jnp.float32)

    def encode_image(self, image, train: bool = False):
        return self.visual(image, train=train)

    def encode_text(self, text, train: bool = False):
        x = self.token_embedding(text)
        x = x + self.positional_embedding.astype(x.dtype)[None]
        for blk in self.resblocks:
            x = blk(x, deterministic=not train)
        x = self.ln_final(x)
        # features at the EOT token (= argmax token id per sequence)
        eot = jnp.argmax(text, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return x @ self.text_projection.astype(x.dtype)

    def __call__(self, batch, train: bool = True):
        if isinstance(batch, dict):
            image, text = batch["image"], batch["text"]
        else:
            image, text = batch
        img_f = l2_normalize(self.encode_image(image, train=train).astype(jnp.float32), axis=-1)
        txt_f = l2_normalize(self.encode_text(text, train=train).astype(jnp.float32), axis=-1)
        scale = jnp.exp(jnp.clip(self.logit_scale, max=math.log(100.0)))
        logits_i = scale * img_f @ txt_f.T
        logits_t = logits_i.T
        n = logits_i.shape[0]
        labels = jnp.arange(n)

        def ce(logits):
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

        loss = 0.5 * (ce(logits_i) + ce(logits_t))
        acc = jnp.mean((jnp.argmax(logits_i, axis=-1) == labels).astype(jnp.float32))
        if not train:
            return logits_i
        return {"loss": loss, "acc1": acc, "logit_scale": scale[0]}


_CLIP_VARIANTS = {
    "CLIP_vit_base_patch32_224": dict(embed_dim=512, vision_layers=12, vision_width=768,
                                      vision_patch_size=32),
    "CLIP_vit_base_patch16_224": dict(embed_dim=512, vision_layers=12, vision_width=768,
                                      vision_patch_size=16),
    "CLIP_r50": dict(embed_dim=1024, vision_layers=(3, 4, 6, 3), vision_width=64),
}

from .base import MODELS  # noqa: E402

for _name, _cfg in _CLIP_VARIANTS.items():
    def _make(cfg=_cfg):
        def factory(**kw):
            merged = dict(cfg)
            merged.update(kw)
            return CLIP(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)
