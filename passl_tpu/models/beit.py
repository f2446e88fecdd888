"""BEiT: BERT-style pretraining of image transformers.

Capability parity with reference `passl_v110/modeling/backbones/beit.py`
(520 LoC: ViT with per-block relative position bias incl. cls rows,
LayerScale, mask token replacing masked patch embeddings) and
`architectures/BEiTWrapper/PT/FT` + `heads/beit_head.py`:
 - pretrain: a block-masked view's patch embeddings are replaced by a
   learned mask token; the head predicts the dVAE visual-token id of
   each masked patch (CE over vocab 8192); target ids come from a
   frozen DiscreteVAE tokenizer over the second (plain) view
 - finetune: same backbone, pooled head.
Masks are produced host-side by the BEiT MaskingGenerator
(`passl_tpu/data/masking.py`).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import init as tinit
from ..nn.layers import DropPath, Mlp, PatchEmbed
from .base import Model, register_model


def _beit_rel_pos_index(grid: int) -> np.ndarray:
    """Relative position index for grid tokens + cls (reference beit.py):
    table rows [(2g-1)^2] for patch pairs + 3 special rows for
    cls↔patch and cls↔cls."""
    ws = grid
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    num_rel = (2 * ws - 1) ** 2
    idx = np.zeros((ws * ws + 1, ws * ws + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel
    idx[0:, 0] = num_rel + 1
    idx[0, 0] = num_rel + 2
    return idx


class BEiTAttention(nn.Module):
    num_heads: int
    grid: int
    use_rel_pos_bias: bool = True
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, l, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=tinit.trunc_normal_(std=0.02), name="qkv")(x)
        qkv = qkv.reshape(n, l, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * d**-0.5, k, preferred_element_type=jnp.float32)
        if self.use_rel_pos_bias:
            num_rel = (2 * self.grid - 1) ** 2 + 3
            table = self.param("relative_position_bias_table",
                               nn.initializers.zeros, (num_rel, h), jnp.float32)
            idx = jnp.asarray(_beit_rel_pos_index(self.grid).reshape(-1))
            bias = table[idx].reshape(l, l, h).transpose(2, 0, 1)
            attn = attn + bias[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, l, c)
        return nn.Dense(c, dtype=self.dtype, kernel_init=tinit.trunc_normal_(std=0.02), name="proj")(out)


class BEiTBlock(nn.Module):
    num_heads: int
    grid: int
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 0.1
    drop_path: float = 0.0
    use_rel_pos_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = BEiTAttention(self.num_heads, self.grid, self.use_rel_pos_bias,
                          dtype=self.dtype, name="attn")(y, deterministic)
        if self.init_values is not None:
            y = y * self.param("gamma_1", tinit.constant_(self.init_values), (c,), jnp.float32)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, deterministic)
        if self.init_values is not None:
            y = y * self.param("gamma_2", tinit.constant_(self.init_values), (c,), jnp.float32)
        return x + DropPath(self.drop_path, name="dp2")(y, deterministic=deterministic)


class BEiTViT(nn.Module):
    """Shared BEiT encoder (pretrain + finetune)."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 0.1
    drop_path_rate: float = 0.0
    use_rel_pos_bias: bool = True
    use_abs_pos_emb: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bool_mask: Optional[jnp.ndarray] = None, train: bool = True):
        n = x.shape[0]
        grid = self.img_size // self.patch_size
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       dtype=self.dtype, name="patch_embed")(x)
        l = x.shape[1]
        if bool_mask is not None:
            mask_token = self.param("mask_token", tinit.trunc_normal_(std=0.02),
                                    (1, 1, self.embed_dim), jnp.float32)
            m = bool_mask.astype(x.dtype)[:, :, None]
            x = x * (1 - m) + mask_token.astype(x.dtype) * m
        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                               (1, 1, self.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        if self.use_abs_pos_emb:
            pos = self.param("pos_embed", tinit.trunc_normal_(std=0.02),
                             (1, l + 1, self.embed_dim), jnp.float32)
            x = x + pos.astype(x.dtype)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = BEiTBlock(self.num_heads, grid, self.mlp_ratio, self.init_values,
                          float(dpr[i]), self.use_rel_pos_bias, self.dtype,
                          name=f"blocks_{i}")(x, deterministic=not train)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


@register_model
class BEiTPretrain(Model):
    """Masked-token prediction with a frozen dVAE tokenizer.

    batch: (masked_view, tokenizer_view, bool_mask[N, L]) from
    BEiTDataset. Tokenizer params live under `tokenizer/` and are
    frozen (load the pretrained dVAE via Global.pretrained_model)."""

    encoder: Any = None  # BEiTViT kwargs
    tokenizer: Any = None  # DiscreteVAE kwargs
    vocab_size: int = 8192
    dtype: Any = jnp.float32

    @staticmethod
    def frozen_patterns():
        return [r"^tokenizer/"]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        from .discrete_vae import DiscreteVAE

        view, tok_view, bool_mask = batch[0], batch[1], batch[2]
        enc_cfg = dict(self.encoder or {})
        enc = BEiTViT(dtype=self.dtype, name="encoder", **enc_cfg)
        tok = DiscreteVAE(dtype=self.dtype, name="tokenizer",
                          **dict(self.tokenizer or {"vocab_size": self.vocab_size}))
        x = enc(view, bool_mask=bool_mask, train=train)
        logits = nn.Dense(self.vocab_size, dtype=self.dtype,
                          kernel_init=tinit.trunc_normal_(std=0.02), name="head")(x[:, 1:])
        target = jax.lax.stop_gradient(tok.tokenize(tok_view))
        # dVAE grid may be finer than patch grid (/8 vs /16): pool ids
        l = logits.shape[1]
        if target.shape[1] != l:
            g_t = int(target.shape[1] ** 0.5)
            g_l = int(l**0.5)
            s = g_t // g_l
            target = target.reshape(-1, g_l, s, g_l, s)[:, :, 0, :, 0].reshape(-1, l)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, target[:, :, None], axis=-1)[:, :, 0]
        m = bool_mask.astype(jnp.float32)
        loss = jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
        acc = jnp.sum((jnp.argmax(logits, -1) == target) * m) / jnp.maximum(jnp.sum(m), 1.0)
        return {"loss": loss, "acc1": acc}


@register_model
class BEiTFinetune(Model):
    encoder: Any = None
    num_classes: int = 1000
    global_pool: bool = True
    # True = linear probe: freeze the encoder, train only the head
    freeze_encoder: bool = False
    dtype: Any = jnp.float32

    def frozen_patterns(self):
        return [r"^encoder/"] if self.freeze_encoder else []

    @nn.compact
    def __call__(self, x, train: bool = True):
        enc = BEiTViT(dtype=self.dtype, name="encoder", **dict(self.encoder or {}))
        x = enc(x, train=train)
        feats = jnp.mean(x[:, 1:], axis=1) if self.global_pool else x[:, 0]
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=tinit.trunc_normal_(std=0.02), name="head")(feats)


def _register(name, **defaults):
    from .base import MODELS

    def factory(**kw):
        merged = dict(defaults)
        merged.update(kw)
        return BEiTPretrain(**merged)

    factory.__name__ = name
    MODELS.register(factory, name=name)


_register("beit_base_patch16_224_pretrain",
          encoder=dict(embed_dim=768, depth=12, num_heads=12))
_register("beit_large_patch16_224_pretrain",
          encoder=dict(embed_dim=1024, depth=24, num_heads=16))
