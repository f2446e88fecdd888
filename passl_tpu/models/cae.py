"""CAE: context autoencoder pretraining.

Capability parity with reference `passl/models/cae.py` (1457 LoC):
 - `CAEEncoder`: ViT over *visible* patches only (masked-out patches
   never enter the encoder)
 - `CAERegressorDecoder`: cross-attention latent regressor — mask
   queries (mask token + pos embed of masked positions) attend to the
   visible latents to predict the masked-patch latents
 - alignment loss: MSE between regressed latents and the same encoder
   applied to the FULL image with stop-grad (the reference maintains a
   per-step teacher copy of the encoder, cae.py:833-900 — with copy
   momentum 0 this is exactly a stop-grad dual path, which is how the
   functional version expresses it)
 - token loss: CE of dVAE visual-token ids at masked positions
   (targets from the frozen DiscreteVAE tokenizer, tasks/ssl/cae/dall_e)

Static shapes: the host mask generator produces a fixed number of
masked patches; visible/masked index sets come from one argsort.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn import init as tinit
from ..nn.layers import Block, Mlp, PatchEmbed
from .base import Model, register_model
from .utils.pos_embed import get_2d_sincos_pos_embed


class CrossAttentionBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, kv_tokens, deterministic: bool = True):
        c = q_tokens.shape[-1]
        h = self.num_heads
        d = c // h
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_q")(q_tokens)
        kv = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_kv")(kv_tokens)
        q = nn.Dense(c, dtype=self.dtype, name="q")(y).reshape(*y.shape[:2], h, d)
        k = nn.Dense(c, dtype=self.dtype, name="k")(kv).reshape(*kv.shape[:2], h, d)
        v = nn.Dense(c, dtype=self.dtype, name="v")(kv).reshape(*kv.shape[:2], h, d)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * d**-0.5, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(q_tokens.shape)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        x = q_tokens + out
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, deterministic)
        return x + y


@register_model
class CAEPretrain(Model):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    regressor_depth: int = 4
    mlp_ratio: float = 4.0
    vocab_size: int = 8192
    tokenizer: Any = None  # DiscreteVAE kwargs
    align_weight: float = 2.0  # reference dual-loss weighting
    token_weight: float = 1.0  # diagnostic knob: 0 = alignment-only tower
    num_masked: int = 98  # must match the host mask generator
    dtype: Any = jnp.float32

    @staticmethod
    def frozen_patterns():
        return [r"^tokenizer/"]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        from .discrete_vae import DiscreteVAE

        view, tok_view, bool_mask = batch[0], batch[1], batch[2]
        n = view.shape[0]
        grid = self.img_size // self.patch_size
        l = grid * grid
        m = self.num_masked
        patch_embed = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                                 dtype=self.dtype, name="patch_embed")
        pos = jnp.asarray(get_2d_sincos_pos_embed(self.embed_dim, grid))[None]
        blocks = [Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                        dtype=self.dtype, name=f"blocks_{i}") for i in range(self.depth)]
        norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")

        x = patch_embed(view) + pos.astype(self.dtype)

        # visible-first ordering: stable argsort of the host mask
        order = jnp.argsort(bool_mask.astype(jnp.int32) * l + jnp.arange(l)[None], axis=1)
        ids_vis = order[:, : l - m]
        ids_mask = order[:, l - m :]
        x_vis = jnp.take_along_axis(x, ids_vis[:, :, None], axis=1)
        for blk in blocks:
            x_vis = blk(x_vis, deterministic=not train)
        x_vis = norm(x_vis)

        # teacher: same encoder on the full image, stop-grad
        t = patch_embed(view) + pos.astype(self.dtype)
        for blk in blocks:
            t = blk(t, deterministic=True)
        t = norm(t)
        t = jax.lax.stop_gradient(t)
        t_masked = jnp.take_along_axis(t, ids_mask[:, :, None], axis=1)

        # latent regressor: mask queries cross-attend to visible latents
        mask_token = self.param("mask_token", tinit.trunc_normal_(std=0.02),
                                (1, 1, self.embed_dim), jnp.float32)
        pos_masked = jnp.take_along_axis(jnp.broadcast_to(pos.astype(self.dtype), (n, l, self.embed_dim)),
                                         ids_mask[:, :, None], axis=1)
        q = jnp.broadcast_to(mask_token.astype(self.dtype), (n, m, self.embed_dim)) + pos_masked
        for i in range(self.regressor_depth):
            q = CrossAttentionBlock(self.num_heads, self.mlp_ratio, self.dtype,
                                    name=f"regressor_{i}")(q, x_vis, deterministic=not train)
        q = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="regressor_norm")(q)

        align_loss = jnp.mean(jnp.square(q.astype(jnp.float32) - t_masked.astype(jnp.float32)))

        # token prediction head at masked positions
        logits = nn.Dense(self.vocab_size, dtype=self.dtype,
                          kernel_init=tinit.trunc_normal_(std=0.02), name="head")(q)
        tok = DiscreteVAE(dtype=self.dtype, name="tokenizer",
                          **dict(self.tokenizer or {"vocab_size": self.vocab_size}))
        target_all = jax.lax.stop_gradient(tok.tokenize(tok_view))
        if target_all.shape[1] != l:
            g_t = int(target_all.shape[1] ** 0.5)
            s = g_t // grid
            target_all = target_all.reshape(n, grid, s, grid, s)[:, :, 0, :, 0].reshape(n, l)
        target = jnp.take_along_axis(target_all, ids_mask, axis=1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        token_loss = -jnp.mean(jnp.take_along_axis(logp, target[:, :, None], axis=-1))
        acc = jnp.mean((jnp.argmax(logits, -1) == target).astype(jnp.float32))

        loss = self.token_weight * token_loss + self.align_weight * align_loss
        return {"loss": loss, "token_loss": token_loss, "align_loss": align_loss, "acc1": acc}


@register_model
class CAEFinetune(Model):
    """CAE finetune = plain ViT over the pretrained encoder weights."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    global_pool: bool = True
    # True = linear probe: freeze everything except the head
    freeze_encoder: bool = False
    dtype: Any = jnp.float32

    def frozen_patterns(self):
        return [r"^(patch_embed|blocks_|norm)"] if self.freeze_encoder else []

    @nn.compact
    def __call__(self, x, train: bool = True):
        grid = self.img_size // self.patch_size
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       dtype=self.dtype, name="patch_embed")(x)
        pos = jnp.asarray(get_2d_sincos_pos_embed(self.embed_dim, grid))[None]
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                      dtype=self.dtype, name=f"blocks_{i}")(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        feats = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=tinit.trunc_normal_(std=0.02), name="head")(feats)
