"""MAE: masked autoencoder pretraining + finetune/linear-probe ViTs.

Capability parity with reference `passl/models/mae.py`:
 - `MaskedAutoencoderViT` (:24-290): patch embed, fixed 2D sin-cos pos
   embeds (encoder + decoder), per-sample argsort-of-noise random
   masking (:184-212), encoder over visible tokens only, decoder with
   mask tokens unshuffled via ids_restore, norm-pix MSE on masked
   patches (:268-284), patchify/unpatchify (:156-182)
 - `MAEVisionTransformer` finetune (:293-330): global-pool ViT → our
   VisionTransformer(global_pool=True)
 - linear probe = frozen backbone + BN-head (configs use
   `frozen_patterns`).

TPU notes: masking keeps static shapes (len_keep fixed from the
mask_ratio), gathers are one `take_along_axis` each — XLA lowers them
to efficient dynamic-gathers; everything jit-compiles once.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn import init as tinit
from ..nn.layers import Block, PatchEmbed
from .base import Model, register_model
from .utils.pos_embed import get_2d_sincos_pos_embed
from .vision_transformer import VisionTransformer


def patchify(imgs: jnp.ndarray, p: int) -> jnp.ndarray:
    """NHWC [N,H,W,3] → [N, L, p*p*3] (reference mae.py:156-169,
    channel-last adapted: the inner patch layout is (p, p, c))."""
    n, h, w, c = imgs.shape
    gh, gw = h // p, w // p
    x = imgs.reshape(n, gh, p, gw, p, c)
    x = jnp.einsum("nhpwqc->nhwpqc", x)
    return x.reshape(n, gh * gw, p * p * c)


def unpatchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    n, l, d = x.shape
    gh = gw = int(l**0.5)
    c = d // (p * p)
    x = x.reshape(n, gh, gw, p, p, c)
    x = jnp.einsum("nhwpqc->nhpwqc", x)
    return x.reshape(n, gh * p, gw * p, c)


def random_masking(x: jnp.ndarray, mask_ratio: float, rng) -> tuple:
    """Argsort-of-noise masking (reference mae.py:184-212). Static
    output shapes: len_keep is a python int."""
    n, l, d = x.shape
    len_keep = int(l * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (n, l))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((n, l), x.dtype)
    mask = mask.at[:, :len_keep].set(0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


@register_model
class MaskedAutoencoderViT(Model):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = True
    mask_ratio: float = 0.75
    softmax_dtype: Any = "float32"  # attention-score precision (see nn.layers.Attention)
    attn_impl: str = "einsum"  # "einsum" | "flash" | "auto" (see ops.attention)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, train: bool = True):
        imgs = batch[0] if isinstance(batch, (tuple, list)) else batch
        p = self.patch_size
        grid = self.img_size // p
        num_patches = grid * grid

        # ---------- encoder
        x = PatchEmbed(patch_size=p, embed_dim=self.embed_dim, dtype=self.dtype,
                       kernel_init=tinit.xavier_uniform_(), name="patch_embed")(imgs)
        pos_embed = jnp.asarray(get_2d_sincos_pos_embed(self.embed_dim, grid, cls_token=True))[None]
        x = x + pos_embed[:, 1:, :].astype(x.dtype)
        rng = self.make_rng("masking") if train else jax.random.PRNGKey(0)
        ratio = self.mask_ratio if train else self.mask_ratio
        x, mask, ids_restore = random_masking(x, ratio, rng)

        cls_token = self.param("cls_token", tinit.normal_(std=0.02), (1, 1, self.embed_dim), jnp.float32)
        cls = jnp.broadcast_to((cls_token + pos_embed[:, :1, :]).astype(x.dtype),
                               (x.shape[0], 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                      dtype=self.dtype, softmax_dtype=self.softmax_dtype,
                      attn_impl=self.attn_impl,
                      name=f"blocks_{i}")(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        # ---------- decoder
        x = nn.Dense(self.decoder_embed_dim, dtype=self.dtype, name="decoder_embed")(x)
        mask_token = self.param("mask_token", tinit.normal_(std=0.02),
                                (1, 1, self.decoder_embed_dim), jnp.float32)
        n = x.shape[0]
        n_masked = num_patches + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(mask_token.astype(x.dtype), (n, n_masked, self.decoder_embed_dim))
        x_ = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)  # unshuffle
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)
        dec_pos = jnp.asarray(get_2d_sincos_pos_embed(self.decoder_embed_dim, grid, cls_token=True))[None]
        x = x + dec_pos.astype(x.dtype)
        for i in range(self.decoder_depth):
            x = Block(num_heads=self.decoder_num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                      dtype=self.dtype, softmax_dtype=self.softmax_dtype,
                      attn_impl=self.attn_impl,
                      name=f"decoder_blocks_{i}")(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="decoder_norm")(x)
        pred = nn.Dense(p * p * 3, dtype=self.dtype, name="decoder_pred")(x)[:, 1:, :]

        # ---------- loss (norm-pix MSE on masked patches)
        target = patchify(imgs.astype(jnp.float32), p)
        if self.norm_pix_loss:
            mean = jnp.mean(target, axis=-1, keepdims=True)
            var = jnp.var(target, axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - target), axis=-1)
        loss = jnp.sum(loss * mask) / jnp.sum(mask)
        return {"loss": loss}


@register_model
class MAEVisionTransformer(VisionTransformer):
    """Finetune model: global-pool ViT (reference mae.py:293-330)."""

    global_pool: bool = True


def _mae_variant(name, **defaults):
    from .base import MODELS

    def factory(**kw):
        merged = dict(defaults)
        merged.update(kw)
        return MaskedAutoencoderViT(**merged)

    factory.__name__ = name
    MODELS.register(factory, name=name)


_mae_variant("mae_vit_base_patch16", embed_dim=768, depth=12, num_heads=12,
             decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16)
_mae_variant("mae_vit_large_patch16", embed_dim=1024, depth=24, num_heads=16,
             decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16)
_mae_variant("mae_vit_huge_patch14", patch_size=14, embed_dim=1280, depth=32, num_heads=16,
             decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16)
