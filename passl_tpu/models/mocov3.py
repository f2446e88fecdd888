"""MoCo v3: ViT momentum contrast.

Capability parity with reference `passl/models/mocov3.py`:
 - `MoCoV3ViT` (:37-91): ViT with fixed 2D sin-cos pos embed, per-QKV
   xavier-style uniform init (val = sqrt(6/(d + d)) treating Q/K/V
   separately), cls_token std 1e-6, optional stop-grad patch embed
 - `MoCoV3Pretrain` (:117-227): base tower = encoder + 3-layer
   projector (fc-bn-relu ×2 + fc-bn(no affine)); predictor = 2-layer
   mlp; momentum tower is an EMA copy of (encoder+projector+predictor)
   — yes, including the predictor, matching the reference's
   CosineEMA(Sequential(base_encoder, predictor)); symmetric loss
   ctr(q1,k2)+ctr(q2,k1) with logits over *all* keys (the reference
   all_gathers; under jit the batch is already global) scaled by 2T
 - `MoCoV3LinearProbe` (:94-109): frozen backbone, 0.01-init head.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn import init as tinit
from ..nn.layers import Block, PatchEmbed
from ..nn.norm import l2_normalize
from .base import Model, register_model
from .utils.pos_embed import mocov3_2d_sincos_pos_embed


def _mocov3_qkv_init():
    """Fused-qkv kernel (d, 3d): bound from per-matrix fan sqrt(6/(d+d))."""

    def init(key, shape, dtype=jnp.float32):
        d_in, d_out3 = shape
        val = math.sqrt(6.0 / (d_out3 // 3 + d_in))
        return jax.random.uniform(key, shape, minval=-val, maxval=val).astype(dtype)

    return init


class MoCoV3ViT(nn.Module):
    """ViT with MoCo v3 init + fixed sin-cos pos embed."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    stop_grad_conv1: bool = True
    softmax_dtype: Any = "float32"  # attention-score precision (nn.layers.Attention)
    attn_impl: str = "einsum"  # "einsum" | "flash" | "auto" (ops.attention)
    dtype: Any = jnp.float32
    # SSL x MoE composition (beyond reference — PASSL has no MoE): with
    # num_experts > 0 every moe_interval-th block swaps its dense MLP for
    # a routed expert mixture (models/vit_moe.BlockMoE), making this the
    # V-MoE backbone for MoCo v3 pretraining. Expert weights land on the
    # declarative MOE_SHARD_RULES path (distributed/sharding.py) since
    # the param names are the same (blocks_i/moe/{router,w1,b1,w2,b2}).
    # In training the router's load-balance loss must reach the
    # objective, so the train=True return becomes {"features", **aux}.
    num_experts: int = 0
    moe_interval: int = 2
    moe_k: int = 2
    capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01
    moe_group_size: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = x.shape[0]
        p = self.patch_size
        val = math.sqrt(6.0 / (3 * p * p + self.embed_dim))
        x = PatchEmbed(patch_size=p, embed_dim=self.embed_dim, dtype=self.dtype,
                       kernel_init=tinit.uniform_(-val, val), name="patch_embed")(x)
        if self.stop_grad_conv1:
            x = jax.lax.stop_gradient(x)
        h = w = self.img_size // p
        pos = jnp.asarray(mocov3_2d_sincos_pos_embed(self.embed_dim, h, w))  # fixed
        cls_token = self.param("cls_token", tinit.normal_(std=1e-6), (1, 1, self.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1) + pos.astype(x.dtype)
        aux_losses, balances = [], []
        for i in range(self.depth):
            if self.num_experts and i % self.moe_interval == self.moe_interval - 1:
                from .vit_moe import BlockMoE

                x, aux = BlockMoE(
                    num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                    qkv_bias=True, num_experts=self.num_experts,
                    moe_k=self.moe_k, capacity_factor=self.capacity_factor,
                    aux_weight=self.moe_aux_weight,
                    group_size=self.moe_group_size, dtype=self.dtype,
                    softmax_dtype=self.softmax_dtype, attn_impl=self.attn_impl,
                    name=f"blocks_{i}")(x, deterministic=not train)
                aux_losses.append(sum(v for k, v in aux.items() if "loss" in k))
                balances.append(aux["moe_balance"])
            else:
                x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                          dtype=self.dtype, softmax_dtype=self.softmax_dtype,
                          attn_impl=self.attn_impl,
                          name=f"blocks_{i}")(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        feats = x[:, 0]
        if self.num_experts and train:
            return {"features": feats,
                    "moe_aux_loss": sum(aux_losses),
                    "moe_balance": sum(balances) / max(len(balances), 1)}
        return feats


class _MLPHead(nn.Module):
    """MoCo v3 mlp: fc(bias-free)-bn-relu per layer, last fc + optional
    affine-free BN (reference _build_mlp, mocov3.py:136-159)."""

    num_layers: int
    mlp_dim: int
    out_dim: int
    last_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for l in range(self.num_layers):
            dim2 = self.out_dim if l == self.num_layers - 1 else self.mlp_dim
            x = nn.Dense(dim2, use_bias=False, dtype=self.dtype, name=f"fc{l}")(x)
            if l < self.num_layers - 1:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name=f"bn{l}")(x)
                x = nn.relu(x)
            elif self.last_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 use_bias=False, use_scale=False, dtype=self.dtype, name=f"bn{l}")(x)
        return x


class _Tower(nn.Module):
    """encoder → projector → (optional predictor slot for the momentum
    tower, which EMAs the full stack)."""

    encoder_cfg: Any
    dim: int
    mlp_dim: int
    with_predictor: bool
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool = True, run_predictor: bool = True):
        enc = MoCoV3ViT(dtype=self.dtype, name="encoder", **dict(self.encoder_cfg))
        feats = enc(x, train=train)
        aux = None
        if isinstance(feats, dict):  # MoE encoder: router aux rides along
            aux = {k: v for k, v in feats.items() if k != "features"}
            feats = feats["features"]
        z = _MLPHead(3, self.mlp_dim, self.dim, dtype=self.dtype, name="head")(feats, train=train)
        if self.with_predictor and run_predictor:
            z = _MLPHead(2, self.mlp_dim, self.dim, dtype=self.dtype, name="predictor")(z, train=train)
        return (z, aux) if aux is not None else z


@register_model
class MoCoV3Pretrain(Model):
    encoder: Any = None  # MoCoV3ViT kwargs (img_size/patch_size/...)
    dim: int = 256
    mlp_dim: int = 4096
    T: float = 1.0
    base_momentum: float = 0.99  # target decay (reference momentum 0.01 = 1-this)
    dtype: Any = jnp.float32

    def ema_map(self):
        return [("base", "momentum", {"momentum": self.base_momentum, "schedule": "cosine"})]

    def optimizer_overrides(self):
        # stacked expert biases are 2-D [E, h]/[E, d] (MoE encoder), so
        # the ndim<=1 one_dim_param_no_weight_decay exemption misses
        # them; restore bias semantics (same as VisionTransformerMoE)
        if (self.encoder or {}).get("num_experts"):
            return [{"name": r"moe/(b1|b2)$", "weight_decay": 0.0}]
        return []

    @staticmethod
    def frozen_patterns():
        return [r"^momentum/"]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        x1, x2 = (batch["view1"], batch["view2"]) if isinstance(batch, dict) else (batch[0], batch[1])
        base = _Tower(self.encoder, self.dim, self.mlp_dim, True, self.dtype, name="base")
        momentum = _Tower(self.encoder, self.dim, self.mlp_dim, True, self.dtype, name="momentum")

        def _unpack(o):
            return o if isinstance(o, tuple) else (o, None)

        q1, aux1 = _unpack(base(x1, train=train))
        q2, aux2 = _unpack(base(x2, train=train))
        # keys = momentum backbone+projector output — the predictor is
        # base-only (reference tasks/ssl/mocov3/builder_moco.py, the
        # canonical entry point: momentum encoder wraps only the base
        # encoder, no predictor; note reference passl/models/mocov3.py:133-134
        # DISAGREES — it EMAs Sequential(encoder, predictor) — so parity
        # comparisons against that file's checkpoints/losses will differ)
        k1 = jax.lax.stop_gradient(_unpack(momentum(x1, train=train, run_predictor=False))[0])
        k2 = jax.lax.stop_gradient(_unpack(momentum(x2, train=train, run_predictor=False))[0])

        def ctr(q, k):
            q = l2_normalize(q.astype(jnp.float32), axis=1)
            k = l2_normalize(k.astype(jnp.float32), axis=1)
            logits = jnp.einsum("nc,mc->nm", q, k) / self.T
            n = logits.shape[0]
            labels = jnp.arange(n)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
            return loss * 2 * self.T

        loss = ctr(q1, k2) + ctr(q2, k1)
        acc = jnp.mean((jnp.argmax(jnp.einsum(
            "nc,mc->nm", l2_normalize(q1.astype(jnp.float32), 1),
            l2_normalize(k2.astype(jnp.float32), 1)), axis=1) == jnp.arange(q1.shape[0])).astype(jnp.float32))
        out = {"loss": loss, "acc1": acc}
        if aux1 is not None:
            # router load-balance loss from the two base-tower forwards
            # (momentum tower is stop-grad, its routers don't train).
            # Added INTO "loss" so the logged loss equals the optimized
            # objective (engine/steps._total_loss takes out["loss"]
            # verbatim when present — golden CI invariant).
            out["loss"] = loss + 0.5 * (aux1["moe_aux_loss"] + aux2["moe_aux_loss"])
            out["moe_balance"] = 0.5 * (aux1["moe_balance"] + aux2["moe_balance"])
        return out


@register_model
class MoCoV3LinearProbe(Model):
    """Frozen MoCoV3ViT + linear head (reference mocov3.py:94-109)."""

    encoder: Any = None
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @staticmethod
    def frozen_patterns():
        return [r"^encoder/"]

    @nn.compact
    def __call__(self, x, train: bool = True):
        enc = MoCoV3ViT(dtype=self.dtype, name="encoder", **dict(self.encoder or {}))
        feats = jax.lax.stop_gradient(enc(x, train=False))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=tinit.normal_(std=0.01), bias_init=nn.initializers.zeros,
                        name="head")(feats)
