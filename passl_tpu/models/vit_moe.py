"""Vision Transformer with Mixture-of-Experts MLPs (V-MoE).

Beyond the reference (PASSL has no MoE family): the scaled-ViT design
from "Scaling Vision with Sparse Mixture of Experts" — every
``moe_interval``-th transformer block replaces its dense MLP with a
capacity-routed expert ensemble (`nn/moe.MoEMlp`). Expert parallelism
comes from sharding the stacked expert dim over the mesh
(distributed/sharding.MOE_SHARD_RULES for the declarative pjit path;
`nn/moe.make_expert_parallel_mlp` for explicit all_to_all dispatch —
both validated equal in tests/test_moe.py).

Training contract: with ``train=True`` the model returns
``{"logits", "moe_aux_loss", "moe_balance"}`` — the engine's train step
adds any ``*loss*`` entry to the objective (engine/steps.py) so the
router's load-balance term trains alongside CE. Eval (``train=False``)
returns plain logits, keeping every eval/export path unchanged.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as _np

from ..nn import init as tinit
from ..nn.layers import Attention, DropPath, PatchEmbed
from ..nn.moe import MoEMlp
from .base import MODELS, Model, register_model

Dtype = Any


class BlockMoE(nn.Module):
    """Pre-norm transformer block whose MLP is a routed expert mixture."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    num_experts: int = 8
    moe_k: int = 2
    capacity_factor: float = 1.25
    aux_weight: float = 0.01
    z_weight: float = 0.0
    group_size: int = 256
    attn_impl: str = "einsum"
    dtype: Dtype = jnp.float32
    softmax_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        y = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            softmax_dtype=self.softmax_dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        y, aux = MoEMlp(
            num_experts=self.num_experts,
            k=self.moe_k,
            capacity_factor=self.capacity_factor,
            hidden_features=int(dim * self.mlp_ratio),
            drop=self.drop,
            aux_weight=self.aux_weight,
            z_weight=self.z_weight,
            group_size=self.group_size,
            dtype=self.dtype,
            name="moe",
        )(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic=deterministic)
        return x, aux


@register_model
class VisionTransformerMoE(Model):
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
    norm_eps: float = 1e-6
    softmax_dtype: Dtype = "float32"
    dtype: Dtype = jnp.float32
    # MoE layout (V-MoE): blocks i with (i % moe_interval == moe_interval-1)
    # are MoE — "every-2" places experts in odd blocks, the paper default.
    num_experts: int = 8
    moe_k: int = 2
    moe_interval: int = 2
    capacity_factor: float = 1.25
    aux_weight: float = 0.01
    z_weight: float = 0.0
    group_size: int = 256  # routing group tokens (nn/moe.MoEMlp)

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        n = x.shape[0]
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       dtype=self.dtype, name="patch_embed")(x)
        num_patches = x.shape[1]
        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                               (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param("pos_embed", tinit.trunc_normal_(std=0.02),
                               (1, num_patches + 1, self.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embed.astype(x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=not train)

        dpr = [float(r) for r in _np.linspace(0, self.drop_path_rate, self.depth)]
        aux_losses = []
        balances = []
        from ..nn.layers import Block

        for i in range(self.depth):
            common = dict(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[i],
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                softmax_dtype=self.softmax_dtype,
            )
            if i % self.moe_interval == self.moe_interval - 1:
                x, aux = BlockMoE(
                    num_experts=self.num_experts,
                    moe_k=self.moe_k,
                    capacity_factor=self.capacity_factor,
                    aux_weight=self.aux_weight,
                    z_weight=self.z_weight,
                    group_size=self.group_size,
                    name=f"blocks_{i}",
                    **common,
                )(x, not train)
                aux_losses.append(sum(v for k, v in aux.items() if "loss" in k))
                balances.append(aux["moe_balance"])
            else:
                x = Block(name=f"blocks_{i}", **common)(x, not train)

        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)
        feats = x[:, 0]
        aux = {
            "moe_aux_loss": sum(aux_losses),
            "moe_balance": sum(balances) / max(len(balances), 1),
        }
        if return_features or self.num_classes == 0:
            # backbone mode: in training the router's balance loss MUST
            # reach the objective, so return it alongside the features —
            # a wrapper that wants a bare tensor must unpack (loudly),
            # never silently train an unbalanced router
            return {"features": feats, **aux} if train else feats
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          kernel_init=tinit.trunc_normal_(std=0.02),
                          name="head")(feats)
        return {"logits": logits, **aux} if train else logits

    def optimizer_overrides(self):
        # stacked expert biases are 2-D [E, h]/[E, d], so the engine's
        # ndim<=1 one_dim_param_no_weight_decay exemption misses them;
        # restore bias semantics (dense-block fc biases get wd=0)
        return [{"name": r"moe/(b1|b2)$", "weight_decay": 0.0}]


_VARIANTS = {
    # V-MoE paper geometry: every-2 MoE placement, k=2, E experts
    "VMoE_tiny_patch16_224_e8": dict(patch_size=16, embed_dim=192, depth=12,
                                     num_heads=3, num_experts=8),
    "VMoE_small_patch16_224_e8": dict(patch_size=16, embed_dim=384, depth=12,
                                      num_heads=6, num_experts=8),
    "VMoE_base_patch16_224_e8": dict(patch_size=16, embed_dim=768, depth=12,
                                     num_heads=12, num_experts=8),
    "VMoE_base_patch16_224_e16": dict(patch_size=16, embed_dim=768, depth=12,
                                      num_heads=12, num_experts=16),
    "VMoE_large_patch16_224_e16": dict(patch_size=16, embed_dim=1024, depth=24,
                                       num_heads=16, num_experts=16),
}


def _make_variant(name, defaults):
    def factory(**kw):
        merged = dict(defaults)
        merged.update(kw)
        return VisionTransformerMoE(**merged)

    factory.__name__ = name
    MODELS.register(factory, name=name)


for _name, _defaults in _VARIANTS.items():
    _make_variant(_name, _defaults)
