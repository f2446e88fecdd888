"""DINO / DINOv2 ViTs + linear probes.

Capability parity with reference `passl/models/dino/dino_vit.py`
(`DINOVisionTransformer` + `DINOLinearProbe` — the reference ships
linear-probe evaluation only, no pretrain loop in-tree) and
`passl/models/dinov2/dinov2_vit.py` (`LayerScale`, stochastic-depth,
SwiGLU option, patch-14 variants; LinearProbe only).

The probes consume multi-layer cls tokens (DINO concatenates the last
n blocks' cls tokens; DINOv2 uses cls + mean of patch tokens).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn import init as tinit
from ..nn.layers import Block, PatchEmbed
from .base import MODELS, Model, register_model


class DINOVisionTransformer(nn.Module):
    """ViT returning intermediate cls tokens (reference dino_vit.py)."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    init_values: Optional[float] = None  # DINOv2 uses 1.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, n_last_blocks: int = 1,
                 return_patch_avg: bool = False):
        n = x.shape[0]
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       dtype=self.dtype, name="patch_embed")(x)
        num_patches = x.shape[1]
        base_patches = (self.img_size // self.patch_size) ** 2
        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                               (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param("pos_embed", tinit.trunc_normal_(std=0.02),
                               (1, base_patches + 1, self.embed_dim), jnp.float32)
        if num_patches != base_patches:
            # multi-crop: interpolate the grid pos embed to this
            # resolution (DINO's multi-resolution forward)
            from .vision_transformer import interpolate_pos_embed

            pos_embed = interpolate_pos_embed(pos_embed, int(num_patches**0.5), num_prefix=1)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1) + pos_embed.astype(x.dtype)
        norm = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")
        outs = []
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                      init_values=self.init_values, norm_eps=self.norm_eps,
                      dtype=self.dtype, name=f"blocks_{i}")(x, deterministic=not train)
            if i >= self.depth - n_last_blocks:
                outs.append(norm(x))
        feats = jnp.concatenate([o[:, 0] for o in outs], axis=-1)
        if return_patch_avg:
            feats = jnp.concatenate([feats, jnp.mean(outs[-1][:, 1:], axis=1)], axis=-1)
        return feats


@register_model
class DINOLinearProbe(Model):
    """Frozen DINO ViT + linear head over concat of last-n cls tokens
    (reference DINOLinearProbe)."""

    encoder: Any = None  # DINOVisionTransformer kwargs
    num_classes: int = 1000
    n_last_blocks: int = 4
    avgpool_patchtokens: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def frozen_patterns():
        return [r"^encoder/"]

    @nn.compact
    def __call__(self, x, train: bool = True):
        enc = DINOVisionTransformer(dtype=self.dtype, name="encoder", **dict(self.encoder or {}))
        feats = jax.lax.stop_gradient(
            enc(x, train=False, n_last_blocks=self.n_last_blocks,
                return_patch_avg=self.avgpool_patchtokens))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=tinit.normal_(std=0.01),
                        bias_init=nn.initializers.zeros, name="head")(feats)


@register_model
class DINOv2LinearProbe(DINOLinearProbe):
    """DINOv2 probe: cls + patch-token average, LayerScale backbone
    (reference dinov2_vit.py). encoder defaults use init_values=1.0."""

    n_last_blocks: int = 1
    avgpool_patchtokens: bool = True


_DINO_VARIANTS = {
    "dino_vit_small_patch16": dict(embed_dim=384, depth=12, num_heads=6),
    "dino_vit_small_patch8": dict(patch_size=8, embed_dim=384, depth=12, num_heads=6),
    "dino_vit_base_patch16": dict(embed_dim=768, depth=12, num_heads=12),
    "dino_vit_base_patch8": dict(patch_size=8, embed_dim=768, depth=12, num_heads=12),
    "dinov2_vit_small_patch14": dict(patch_size=14, embed_dim=384, depth=12, num_heads=6, init_values=1.0),
    "dinov2_vit_base_patch14": dict(patch_size=14, embed_dim=768, depth=12, num_heads=12, init_values=1.0),
    "dinov2_vit_large_patch14": dict(patch_size=14, embed_dim=1024, depth=24, num_heads=16, init_values=1.0),
    "dinov2_vit_giant2_patch14": dict(patch_size=14, embed_dim=1536, depth=40, num_heads=24, init_values=1.0),
}

for _name, _cfg in _DINO_VARIANTS.items():
    def _make(cfg=_cfg):
        def factory(**kw):
            merged = dict(cfg)
            merged.update(kw)
            return DINOVisionTransformer(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)


class DINOHead(nn.Module):
    """3-layer MLP -> L2-normalized bottleneck -> weight-normalized
    prototype layer (the DINO projection head)."""

    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..nn.norm import l2_normalize

        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.bottleneck_dim, dtype=self.dtype, name="fc3")(x)
        x = l2_normalize(x.astype(jnp.float32), axis=-1)
        # weight-normalized prototypes (unit-norm columns at use time)
        w = self.param("prototypes", tinit.trunc_normal_(std=0.02),
                       (self.bottleneck_dim, self.out_dim), jnp.float32)
        w = l2_normalize(w, axis=0)
        return x @ w


@register_model
class DINOPretrain(Model):
    """DINO self-distillation pretraining (beyond the reference, which
    ships only DINO linear probes): student/teacher towers over
    multi-crop batches, teacher centering with EMA'd center buffer,
    temperature-sharpened cross-entropy between every teacher global
    crop and every student crop of a different view.

    batch: list of crops — first `global_crops` at full resolution
    (teacher + student), the rest local (student only).
    """

    backbone: Any = None  # DINOVisionTransformer kwargs (or registry cfg)
    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    global_crops: int = 2
    student_temp: float = 0.1
    teacher_temp: float = 0.04
    center_momentum: float = 0.9
    base_momentum: float = 0.996
    dtype: Any = jnp.float32

    def ema_map(self):
        return [("student", "teacher", {"momentum": self.base_momentum, "schedule": "cosine"})]

    @staticmethod
    def frozen_patterns():
        return [r"^teacher/"]

    class _Tower(nn.Module):
        backbone: Any
        out_dim: int
        hidden_dim: int
        bottleneck_dim: int
        dtype: Any

        @nn.compact
        def __call__(self, x, train: bool = True):
            enc = DINOVisionTransformer(dtype=self.dtype, name="backbone",
                                        **dict(self.backbone or {}))
            feats = enc(x, train=train)
            return DINOHead(self.out_dim, self.hidden_dim, self.bottleneck_dim,
                            self.dtype, name="head")(feats, train=train)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        crops = list(batch) if isinstance(batch, (list, tuple)) else [batch]
        student = DINOPretrain._Tower(self.backbone, self.out_dim, self.hidden_dim,
                                      self.bottleneck_dim, self.dtype, name="student")
        teacher = DINOPretrain._Tower(self.backbone, self.out_dim, self.hidden_dim,
                                      self.bottleneck_dim, self.dtype, name="teacher")

        # group same-resolution crops into single forwards (MXU-friendly)
        res_groups = {}
        for i, c in enumerate(crops):
            res_groups.setdefault(c.shape[1], []).append(i)
        s_out = {}
        for res, idxs in res_groups.items():
            x = jnp.concatenate([crops[i] for i in idxs], axis=0)
            z = student(x, train=train)
            per = crops[idxs[0]].shape[0]
            for j, i in enumerate(idxs):
                s_out[i] = z[j * per : (j + 1) * per]
        t_global = jax.lax.stop_gradient(
            teacher(jnp.concatenate(crops[: self.global_crops], axis=0), train=train))
        n = crops[0].shape[0]
        t_out = [t_global[k * n : (k + 1) * n] for k in range(self.global_crops)]

        center = self.variable("ssl", "center",
                               lambda: jnp.zeros((1, self.out_dim), jnp.float32))
        t_probs = [jax.nn.softmax((t - center.value) / self.teacher_temp, axis=-1)
                   for t in t_out]

        total, terms = 0.0, 0
        for ti, tp in enumerate(t_probs):
            for si in range(len(crops)):
                if si == ti:
                    continue
                logp = jax.nn.log_softmax(s_out[si] / self.student_temp, axis=-1)
                total = total - jnp.mean(jnp.sum(tp * logp, axis=-1))
                terms += 1
        loss = total / max(terms, 1)

        if train and not self.is_initializing():
            batch_center = jnp.mean(t_global, axis=0, keepdims=True)
            center.value = (self.center_momentum * center.value
                            + (1 - self.center_momentum) * batch_center)

        return {"loss": loss}


@register_model
class DINOv2Pretrain(Model):
    """DINOv2-style pretraining (beyond the reference, which ships only
    DINOv2 probes): the DINO image-level self-distillation loss plus an
    iBOT-style masked patch-token distillation loss and the KoLeo
    spread regularizer on student cls features.

    Simplifications vs the full paper recipe (documented deliberately):
    uniform random patch masking in-graph (instead of host block
    masks) and EMA centering (instead of Sinkhorn centering).
    batch: list of crops, first `global_crops` full-resolution.
    """

    backbone: Any = None
    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    global_crops: int = 2
    student_temp: float = 0.1
    teacher_temp: float = 0.04
    center_momentum: float = 0.9
    base_momentum: float = 0.994
    mask_ratio: float = 0.3
    ibot_weight: float = 1.0
    koleo_weight: float = 0.1
    dtype: Any = jnp.float32

    def ema_map(self):
        return [("student", "teacher", {"momentum": self.base_momentum, "schedule": "cosine"})]

    @staticmethod
    def frozen_patterns():
        return [r"^teacher/"]

    class _Tower(nn.Module):
        backbone: Any
        out_dim: int
        hidden_dim: int
        bottleneck_dim: int
        dtype: Any

        @nn.compact
        def __call__(self, x, train: bool = True, bool_mask=None, all_tokens: bool = False):
            cfg = dict(self.backbone or {})
            cfg.setdefault("init_values", 1.0)  # DINOv2 LayerScale
            enc = DINOv2Backbone(dtype=self.dtype, name="backbone", **cfg)
            tokens = enc(x, train=train, bool_mask=bool_mask)  # [N, 1+L, C]
            head = DINOHead(self.out_dim, self.hidden_dim, self.bottleneck_dim,
                            self.dtype, name="head")
            if all_tokens:
                n, l1, c = tokens.shape
                out = head(tokens.reshape(n * l1, c), train=train)
                return out.reshape(n, l1, -1)
            return head(tokens[:, 0], train=train)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        import jax

        crops = list(batch) if isinstance(batch, (list, tuple)) else [batch]
        student = DINOv2Pretrain._Tower(self.backbone, self.out_dim, self.hidden_dim,
                                        self.bottleneck_dim, self.dtype, name="student")
        teacher = DINOv2Pretrain._Tower(self.backbone, self.out_dim, self.hidden_dim,
                                        self.bottleneck_dim, self.dtype, name="teacher")

        n = crops[0].shape[0]
        g = jnp.concatenate(crops[: self.global_crops], axis=0)

        # masks for the student's global crops (uniform random, in-graph)
        p = dict(self.backbone or {}).get("patch_size", 16)
        img = g.shape[1]
        l = (img // p) ** 2
        rng = self.make_rng("masking") if train else jax.random.PRNGKey(0)
        bool_mask = (jax.random.uniform(rng, (g.shape[0], l)) < self.mask_ratio).astype(jnp.int32)

        s_global = student(g, train=train, bool_mask=bool_mask, all_tokens=True)  # [2N, 1+L, K]
        t_global = jax.lax.stop_gradient(teacher(g, train=train, all_tokens=True))

        cls_center = self.variable("ssl", "cls_center",
                                   lambda: jnp.zeros((1, self.out_dim), jnp.float32))
        patch_center = self.variable("ssl", "patch_center",
                                     lambda: jnp.zeros((1, self.out_dim), jnp.float32))

        # --- image-level DINO loss: teacher cls of crop i vs student cls
        # of every other crop (locals run unmasked through the student)
        t_cls = [jax.nn.softmax((t_global[k * n:(k + 1) * n, 0] - cls_center.value)
                                / self.teacher_temp, axis=-1)
                 for k in range(self.global_crops)]
        s_cls = {i: s_global[i * n:(i + 1) * n, 0] for i in range(self.global_crops)}
        for i in range(self.global_crops, len(crops)):
            s_cls[i] = student(crops[i], train=train)
        dino_loss, terms = 0.0, 0
        for ti, tp in enumerate(t_cls):
            for si in range(len(crops)):
                if si == ti:
                    continue
                logp = jax.nn.log_softmax(s_cls[si] / self.student_temp, axis=-1)
                dino_loss = dino_loss - jnp.mean(jnp.sum(tp * logp, axis=-1))
                terms += 1
        dino_loss = dino_loss / max(terms, 1)

        # --- iBOT masked patch loss on global crops
        t_patch = jax.nn.softmax((t_global[:, 1:] - patch_center.value)
                                 / self.teacher_temp, axis=-1)
        s_patch_logp = jax.nn.log_softmax(s_global[:, 1:] / self.student_temp, axis=-1)
        per_tok = -jnp.sum(t_patch * s_patch_logp, axis=-1)  # [2N, L]
        m = bool_mask.astype(jnp.float32)
        ibot_loss = jnp.sum(per_tok * m) / jnp.maximum(jnp.sum(m), 1.0)

        # --- KoLeo spread regularizer on student global cls features
        from ..nn.norm import l2_normalize

        f = l2_normalize(s_global[:, 0].astype(jnp.float32), axis=-1)
        d2 = 2.0 - 2.0 * (f @ f.T) + 1e6 * jnp.eye(f.shape[0])
        koleo = -jnp.mean(jnp.log(jnp.sqrt(jnp.min(d2, axis=-1)) + 1e-8))

        if train and not self.is_initializing():
            cls_center.value = (self.center_momentum * cls_center.value
                                + (1 - self.center_momentum)
                                * jnp.mean(t_global[:, 0], axis=0, keepdims=True))
            patch_center.value = (self.center_momentum * patch_center.value
                                  + (1 - self.center_momentum)
                                  * jnp.mean(t_global[:, 1:].reshape(-1, self.out_dim),
                                             axis=0, keepdims=True))

        loss = dino_loss + self.ibot_weight * ibot_loss + self.koleo_weight * koleo
        return {"loss": loss, "dino_loss": dino_loss, "ibot_loss": ibot_loss,
                "koleo_loss": koleo}


class DINOv2Backbone(nn.Module):
    """DINO ViT variant returning ALL tokens, with optional mask-token
    substitution at masked patches (iBOT student path) and multi-res
    pos-embed interpolation."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 1.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, bool_mask=None):
        n = x.shape[0]
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       dtype=self.dtype, name="patch_embed")(x)
        num_patches = x.shape[1]
        if bool_mask is not None:
            mask_token = self.param("mask_token", tinit.trunc_normal_(std=0.02),
                                    (1, 1, self.embed_dim), jnp.float32)
            m = bool_mask.astype(x.dtype)[:, :, None]
            x = x * (1 - m) + mask_token.astype(x.dtype) * m
        base = (self.img_size // self.patch_size) ** 2
        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                               (1, 1, self.embed_dim), jnp.float32)
        pos = self.param("pos_embed", tinit.trunc_normal_(std=0.02),
                         (1, base + 1, self.embed_dim), jnp.float32)
        if num_patches != base:
            from .vision_transformer import interpolate_pos_embed

            pos = interpolate_pos_embed(pos, int(num_patches**0.5), num_prefix=1)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1) + pos.astype(x.dtype)
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                      init_values=self.init_values, norm_eps=self.norm_eps,
                      dtype=self.dtype, name=f"blocks_{i}")(x, not train)
        return nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)
