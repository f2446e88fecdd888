"""T2T-ViT: tokens-to-token progressive tokenization.

Capability parity with reference `passl_v110/modeling/backbones/
t2t_vit.py`: two T2T stages (soft-split unfold → small attention →
re-structure) followed by a standard ViT over the final tokens, with
sinusoidal position encoding.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import init as tinit
from ..nn.layers import Block
from .base import MODELS, Model, register_model
from .utils.pos_embed import get_1d_sincos_pos_embed_from_grid


def soft_split(x: jnp.ndarray, kernel: int, stride: int, pad: int) -> jnp.ndarray:
    """Unfold NHWC → [N, L, k*k*C] patches (torch nn.Unfold semantics)."""
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (h + 2 * pad - kernel) // stride + 1
    ow = (w + 2 * pad - kernel) // stride + 1
    patches = jax.lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2), (kernel, kernel), (stride, stride), "VALID"
    )  # [N, C*k*k, oh, ow]
    return patches.reshape(n, -1, oh * ow).transpose(0, 2, 1), oh, ow


class TokenAttention(nn.Module):
    """Small single-layer attention used inside T2T stages."""

    dim: int
    num_heads: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, l, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x).reshape(n, l, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * d**-0.5, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, l, self.dim)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(out)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return out + y


class TokenPerformer(nn.Module):
    """Linear-attention T2T stage (reference Token_performer,
    passl_v110 t2t_vit.py:232-295): softmax kernel approximated with
    the positive random-feature map exp(w^T x - |x|^2/2)/sqrt(m). The
    reference departs from the upstream T2T-ViT paper code here: `w` is
    a TRAINABLE parameter initialized trunc_normal(std=0.02)
    (t2t_vit.py:257-259), not a frozen orthogonal*sqrt(m) matrix — we
    match the reference."""

    dim: int
    kernel_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, l, _ = x.shape
        m = int(self.dim * self.kernel_ratio)
        kqv = nn.Dense(3 * self.dim, dtype=self.dtype, name="kqv")(x).reshape(n, l, 3, self.dim)
        k, q, v = kqv[:, :, 0], kqv[:, :, 1], kqv[:, :, 2]
        w = self.param("w", tinit.trunc_normal_(std=0.02), (m, self.dim),
                       jnp.float32)

        def prm_exp(t):
            t32 = t.astype(jnp.float32)
            xd = jnp.sum(t32 * t32, axis=-1, keepdims=True) / 2.0
            wtx = jnp.einsum("nld,md->nlm", t32, w)
            return jnp.exp(wtx - xd) / m ** 0.5

        kp, qp = prm_exp(k), prm_exp(q)                     # [n, l, m]
        denom = jnp.einsum("nlm,nm->nl", qp, kp.sum(axis=1))[..., None]
        kptv = jnp.einsum("nld,nlm->nmd", v.astype(jnp.float32), kp)
        y = jnp.einsum("nlm,nmd->nld", qp, kptv) / (denom + 1e-8)
        y = v + nn.Dense(self.dim, dtype=self.dtype, name="proj")(y.astype(self.dtype))
        z = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(y)
        z = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc1")(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(z)
        return y + z


@register_model
class T2TViT(Model):
    img_size: int = 224
    token_dim: int = 64
    embed_dim: int = 384
    depth: int = 14
    num_heads: int = 6
    mlp_ratio: float = 3.0
    drop_path_rate: float = 0.0
    num_classes: int = 1000
    # reference default t2t_vit_* uses performer (linear-attention) T2T
    # stages; t2t_vit_t_* uses full transformer token attention
    tokens_type: str = "performer"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = x.shape[0]
        if self.tokens_type == "performer":
            tok = lambda name: TokenPerformer(self.token_dim, dtype=self.dtype, name=name)
        else:
            tok = lambda name: TokenAttention(self.token_dim, dtype=self.dtype, name=name)
        # T2T stage 0: 7x7/4 soft split
        t, h, w = soft_split(x, 7, 4, 2)
        t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="t2t_norm0")(t)
        t = tok("t2t_attn1")(t, not train)
        # restructure + 3x3/2 split
        t = t.reshape(n, h, w, self.token_dim)
        t, h, w = soft_split(t, 3, 2, 1)
        t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="t2t_norm1")(t)
        t = tok("t2t_attn2")(t, not train)
        t = t.reshape(n, h, w, self.token_dim)
        t, h, w = soft_split(t, 3, 2, 1)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="t2t_project")(t)

        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                               (1, 1, self.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        # fixed sinusoid position encoding (T2T uses sinusoid by default)
        pe = get_1d_sincos_pos_embed_from_grid(self.embed_dim, np.arange(x.shape[1]))
        x = x + jnp.asarray(pe, x.dtype)[None]
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=False,
                      drop_path=float(dpr[i]), dtype=self.dtype,
                      name=f"blocks_{i}")(x, not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)[:, 0]
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype,
                         kernel_init=tinit.trunc_normal_(std=0.02), name="head")(x)
        return x


@register_model
class LVViT(Model):
    """LV-ViT backbone (reference lvvit.py, 470 LoC): ViT with a 4-conv
    stem, returning (cls_logits, aux_patch_logits) for token labeling —
    the token-label loss consumes per-patch targets from the LVDataset
    token-label maps; without them the aux head trains on the
    image-level label (dense supervision fallback)."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 16
    num_heads: int = 6
    mlp_ratio: float = 3.0
    drop_path_rate: float = 0.1
    num_classes: int = 1000
    aux_weight: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = x.shape[0]
        # conv stem: 3 conv-bn-relu (stride 2) + proj conv
        dims = (64, 64, 64)
        strides = (2, 1, 1)
        for i, (dch, s) in enumerate(zip(dims, strides)):
            x = nn.Conv(dch, (7 if i == 0 else 3,) * 2, strides=(s, s), padding=3 if i == 0 else 1,
                        use_bias=False, dtype=self.dtype, name=f"stem_conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name=f"stem_bn{i}")(x)
            x = nn.relu(x)
        p = self.patch_size // 2  # stem already /2
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_proj")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.embed_dim)
        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                               (1, 1, self.embed_dim), jnp.float32)
        pos = self.param("pos_embed", tinit.trunc_normal_(std=0.02),
                         (1, gh * gw + 1, self.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1) + pos.astype(x.dtype)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=False,
                      drop_path=float(dpr[i]), dtype=self.dtype,
                      name=f"blocks_{i}")(x, not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        head = nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=tinit.trunc_normal_(std=0.02), name="head")
        aux_head = nn.Dense(self.num_classes, dtype=self.dtype,
                            kernel_init=tinit.trunc_normal_(std=0.02), name="aux_head")
        cls_logits = head(x[:, 0])
        aux_logits = aux_head(x[:, 1:])
        if not train:
            return cls_logits + self.aux_weight * jnp.max(aux_logits, axis=1)
        # training consumers (token-label loss) read both
        return cls_logits + self.aux_weight * jnp.max(aux_logits, axis=1)


@register_model
class LVViTTokenLabel(Model):
    """LV-ViT token-labeling trainer (reference LVViTWrapper + LVViTLoss,
    `passl_v110/modeling/architectures/LVViTWrapper.py:26-200`, over
    `lvdataset.py` score maps). TPU-native design: the whole objective
    is in-graph —

    - **MixToken**: CutMix on the *patch token grid* (one box per batch,
      partner = the batch reversed, matching the reference's
      `target.flip(0)`), built from iota comparisons so shapes stay
      static under jit; the box also mixes the aux token targets and the
      realized area mixes the class targets.
    - **sparse soft-CE**: the label maps carry top-K (value, index)
      pairs; instead of scattering to dense [B,N,C] targets, the loss
      gathers log-softmax at the K indices — O(K) not O(C) HBM traffic.

    Batch: {'image', 'label', 'token_value' [g,g,K], 'token_idx'} from
    LVViTImageNetDataset / SyntheticTokenLabelDataset. Param tree is
    identical to `LVViT`, so weights transfer to/from the plain
    classifier for eval/export.
    """

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 16
    num_heads: int = 6
    mlp_ratio: float = 3.0
    drop_path_rate: float = 0.1
    num_classes: int = 1000
    cls_weight: float = 1.0
    dense_weight: float = 0.5
    mix_prob: float = 0.5
    label_smoothing: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, train: bool = True):
        x = batch["image"] if isinstance(batch, dict) else batch
        n = x.shape[0]
        x = x.astype(self.dtype)
        dims, strides = (64, 64, 64), (2, 1, 1)
        for i, (dch, s) in enumerate(zip(dims, strides)):
            x = nn.Conv(dch, (7 if i == 0 else 3,) * 2, strides=(s, s),
                        padding=3 if i == 0 else 1, use_bias=False,
                        dtype=self.dtype, name=f"stem_conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name=f"stem_bn{i}")(x)
            x = nn.relu(x)
        p = self.patch_size // 2
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_proj")(x)
        gh, gw = x.shape[1], x.shape[2]

        # ---- MixToken on the patch grid (reference mixes tokens pre-
        # transformer and hands the box to the loss)
        mixed = train and isinstance(batch, dict)
        if mixed:
            rng = self.make_rng("mixup")
            r_lam, r_x, r_y, r_on = jax.random.split(rng, 4)
            lam = jax.random.beta(r_lam, 1.0, 1.0)
            cut = jnp.sqrt(1.0 - lam)
            cw = (cut * gw).astype(jnp.int32)
            ch = (cut * gh).astype(jnp.int32)
            cx = jax.random.randint(r_x, (), 0, gw)
            cy = jax.random.randint(r_y, (), 0, gh)
            x1 = jnp.clip(cx - cw // 2, 0, gw)
            x2 = jnp.clip(cx + cw // 2, 0, gw)
            y1 = jnp.clip(cy - ch // 2, 0, gh)
            y2 = jnp.clip(cy + ch // 2, 0, gh)
            on = (jax.random.uniform(r_on) < self.mix_prob)
            col = jnp.arange(gw)
            row = jnp.arange(gh)
            box = ((col >= x1) & (col < x2))[None, :] & ((row >= y1) & (row < y2))[:, None]
            box = box & on  # [gh, gw]
            x = jnp.where(box[None, :, :, None], x[::-1], x)
        x = x.reshape(n, gh * gw, self.embed_dim)

        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                               (1, 1, self.embed_dim), jnp.float32)
        pos = self.param("pos_embed", tinit.trunc_normal_(std=0.02),
                         (1, gh * gw + 1, self.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1) + pos.astype(x.dtype)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=False,
                      drop_path=float(dpr[i]), dtype=self.dtype,
                      name=f"blocks_{i}")(x, not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        head = nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=tinit.trunc_normal_(std=0.02), name="head")
        aux_head = nn.Dense(self.num_classes, dtype=self.dtype,
                            kernel_init=tinit.trunc_normal_(std=0.02), name="aux_head")
        cls_logits = head(x[:, 0]).astype(jnp.float32)
        aux_logits = aux_head(x[:, 1:]).astype(jnp.float32)

        if not train or not isinstance(batch, dict):
            return cls_logits + self.dense_weight * jnp.max(aux_logits, axis=1)

        labels = batch["label"]
        tv = batch["token_value"].astype(jnp.float32)   # [n, g, g, K]
        ti = batch["token_idx"]
        if mixed:
            tv = jnp.where(box[None, :, :, None], tv[::-1], tv)
            ti = jnp.where(box[None, :, :, None], ti[::-1], ti)
            lam_real = 1.0 - box.astype(jnp.float32).mean()
        else:
            lam_real = jnp.float32(1.0)
        tv = tv.reshape(n, gh * gw, -1)
        ti = ti.reshape(n, gh * gw, -1)

        # class loss: smoothed one-hot, mixed by the realized box area
        # (reference: lam * target_cls + (1-lam) * target_cls.flip(0))
        off = self.label_smoothing / self.num_classes
        onehot = jax.nn.one_hot(labels, self.num_classes) * (1.0 - self.label_smoothing) + off
        target_cls = lam_real * onehot + (1.0 - lam_real) * onehot[::-1]
        logp = jax.nn.log_softmax(cls_logits, axis=-1)
        loss_cls = -(target_cls * logp).sum(-1).mean()

        # aux token loss: gather log-softmax at the top-K label indices
        logp_aux = jax.nn.log_softmax(aux_logits, axis=-1)       # [n, N, C]
        picked = jnp.take_along_axis(logp_aux, ti, axis=-1)      # [n, N, K]
        loss_aux = -(tv * picked).sum(-1).mean()

        loss = self.cls_weight * loss_cls + self.dense_weight * loss_aux
        acc1 = (jnp.argmax(cls_logits, -1) == labels).astype(jnp.float32).mean()
        return {"loss": loss, "loss_cls": loss_cls, "loss_aux": loss_aux, "acc1": acc1}


for _name, _cfg in {
    # t2t_vit_* = performer T2T stages, t2t_vit_t_* = transformer T2T
    # stages (reference configs/t2t_vit/t2t_vit{,_t}_{14,19,24}.yaml)
    "t2t_vit_14": dict(embed_dim=384, depth=14, num_heads=6),
    "t2t_vit_19": dict(embed_dim=448, depth=19, num_heads=7),
    "t2t_vit_24": dict(embed_dim=512, depth=24, num_heads=8),
    "t2t_vit_t_14": dict(embed_dim=384, depth=14, num_heads=6, tokens_type="transformer"),
    "t2t_vit_t_19": dict(embed_dim=448, depth=19, num_heads=7, tokens_type="transformer"),
    "t2t_vit_t_24": dict(embed_dim=512, depth=24, num_heads=8, tokens_type="transformer"),
    "lvvit_s": dict(embed_dim=384, depth=16, num_heads=6),
    "lvvit_m": dict(embed_dim=512, depth=20, num_heads=8),
}.items():
    def _make(name=_name, cfg=_cfg):
        def factory(**kw):
            merged = dict(cfg)
            merged.update(kw)
            cls = LVViT if name.startswith("lvvit") else T2TViT
            return cls(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)
