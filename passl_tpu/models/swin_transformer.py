"""Swin Transformer.

Capability parity with reference `passl/models/swin_transformer.py`
(824 LoC: windowed attention with relative position bias, shifted
windows with attention masking, patch merging, stochastic depth;
tiny/small/base/large variants) and the v110 backbone twin.

TPU-native: NHWC window partitioning is pure reshape/transpose (no
data movement after XLA fusion); the shifted-window attention mask and
relative-position index are *numpy constants* baked at trace time, so
the hot graph has zero dynamic indexing.

Packed window attention (`win_pack`, default 2): 49-token windows are a
pathological shape for the 128x128 MXU and the (8,128) vector tiles —
measured on v5e, the per-window qk/av einsums alone cost 47% of a
Swin-B train step at <2 TFLOP/s effective. Packing `g` windows into one
attention call (sequence 49 -> g*49) with a block-diagonal additive
mask halves the matmul instance count and fills the lane dimension;
off-diagonal (cross-window) logits get the same -100 additive mask the
reference uses for shifted windows, so softmax output is numerically
identical in f32 (exp(-100) flushes against the real denominator).
Measured Swin-B bs128 train step: g=1 396 ms -> g=2 307 ms (f32
softmax) -> 258 ms (g=2 + bf16 softmax, matching the precision of the
reference's fp16-O2 recipe, whose Paddle softmax also runs in fp16).
`softmax_dtype: bfloat16` opts into the latter.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import init as tinit
from ..nn.layers import DropPath, Mlp
from .base import MODELS, Model, register_model


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = x.reshape(n, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    n = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(n, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))  # [2, ws, ws]
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, ws^2, ws^2]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [ws^2, ws^2]


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> Optional[np.ndarray]:
    if shift == 0:
        return None
    img_mask = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)  # [nW, ws^2, ws^2]


def _packed_attn_mask(h: int, w: int, ws: int, shift: int, g: int) -> Optional[np.ndarray]:
    """Block-diagonal mask for `g` windows packed into one attention call.

    Returns [nW/g, g*ws^2, g*ws^2] (numpy, trace-time constant): the
    per-window shift mask on the diagonal blocks, -100 off-diagonal so
    cross-window attention is suppressed exactly like the reference's
    shifted-window masking (`passl/models/swin_transformer.py` mask path).
    None when g == 1 and there is no shift mask.
    """
    mask = _shift_attn_mask(h, w, ws, shift)
    if g == 1:
        return mask
    nw = (h // ws) * (w // ws)
    l = ws * ws
    packed = np.full((nw // g, g * l, g * l), -100.0, np.float32)
    for i in range(g):
        sl = slice(i * l, (i + 1) * l)
        if mask is not None:
            packed[:, sl, sl] = mask.reshape(nw // g, g, l, l)[:, i]
        else:
            packed[:, sl, sl] = 0.0
    return packed


def resolve_window_impl(impl: str, attn_drop: float = 0.0,
                        deterministic: bool = True) -> str:
    """Map `attn_impl` to the path used this call (CaiT th_impl contract:
    explicit fused on the wrong backend/config downgrades loudly).

    `auto` resolves to einsum everywhere: the fused Pallas kernel is a
    measured NEGATIVE on v5e (Swin-B bs128 step 321 vs einsum-f32 420 vs
    einsum-bf16 501 imgs/s; three kernel layouts tried — see
    docs/benchmarks.md negative-results table). It stays in-tree as an
    explicit opt-in research path; unlike CaiT's talking-heads (where
    fused wins 29%), XLA's batched einsum at win_pack=2 is already near
    its bandwidth floor on these window shapes."""
    from ..ops.attention import _tpu_backend

    if impl not in ("einsum", "fused", "auto"):
        raise ValueError(f"unknown Swin attn_impl {impl!r}")
    fused_ok = _tpu_backend() and (deterministic or attn_drop == 0.0)
    if impl == "auto":
        return "einsum"
    if impl == "fused" and not fused_ok:
        import warnings

        reason = ("attention dropout is active (kernel has no dropout)"
                  if not (deterministic or attn_drop == 0.0)
                  else "non-TPU backend")
        warnings.warn(f"Swin attn_impl=fused falling back to einsum: "
                      f"{reason}", stacklevel=2)
        return "einsum"
    return impl


class WindowAttention(nn.Module):
    """Window attention over `pack` windows per call (block-diag masked).

    With pack > 1, x is [batch*groups, pack*ws^2, C] and `mask` is the
    packed block-diagonal mask from `_packed_attn_mask`. The relative
    position bias is shared by every window, so its packed form is
    kron(I_pack, bias) — built once per call from the same (2ws-1)^2
    table the reference uses, parameter shape unchanged.

    attn_impl="fused" routes qk+bias+mask+softmax+av through the fused
    Pallas kernel (`ops/pallas/window_attention.py`): scores never touch
    HBM and softmax runs f32 regardless of `softmax_dtype`.
    """

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    pack: int = 1
    # lane padding: round the attention sequence up to a multiple of this
    # (canonically 128, the TPU vector-lane width / MXU edge) by zero-
    # padding q/k/v AFTER the qkv projection and masking padded keys at
    # -100 (exactly the reference's shift-mask constant, so softmax is
    # numerically identical — exp(-100) flushes against the real
    # denominator). The packed win_pack=2 sequence is 98, a poor lane
    # fit; 98→128 trades +30% score flops for aligned tiles, the same
    # trade the ViT micro experiment measured as a win at 197→256
    # (docs/benchmarks.md Micro table). 0 = off.
    lane_pad: int = 0
    dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    attn_impl: str = "einsum"
    attn_interpret: bool = False  # pallas interpret mode (CPU tests)

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None, deterministic: bool = True):
        b, lg, c = x.shape  # b = batch*window-groups, lg = pack*ws^2
        h = self.num_heads
        head_dim = c // h
        scale = head_dim**-0.5
        acc = self.softmax_dtype
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=tinit.trunc_normal_(std=0.02), name="qkv")(x)
        qkv = qkv.reshape(b, lg, 3, h, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        ws = self.window_size
        l = ws * ws
        table = self.param("relative_position_bias_table", tinit.trunc_normal_(std=0.02),
                           ((2 * ws - 1) * (2 * ws - 1), h), jnp.float32)
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = table[idx].reshape(l, l, h).transpose(2, 0, 1)  # [h, l, l]
        if self.pack > 1:
            eye = jnp.eye(self.pack, dtype=bias.dtype)
            bias = jax.vmap(lambda bb: jnp.kron(eye, bb))(bias)  # [h, lg, lg]

        impl = (resolve_window_impl(self.attn_impl, self.attn_drop, deterministic)
                if not self.attn_interpret else "fused")
        if impl == "fused":
            from ..ops.pallas.window_attention import fused_window_attention

            out = fused_window_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), bias, mask, scale=scale,
                interpret=self.attn_interpret)
            out = out.transpose(0, 2, 1, 3).reshape(b, lg, c)
        else:
            lp = lg
            if self.lane_pad and lg % self.lane_pad:
                lp = ((lg + self.lane_pad - 1) // self.lane_pad) * self.lane_pad
                pad = lp - lg
                q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
                k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
                v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
                # padded keys die in the bias (-100, the shift-mask
                # constant); padded query rows are sliced away below
                bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
                bias = bias - jnp.where(jnp.arange(lp) >= lg, 100.0,
                                        0.0)[None, None, :]
                if mask is not None:
                    mask = np.pad(np.asarray(mask),
                                  ((0, 0), (0, pad), (0, pad)))
            attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=acc)
            attn = attn + bias[None].astype(acc)
            if mask is not None:
                nw = mask.shape[0]
                m = jnp.asarray(mask)
                attn = attn.reshape(b // nw, nw, h, lp, lp) + m[None, :, None, :, :].astype(acc)
                attn = attn.reshape(b, h, lp, lp)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)[:, :lg].reshape(b, lg, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=tinit.trunc_normal_(std=0.02), name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    win_pack: int = 2
    lane_pad: int = 0
    dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    attn_impl: str = "einsum"
    attn_interpret: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hres, wres = self.input_resolution
        ws = self.window_size
        shift = self.shift_size
        if min(hres, wres) <= ws:
            # window covers the whole feature map → no shifting needed
            ws = min(hres, wres)
            shift = 0
        n, l, c = x.shape
        nwin = (hres // ws) * (wres // ws)
        g = max(1, min(self.win_pack, nwin))
        while nwin % g:
            g -= 1
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(n, hres, wres, c)
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        windows = window_partition(x, ws)
        if g > 1:
            windows = windows.reshape(n * nwin // g, g * ws * ws, c)
        mask = _packed_attn_mask(hres, wres, ws, shift, g)
        attn_out = WindowAttention(self.dim, ws, self.num_heads, self.qkv_bias,
                                   self.attn_drop, self.drop, pack=g,
                                   lane_pad=self.lane_pad,
                                   dtype=self.dtype, softmax_dtype=self.softmax_dtype,
                                   attn_impl=self.attn_impl,
                                   attn_interpret=self.attn_interpret,
                                   name="attn")(windows, mask, deterministic)
        if g > 1:
            attn_out = attn_out.reshape(n * nwin, ws * ws, c)
        x = window_reverse(attn_out, ws, hres, wres)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = x.reshape(n, l, c)
        x = shortcut + DropPath(self.drop_path, name="dp1")(x, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(c * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
                name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path, name="dp2")(y, deterministic=deterministic)


class PatchMerging(nn.Module):
    input_resolution: Tuple[int, int]
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        n, l, c = x.shape
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, (h // 2) * (w // 2), 4 * c)
        # concat order (x0,x1,x2,x3) = (0::2,0::2),(1::2,0::2),(0::2,1::2),(1::2,1::2)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        kernel_init=tinit.trunc_normal_(std=0.02), name="reduction")(x)


@register_model
class SwinTransformer(Model):
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False  # absolute position embedding
    patch_norm: bool = True
    num_classes: int = 1000
    win_pack: int = 2
    lane_pad: int = 0  # round attn sequence up to this multiple (128 = TPU lanes)
    softmax_dtype: Any = "float32"
    attn_impl: str = "einsum"  # "einsum" | "fused" (pallas) | "auto"
    attn_interpret: bool = False  # pallas interpret mode (CPU tests)
    remat: bool = False  # activation recompute per SwinBlock
    remat_policy: str = "nothing"  # "nothing" | "dots_no_batch" | "dots"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        softmax_dtype = (jnp.dtype(self.softmax_dtype)
                         if isinstance(self.softmax_dtype, str) else self.softmax_dtype)
        n = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID", dtype=self.dtype,
                    kernel_init=tinit.trunc_normal_(std=0.02), name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.embed_dim)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        if self.ape:
            ape = self.param("absolute_pos_embed", tinit.trunc_normal_(std=0.02),
                             (1, gh * gw, self.embed_dim), jnp.float32)
            x = x + ape.astype(x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=not train)

        if self.remat:
            from ..ops.attention import resolve_remat_policy

            BlockCls = nn.remat(SwinBlock, static_argnums=(2,),
                                policy=resolve_remat_policy(self.remat_policy))
        else:
            BlockCls = SwinBlock

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        res = (gh, gw)
        dim = self.embed_dim
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = BlockCls(
                    dim=dim, input_resolution=res, num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if j % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path=float(dpr[cur]), win_pack=self.win_pack,
                    lane_pad=self.lane_pad,
                    dtype=self.dtype, softmax_dtype=softmax_dtype,
                    attn_impl=self.attn_impl, attn_interpret=self.attn_interpret,
                    name=f"layers_{i}_blocks_{j}",
                )(x, not train)  # positional: remat static_argnums=(2,)
                cur += 1
            if i < len(self.depths) - 1:
                x = PatchMerging(res, dim, self.dtype, name=f"layers_{i}_downsample")(x)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        feats = jnp.mean(x, axis=1)
        if self.num_classes > 0:
            feats = nn.Dense(self.num_classes, dtype=self.dtype,
                             kernel_init=tinit.trunc_normal_(std=0.02), name="head")(feats)
        return feats


_SWIN = {
    "swin_tiny_patch4_window7_224": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_small_patch4_window7_224": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swin_base_patch4_window7_224": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swin_base_patch4_window12_384": dict(img_size=384, window_size=12, embed_dim=128,
                                          depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swin_large_patch4_window7_224": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
    # reference huge/giant recipes (configs/swin_transformer/
    # SwinTransformer_{huge,giant}_patch4_window7_224.yaml; the
    # reference marks them "version: 2" but ships no SwinV2 blocks —
    # these use the same windowed attention at the published dims)
    "swin_huge_patch4_window7_224": dict(embed_dim=354, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
    "swin_giant_patch4_window7_224": dict(embed_dim=512, depths=(2, 2, 42, 2), num_heads=(8, 16, 32, 64)),
}

for _name, _cfg in _SWIN.items():
    def _make(cfg=_cfg):
        def factory(**kw):
            merged = dict(cfg)
            merged.update(kw)
            return SwinTransformer(**merged)

        return factory

    _f = _make()
    _f.__name__ = _name
    MODELS.register(_f, name=_name)
