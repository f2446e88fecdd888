"""ToMe: token merging for ViT inference/training acceleration.

Capability parity with reference `passl/models/utils/tome.py` (302 LoC:
`bipartite_soft_matching`, ToMeBlock/ToMeAttention, `apply_patch:275`).
TPU-native re-design: the reference gathers/scatters with dynamic
shapes; here merging keeps **static shapes** (r tokens merged per
block, r fixed at trace time) using argsort-based selection and
segment-mean via one-hot matmuls, so the whole ToMe ViT stays one
compiled XLA program.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.layers import Mlp
from ...nn.norm import l2_normalize


def bipartite_soft_matching(metric: jnp.ndarray, r: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """metric: [N, L, C] token keys. Partition tokens into A (even) and
    B (odd); merge the r A-tokens most similar to some B-token into
    their match. Returns (dst_index [N, La] int32 — for each A token,
    the B token it merges into, or -1 to keep; merge_mask [N, La])."""
    n, l, c = metric.shape
    m = l2_normalize(metric.astype(jnp.float32), axis=-1)
    a, b = m[:, 0::2], m[:, 1::2]  # [N, La, C], [N, Lb, C]
    scores = jnp.einsum("nac,nbc->nab", a, b)
    best_b = jnp.argmax(scores, axis=-1)  # [N, La]
    best_score = jnp.max(scores, axis=-1)
    # pick the r highest-scoring A tokens to merge
    order = jnp.argsort(-best_score, axis=-1)
    rank = jnp.argsort(order, axis=-1)  # rank of each token by score
    merge_mask = rank < r
    return jnp.where(merge_mask, best_b, -1), merge_mask


def merge_tokens(x: jnp.ndarray, metric: jnp.ndarray, r: int,
                 size: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge r tokens of x [N, L, C] (size-weighted average, keeping
    static shape: merged A tokens are zero-size placeholders moved to
    the tail by a stable argsort). Returns (x', size')."""
    n, l, c = x.shape
    if size is None:
        size = jnp.ones((n, l), jnp.float32)
    dst, mask = bipartite_soft_matching(metric, r)
    la = (l + 1) // 2
    a_idx = jnp.arange(0, l, 2)
    b_idx = jnp.arange(1, l, 2)
    xa, xb = x[:, a_idx], x[:, b_idx]
    sa, sb = size[:, a_idx], size[:, b_idx]
    # scatter merged A mass into B via one-hot matmul (static shapes)
    lb = len(b_idx)
    onehot = jax.nn.one_hot(jnp.where(mask, dst, lb), lb + 1, dtype=jnp.float32)[..., :lb]
    add_x = jnp.einsum("nab,nac->nbc", onehot, xa * (sa * mask)[..., None])
    add_s = jnp.einsum("nab,na->nb", onehot, sa * mask)
    xb = (xb * sb[..., None] + add_x) / (sb + add_s)[..., None]
    sb = sb + add_s
    # keep un-merged A tokens; merged slots become zero-size sentinels
    keep = ~mask
    sa = sa * keep
    xa = xa * keep[..., None]
    x_out = jnp.concatenate([xb, xa], axis=1)
    s_out = jnp.concatenate([sb, sa], axis=1)
    return x_out, s_out


class ToMeAttention(nn.Module):
    """Attention returning the mean key as the merge metric, with
    proportional-attention (log size) bias (reference ToMeAttention)."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, size: Optional[jnp.ndarray] = None, deterministic: bool = True):
        n, l, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x).reshape(n, l, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * d**-0.5, k, preferred_element_type=jnp.float32)
        if size is not None:
            attn = attn + jnp.log(jnp.maximum(size, 1e-6))[:, None, None, :]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, l, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        metric = jnp.mean(k, axis=2)  # [N, L, d] mean over heads
        return out, metric


class ToMeBlock(nn.Module):
    num_heads: int
    r: int = 2
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, size=None, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        attn_out, metric = ToMeAttention(self.num_heads, self.dtype, name="attn")(
            y, size, deterministic)
        x = x + attn_out
        if self.r > 0:
            x, size = merge_tokens(x, metric, self.r, size)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden_features=int(x.shape[-1] * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(y, deterministic)
        return x + y, size
