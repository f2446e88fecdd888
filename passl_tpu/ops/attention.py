"""Attention implementations for the transformer families.

Two interchangeable batched multi-head attention paths over `[n, l, h, d]`
q/k/v (the layout our Attention modules produce):

- ``einsum``: materialized scores + softmax. XLA fuses well; scores live
  in HBM at ``softmax_dtype`` precision. Reference-parity numerics
  (reference `passl/models/vision_transformer.py` Attention does exactly
  this matmul/softmax/matmul in Paddle).
- ``flash``: Pallas TPU flash-attention kernel
  (`jax.experimental.pallas.ops.tpu.flash_attention`) — online softmax,
  no score materialization, f32 accumulation inside the kernel. Sequence
  is padded to a multiple of 128 lanes and the padding masked via
  segment ids, so numerics match einsum to bf16 tolerance. Custom VJP
  (dq/dkv kernels) makes it trainable.

``resolve_attn_impl`` lets configs say ``attn_impl: flash`` while tests
and CPU runs transparently fall back to einsum (the kernel is
TPU-only); ``auto`` picks einsum everywhere in the vision zoo and only
switches to flash at multi-thousand-token sequences, the measured
crossover region (docs/benchmarks.md: einsum wins at seq 256 and 640).
"""
from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp

_LANES = 128
# auto->flash only above this seq len: einsum measured faster at every
# zoo length (<=640); flash's no-materialization win needs O(L^2) scores
# large enough to hurt XLA (multi-thousand tokens).
_FLASH_AUTO_MIN_SEQ = 4096


@functools.cache
def _tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon") or (
            jax.default_backend() not in ("cpu", "gpu")
        )
    except Exception:  # pragma: no cover - no backend at all
        return False


def resolve_attn_impl(impl: str, seq_len: int, attn_drop: float = 0.0,
                      deterministic: bool = True) -> str:
    """Map a config-level impl name to the one actually used for this call.

    flash requires: TPU backend, no attention-dropout this call (the
    kernel has no dropout support), and a sequence long enough that
    padding to 128 lanes doesn't dominate.
    """
    if impl not in ("einsum", "flash", "auto"):
        raise ValueError(f"unknown attn_impl {impl!r}")
    flash_ok = (
        _tpu_backend()
        and (deterministic or attn_drop == 0.0)
        and seq_len >= _LANES // 2 + 1  # pad overhead < ~2x
    )
    if impl == "flash":
        if not flash_ok:
            # explicit request downgraded — say why (trace-time only, so
            # this fires once per compile, not per step)
            import warnings

            reason = ("attention dropout is active (kernel has no dropout)"
                      if not (deterministic or attn_drop == 0.0)
                      else "non-TPU backend" if not _tpu_backend()
                      else f"sequence too short ({seq_len})")
            warnings.warn(f"attn_impl=flash falling back to einsum: {reason}",
                          stacklevel=2)
        return "flash" if flash_ok else "einsum"
    if impl == "auto":
        # Measured on v5e (docs/benchmarks.md): XLA einsum beats the Pallas
        # flash kernel at every vision-zoo sequence length (seq 256: 878 vs
        # 523 imgs/s; seq 640: 54.6 vs 28.3). Flash only pays once the
        # O(L^2) score matrix stops fitting/fusing well — multi-thousand
        # tokens — so `auto` picks einsum until that crossover.
        return "flash" if (flash_ok and seq_len >= _FLASH_AUTO_MIN_SEQ) else "einsum"
    return "einsum"


def resolve_remat_policy(name: str):
    """Map a config-level remat_policy name to a jax.checkpoint policy
    (shared by every backbone exposing the `remat`/`remat_policy` knobs)."""
    policies = {
        "nothing": None,  # save block inputs only (max memory savings)
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots": jax.checkpoint_policies.dots_saveable,
    }
    if name not in policies:
        raise ValueError(
            f"unknown remat_policy {name!r}; expected one of {sorted(policies)}")
    return policies[name]


def einsum_attention(q, k, v, scale: float, softmax_dtype: Any, out_dtype: Any):
    """[n, l, h, d] q/k/v -> [n, l, h*d]; scores at softmax_dtype."""
    n, l, h, d = q.shape
    acc = jnp.dtype(softmax_dtype) if isinstance(softmax_dtype, str) else softmax_dtype
    attn = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k,
                      preferred_element_type=acc)
    attn = jax.nn.softmax(attn, axis=-1).astype(out_dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, l, h * d)


def flash_attention(q, k, v, scale: float, out_dtype: Any):
    """Pallas TPU flash attention over [n, l, h, d] q/k/v -> [n, l, h*d].

    Pads seq to a 128 multiple; padded tokens get segment id 1 (real
    tokens 0) so they are invisible to real queries, and their outputs
    are sliced off.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    n, l, h, d = q.shape
    lp = -(-l // _LANES) * _LANES
    # kernel layout is [batch, heads, seq, head_dim]
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if lp != l:
        pad = ((0, 0), (0, 0), (0, lp - l), (0, 0))
        qt, kt, vt = jnp.pad(qt, pad), jnp.pad(kt, pad), jnp.pad(vt, pad)
        ids = (jnp.arange(lp) >= l).astype(jnp.int32)
        seg = _fa.SegmentIds(q=jnp.broadcast_to(ids, (n, lp)),
                             kv=jnp.broadcast_to(ids, (n, lp)))
    else:
        seg = None
    # vision shapes = short seq × huge batch: batch the grid's b dim so each
    # pallas program does enough work to cover launch overhead (block_b=1
    # default leaves n*h tiny programs -> 2x slower than einsum at l=256)
    bb = max(1, int(float(os.environ.get("PASSL_FLASH_BLOCK_B", "8"))))
    while n % bb:
        bb //= 2
    bb = max(bb, 1)
    blk = next(b for b in (512, 384, 256, 128) if lp % b == 0)
    bs = _fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk,
        block_b=bb,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk,
    )
    out = _fa.flash_attention(qt, kt, vt, segment_ids=seg, sm_scale=scale,
                              block_sizes=bs)
    out = out[:, :, :l, :].astype(out_dtype)
    return jnp.swapaxes(out, 1, 2).reshape(n, l, h * d)


def multi_head_attention(q, k, v, scale: float, *, impl: str = "einsum",
                         softmax_dtype: Any = jnp.float32,
                         out_dtype: Any | None = None):
    """Dispatch to the resolved attention implementation.

    q/k/v: [n, l, h, d]. Returns [n, l, h*d] at out_dtype (default
    q.dtype). `impl` must already be resolved ("einsum" | "flash") —
    call resolve_attn_impl at module level so jit sees a static choice.
    """
    out_dtype = out_dtype or q.dtype
    if impl == "flash":
        return flash_attention(q, k, v, scale, out_dtype)
    return einsum_attention(q, k, v, scale, softmax_dtype, out_dtype)
