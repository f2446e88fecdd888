"""Fused (packed-)window attention Pallas kernel — the Swin hot path.

Swin's windowed attention (reference `passl/models/swin_transformer.py`
WindowAttention: qk matmul + relative-position bias + shift mask +
softmax + av matmul) runs on 49-token windows — a pathological shape
for both the 128x128 MXU and XLA's instance scheduling. Round-3
measurements (docs/benchmarks.md): the per-window einsums alone cost
47% of a Swin-B train step at <2 TFLOP/s effective, and the lane-packing
workaround (`win_pack=2`) still round-trips the packed [B, h, 98, 98]
score tensor through HBM at softmax precision several times per block.

This kernel computes the WHOLE attention — s = q k^T * scale + bias +
mask, p = softmax(s), out = p v — in one VMEM pass per window tile:

- q/k/v are read once, out written once; scores/probabilities never
  touch HBM. Softmax runs in f32 regardless of the model dtype, so the
  fused path matches the f32-softmax XLA chain's accuracy (verified
  on-chip at every Swin-B stage shape vs a CPU f32 ground truth) and
  is ~2x more accurate than the bf16-softmax chain.
- It composes with the model's window packing: at `win_pack=2` each
  dot is [98, 32] x [32, 98] / [98, 98] x [98, 32] — 98 <= 128 in every
  MXU dimension, so ONE systolic pass covers two windows and the
  block-diagonal "wasted" flops are free padding. (At g=4 the 196-wide
  dims spill to 4 passes — the measured win_pack=4 negative.)
- The additive bias argument is differentiable (custom VJP accumulates
  d(bias) across the sequential TPU grid into a revisited output
  block), so the relative-position-bias table trains exactly as in the
  einsum path; the shift/pack mask is a trace-time constant and gets no
  gradient.

**Measured outcome on v5e: a perf NEGATIVE — explicit opt-in only.**
Swin-B bs128 train step: fused 321 imgs/s vs einsum-f32 420 vs
einsum-bf16 501. Four layout variants were measured (interleaved
[B,h,L,d]; phase-separated dots/softmax/dots; lane-packed [B,L,h*d];
transposed [B,C,L]) — see docs/benchmarks.md negative-results table
for the per-stage numbers and the mechanism (XLA's batched einsum at
win_pack=2 already sits near its bandwidth floor; the kernel's saved
score-tensor HBM trips are smaller than its per-dot issue/relayout
overhead on d=32 heads). Kept in-tree with full tests as the
documented dead-end, the same contract as `win_pack=4`.

Layout notes: the trailing [L, d] / [L, L] tiles are not lane-multiples
(98 or 49); Mosaic pads them per tile. Heads and windows live in
leading (untiled) axes and are unrolled Python loops sized so W*h stays
a small constant. The backward recomputes s and p in-VMEM (flash-style)
instead of saving them — only q/k/v stay alive between passes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# unroll budget: W (windows per grid program) is chosen so W * heads
# stays around this many fused dot pairs per program. 16 keeps the
# backward kernel's per-iteration f32 [98, 98] temporaries (s/p/dp/ds,
# ~230 KB each set) inside the 16 MB VMEM scoped-stack limit — 32
# measured 256 KB over on v5e at the Swin stage-1 shape.
_UNROLL = 16
_NEG = -1e9


def _pick_w(b: int, h: int, n_mask: int) -> int:
    """Windows per program: largest divisor of b with w*h <= _UNROLL,
    additionally dividing n_mask when the mask is per-window."""
    w = max(1, _UNROLL // h)
    while w > 1 and (b % w or (n_mask > 1 and n_mask % w)):
        w -= 1
    return w


def _attend(q, k, v, add, scale, dot_dtype):
    """One window's fused attention. q/k/v [l, d] at their native dtype
    (bf16 dots run the MXU in fast bf16-in/f32-accumulate mode; casting
    to f32 first measured 1.5x slower end-to-end), softmax in f32,
    probabilities cast back to `dot_dtype` for the AV pass."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * scale + add
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(dot_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return o, p


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                w, h, n_mask, scale):
    dd = q_ref.dtype
    for j in range(w):
        madd = mask_ref[j if n_mask >= w else j % n_mask].astype(jnp.float32)
        for head in range(h):
            add = bias_ref[head] + madd
            o, _ = _attend(q_ref[j, head], k_ref[j, head], v_ref[j, head],
                           add, scale, dd)
            out_ref[j, head] = o.astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, w, h, n_mask, scale):
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dd = q_ref.dtype
    for j in range(w):
        madd = mask_ref[j if n_mask >= w else j % n_mask].astype(jnp.float32)
        for head in range(h):
            q = q_ref[j, head]
            k = k_ref[j, head]
            v = v_ref[j, head]
            do = do_ref[j, head]
            add = bias_ref[head] + madd
            _, p = _attend(q, k, v, add, scale, dd)
            pd = p.astype(dd)
            # dv = p^T do   [l_k, d]
            dv = jax.lax.dot_general(
                pd, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dp = do v^T   [l_q, l_k]
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsd = (ds * scale).astype(dd)
            dq = jax.lax.dot_general(
                dsd, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                dsd, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_ref[j, head] = dq.astype(dq_ref.dtype)
            dk_ref[j, head] = dk.astype(dk_ref.dtype)
            dv_ref[j, head] = dv.astype(dv_ref.dtype)
            dbias_ref[head] += ds


def _mask_spec(n_mask: int, w: int, l_q: int, l_k: int):
    if n_mask >= w:
        # per-window mask, cycling over within-image window groups
        return pl.BlockSpec((w, l_q, l_k),
                            lambda i: (i % (n_mask // w), 0, 0))
    return pl.BlockSpec((n_mask, l_q, l_k), lambda i: (0, 0, 0))


@functools.cache
def _build(w: int, h: int, l_q: int, l_k: int, d: int, n_mask: int,
           scale: float, interpret: bool):
    fwd_k = functools.partial(_fwd_kernel, w=w, h=h, n_mask=n_mask,
                              scale=scale)
    bwd_k = functools.partial(_bwd_kernel, w=w, h=h, n_mask=n_mask,
                              scale=scale)

    qkv_spec = pl.BlockSpec((w, h, l_q, d), lambda i: (i, 0, 0, 0))
    kv_spec = pl.BlockSpec((w, h, l_k, d), lambda i: (i, 0, 0, 0))
    bias_spec = pl.BlockSpec((h, l_q, l_k), lambda i: (0, 0, 0))
    mspec = _mask_spec(n_mask, w, l_q, l_k)

    @jax.custom_vjp
    def call(q, k, v, bias, mask):
        return _fwd(q, k, v, bias, mask)[0]

    def _fwd(q, k, v, bias, mask):
        b = q.shape[0]
        out = pl.pallas_call(
            fwd_k,
            grid=(b // w,),
            in_specs=[qkv_spec, kv_spec, kv_spec, bias_spec, mspec],
            out_specs=qkv_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, l_q, d), q.dtype),
            interpret=interpret,
        )(q, k, v, bias, mask)
        return out, (q, k, v, bias, mask)

    def _bwd(res, do):
        q, k, v, bias, mask = res
        b = q.shape[0]
        dq, dk, dv, dbias = pl.pallas_call(
            bwd_k,
            grid=(b // w,),
            in_specs=[qkv_spec, kv_spec, kv_spec, bias_spec, mspec,
                      qkv_spec],
            out_specs=[qkv_spec, kv_spec, kv_spec,
                       # constant index map: the block stays VMEM-resident
                       # across the sequential grid and is copied out once,
                       # so += accumulation over programs is well-defined
                       pl.BlockSpec((h, l_q, l_k), lambda i: (0, 0, 0))],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, l_q, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, l_k, d), k.dtype),
                jax.ShapeDtypeStruct((b, h, l_k, d), v.dtype),
                jax.ShapeDtypeStruct((h, l_q, l_k), jnp.float32),
            ],
            interpret=interpret,
        )(q, k, v, bias, mask, do)
        return dq, dk, dv, dbias.astype(bias.dtype), None

    call.defvjp(_fwd, _bwd)
    return call


def fused_window_attention(q, k, v, bias, mask=None, *, scale=None,
                           interpret: bool = False):
    """out = softmax(q k^T * scale + bias + mask) v, fused in VMEM.

    q:    [B, h, L_q, d]   (B = window groups; L_q = pack * ws^2)
    k, v: [B, h, L_k, d]   (L_k == L_q for Swin; kept general)
    bias: [h, L_q, L_k]    f32, differentiable (packed relative-position
                           bias, kron(I_pack, table-gather) — built by
                           the model exactly as in the einsum path)
    mask: [nWm, L_q, L_k]  f32 trace-time constant, non-differentiable
                           (block-diagonal pack mask + shifted-window
                           mask, reference swin mask path). nWm must be
                           1 (same mask for all groups) or divide B with
                           B laid out [images, nWm] row-major. None -> 0.
    Returns [B, h, L_q, d] at q.dtype.
    """
    b, h, l_q, d = q.shape
    l_k = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if mask is None:
        mask = jnp.zeros((1, l_q, l_k), jnp.float32)
    if isinstance(mask, np.ndarray):
        mask = jnp.asarray(mask, jnp.float32)
    n_mask = mask.shape[0]
    assert b % n_mask == 0, (b, n_mask)
    w = _pick_w(b, h, n_mask)
    fn = _build(w, h, l_q, l_k, d, n_mask, float(scale), bool(interpret))
    return fn(q, k, v, bias.astype(jnp.float32), mask)
