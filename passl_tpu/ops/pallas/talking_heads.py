"""Fused talking-heads softmax Pallas kernel (CaiT hot path).

CaiT's TalkingHeadAttention (reference `passl/models/cait.py` TalkingHead
class) wraps the softmax with two 8x8 head-mixing projections:

    p = proj_w . softmax_k( proj_l . s )        (. = contraction over heads)

As three separate XLA ops the [n, h, q, k] score tensor makes ~6 HBM
round trips per block (mix1 read+write, softmax read+write, mix2
read+write) on top of the unavoidable QK-write / AV-read — at CaiT-s24
bs128 that is ~150 MB per pass, and the mixes are 8-wide matmuls with no
MXU value: pure bandwidth. This kernel does mix1 -> softmax -> mix2 in
ONE VMEM pass: read s once, write p once. The QK / AV matmuls stay in
XLA where the MXU already runs them well.

Layout: grid (n, q_tiles); each program holds all heads and the full k
row of a q tile in VMEM (softmax needs the whole k row; the head mixes
need all heads), so tiles are [h, q_t, k]. q_t is chosen so the f32
working set stays ~3 MB. The custom VJP recomputes the (cheap, in-VMEM)
forward inside the backward kernel instead of saving the mixed
probabilities — only the raw scores are kept alive.

Backward accumulates d(proj_l)/d(proj_w) across the sequential TPU grid
into a single revisited output block (zero-init at step 0); the q
padding introduced by the wrapper contributes nothing because padded
cotangent rows are zero.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_q_tile(h: int, q: int, k: int) -> int:
    """Largest q tile whose f32 [h, q_t, k] working set is ~<=3 MB."""
    budget = 3 * 1024 * 1024
    if h * q * k * 4 <= budget:
        return q
    for qt in (256, 128, 64, 32, 16, 8):
        if h * qt * k * 4 <= budget:
            return qt
    return 8


def _mix(w_t, x):  # x: [h, qt, k], w_t: [h(out), h(in)] -> [h(out), qt, k]
    h, qt, k = x.shape
    y = jax.lax.dot_general(w_t, x.reshape(h, qt * k), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.reshape(h, qt, k)


def _softmax_k(x):  # stable softmax over the trailing (k) axis
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(s_ref, wl_ref, ww_ref, out_ref):
    s = s_ref[0].astype(jnp.float32)                      # [h, qt, k]
    p_mid = _softmax_k(_mix(wl_ref[...].T, s))
    out_ref[0] = _mix(ww_ref[...].T, p_mid).astype(out_ref.dtype)


def _bwd_kernel(s_ref, dp_ref, wl_ref, ww_ref, ds_ref, dwl_ref, dww_ref):
    s = s_ref[0].astype(jnp.float32)                      # [h, qt, k]
    dp = dp_ref[0].astype(jnp.float32)
    wl = wl_ref[...].astype(jnp.float32)
    ww = ww_ref[...].astype(jnp.float32)
    h, qt, k = s.shape

    p_mid = _softmax_k(_mix(wl.T, s))                     # recompute fwd
    # p[g] = sum_h ww[h,g] p_mid[h]  =>  dp_mid[h] = sum_g ww[h,g] dp[g]
    dp_mid = _mix(ww, dp)
    ds_mid = p_mid * (dp_mid - jnp.sum(dp_mid * p_mid, axis=-1, keepdims=True))
    ds_ref[0] = _mix(wl, ds_mid).astype(ds_ref.dtype)

    # weight grads: contract over every (q, k) position, accumulate over
    # the sequential grid (same output block revisited each step)
    dwl = jax.lax.dot_general(s.reshape(h, qt * k), ds_mid.reshape(h, qt * k),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dww = jax.lax.dot_general(p_mid.reshape(h, qt * k), dp.reshape(h, qt * k),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dwl_ref[...] = jnp.zeros_like(dwl_ref)
        dww_ref[...] = jnp.zeros_like(dww_ref)

    dwl_ref[...] += dwl
    dww_ref[...] += dww


def _pad_q(x, qt):
    n, h, q, k = x.shape
    qp = -(-q // qt) * qt
    if qp == q:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, qp - q), (0, 0)))


@functools.cache
def _build(interpret: bool):
    @jax.custom_vjp
    def th_softmax(s, proj_l, proj_w):
        return _fwd(s, proj_l, proj_w)[0]

    def _fwd(s, proj_l, proj_w):
        n, h, q, k = s.shape
        qt = _pick_q_tile(h, q, k)
        sp = _pad_q(s, qt)
        qp = sp.shape[2]
        out = pl.pallas_call(
            _fwd_kernel,
            grid=(n, qp // qt),
            in_specs=[
                pl.BlockSpec((1, h, qt, k), lambda i, j: (i, 0, j, 0)),
                pl.BlockSpec((h, h), lambda i, j: (0, 0)),
                pl.BlockSpec((h, h), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, qt, k), lambda i, j: (i, 0, j, 0)),
            out_shape=jax.ShapeDtypeStruct((n, h, qp, k), s.dtype),
            interpret=interpret,
        )(sp, proj_l, proj_w)
        return out[:, :, :q], (s, proj_l, proj_w)

    def _bwd(res, dp):
        s, proj_l, proj_w = res
        n, h, q, k = s.shape
        qt = _pick_q_tile(h, q, k)
        sp = _pad_q(s, qt)
        dpp = _pad_q(dp, qt)  # zero rows -> zero dproj/ds contributions
        qp = sp.shape[2]
        ds, dwl, dww = pl.pallas_call(
            _bwd_kernel,
            grid=(n, qp // qt),
            in_specs=[
                pl.BlockSpec((1, h, qt, k), lambda i, j: (i, 0, j, 0)),
                pl.BlockSpec((1, h, qt, k), lambda i, j: (i, 0, j, 0)),
                pl.BlockSpec((h, h), lambda i, j: (0, 0)),
                pl.BlockSpec((h, h), lambda i, j: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, h, qt, k), lambda i, j: (i, 0, j, 0)),
                pl.BlockSpec((h, h), lambda i, j: (0, 0)),
                pl.BlockSpec((h, h), lambda i, j: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, h, qp, k), s.dtype),
                jax.ShapeDtypeStruct((h, h), jnp.float32),
                jax.ShapeDtypeStruct((h, h), jnp.float32),
            ],
            interpret=interpret,
        )(sp, dpp, proj_l, proj_w)
        return (ds[:, :, :q], dwl.astype(proj_l.dtype), dww.astype(proj_w.dtype))

    th_softmax.defvjp(_fwd, _bwd)
    return th_softmax


def talking_heads_softmax(s, proj_l, proj_w, *, interpret: bool = False):
    """p = proj_w-mix(softmax_k(proj_l-mix(s))) in one fused VMEM pass.

    s: [n, h, q, k] attention scores (pre-mix, already scaled).
    proj_l / proj_w: [h, h] talking-heads mixing weights
    (out[g] = sum_h w[h, g] in[h], matching the reference einsum
    `nhqk,hg->ngqk`). Differentiable in all three args via custom VJP.
    Returns p at s.dtype.
    """
    return _build(bool(interpret))(s, proj_l, proj_w)
