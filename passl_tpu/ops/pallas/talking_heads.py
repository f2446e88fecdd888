"""Fused talking-heads softmax Pallas kernel (CaiT hot path).

CaiT's TalkingHeadAttention (reference `passl/models/cait.py` TalkingHead
class) wraps the softmax with two head-mixing projections:

    p = proj_w . softmax_k( proj_l . s )        (. = contraction over heads)

As three separate XLA ops the [n, h, q, k] score tensor makes ~6 HBM
round trips per block (mix1 read+write, softmax read+write, mix2
read+write) on top of the unavoidable QK-write / AV-read — at CaiT-s24
bs128 that is ~150 MB per pass, and the mixes are h-wide (8/16) matmuls
with no MXU value: pure bandwidth. This kernel does mix1 -> softmax ->
mix2 in ONE VMEM pass: read s once, write p once. The QK / AV matmuls
stay in XLA where the MXU already runs them well.

Mosaic notes: q/k tile shapes are not lane-multiples (196 for CaiT-224),
so the kernel avoids reshapes over the minor dims entirely — heads live
in a leading (untiled) axis, the h-wide mixes are unrolled
multiply-accumulates over per-head [q_t, k] tiles (h^2 <= 256 VPU tile
ops, VMEM-resident), and the mixing weights sit in SMEM for scalar
reads. The backward accumulates d(proj_l)/d(proj_w) as SMEM scalars
across the sequential TPU grid (zero-init at step 0); q padding added by
the wrapper contributes nothing because padded cotangent rows are zero.

Layout: grid (n, q_tiles); each program holds all heads and the full k
row of a q tile (softmax needs the whole k row, the mixes need all
heads). q_t keeps the f32 working set ~<=3 MB. The custom VJP recomputes
the (cheap, in-VMEM) forward inside the backward kernel instead of
saving the mixed probabilities — only the raw scores are kept alive.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_q_tile(h: int, q: int, k: int) -> int:
    """Largest q tile whose f32 [h, q_t, k] working set is ~<=3 MB."""
    budget = 3 * 1024 * 1024
    if h * q * k * 4 <= budget:
        return q
    for qt in (256, 128, 64, 32, 16, 8):
        if h * qt * k * 4 <= budget:
            return qt
    return 8


def _mix(w_ref, tiles, transpose: bool):
    """out[g] = sum_h w[h, g] tiles[h] (or w[g, h] when transpose).

    Unrolled over the tiny head dim: h^2 broadcast-FMA ops on [q_t, k]
    VMEM tiles — no reshape, no dot, nothing Mosaic can't lower.
    """
    h = len(tiles)
    out = []
    for g in range(h):
        acc = None
        for i in range(h):
            w = w_ref[g, i] if transpose else w_ref[i, g]
            term = tiles[i] * w
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def _softmax_tiles(tiles):
    out = []
    for t in tiles:
        m = jnp.max(t, axis=-1, keepdims=True)
        e = jnp.exp(t - m)
        out.append(e / jnp.sum(e, axis=-1, keepdims=True))
    return out


def _fwd_kernel(s_ref, wl_ref, ww_ref, out_ref, *, h):
    s = [s_ref[0, i].astype(jnp.float32) for i in range(h)]   # h x [qt, k]
    p_mid = _softmax_tiles(_mix(wl_ref, s, transpose=False))
    p = _mix(ww_ref, p_mid, transpose=False)
    for g in range(h):
        out_ref[0, g] = p[g].astype(out_ref.dtype)


def _bwd_kernel(s_ref, dp_ref, wl_ref, ww_ref, ds_ref, dwl_ref, dww_ref, *, h):
    s = [s_ref[0, i].astype(jnp.float32) for i in range(h)]
    dp = [dp_ref[0, i].astype(jnp.float32) for i in range(h)]

    p_mid = _softmax_tiles(_mix(wl_ref, s, transpose=False))  # recompute fwd
    # p[g] = sum_h ww[h,g] p_mid[h]  =>  dp_mid[h] = sum_g ww[h,g] dp[g]
    dp_mid = _mix(ww_ref, dp, transpose=True)
    ds_mid = []
    for g in range(h):
        dot = jnp.sum(dp_mid[g] * p_mid[g], axis=-1, keepdims=True)
        ds_mid.append(p_mid[g] * (dp_mid[g] - dot))
    ds = _mix(wl_ref, ds_mid, transpose=True)
    for i in range(h):
        ds_ref[0, i] = ds[i].astype(ds_ref.dtype)

    # weight grads: SMEM scalar accumulators over the sequential grid
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for i in range(h):
            for g in range(h):
                dwl_ref[i, g] = 0.0
                dww_ref[i, g] = 0.0

    for i in range(h):
        for g in range(h):
            dwl_ref[i, g] += jnp.sum(s[i] * ds_mid[g])
            dww_ref[i, g] += jnp.sum(p_mid[i] * dp[g])


def _pad_q(x, qt):
    n, h, q, k = x.shape
    qp = -(-q // qt) * qt
    if qp == q:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, qp - q), (0, 0)))


def _smem_spec(h):
    return pl.BlockSpec((h, h), lambda i, j: (0, 0), memory_space=pltpu.SMEM)


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
            functools.partial(_fwd_kernel, h=h),
            grid=(n, qp // qt),
            in_specs=[
                pl.BlockSpec((1, h, qt, k), lambda i, j: (i, 0, j, 0)),
                _smem_spec(h),
                _smem_spec(h),
            ],
            out_specs=pl.BlockSpec((1, h, qt, k), lambda i, j: (i, 0, j, 0)),
            out_shape=jax.ShapeDtypeStruct((n, h, qp, k), s.dtype),
            interpret=interpret,
        )(sp, proj_l.astype(jnp.float32), proj_w.astype(jnp.float32))
        return out[:, :, :q], (s, proj_l, proj_w)

    def _bwd(res, dp):
        s, proj_l, proj_w = res
        n, h, q, k = s.shape
        qt = _pick_q_tile(h, q, k)
        sp = _pad_q(s, qt)
        dpp = _pad_q(dp, qt)  # zero rows -> zero dproj/ds contributions
        qp = sp.shape[2]
        ds, dwl, dww = pl.pallas_call(
            functools.partial(_bwd_kernel, h=h),
            grid=(n, qp // qt),
            in_specs=[
                pl.BlockSpec((1, h, qt, k), lambda i, j: (i, 0, j, 0)),
                pl.BlockSpec((1, h, qt, k), lambda i, j: (i, 0, j, 0)),
                _smem_spec(h),
                _smem_spec(h),
            ],
            out_specs=[
                pl.BlockSpec((1, h, qt, k), lambda i, j: (i, 0, j, 0)),
                _smem_spec(h),
                _smem_spec(h),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, h, qp, k), s.dtype),
                jax.ShapeDtypeStruct((h, h), jnp.float32),
                jax.ShapeDtypeStruct((h, h), jnp.float32),
            ],
            interpret=interpret,
        )(sp, dpp, proj_l.astype(jnp.float32), proj_w.astype(jnp.float32))
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
