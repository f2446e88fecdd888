"""Fused augmentation Pallas kernel (north star, SURVEY §7 stage 7).

One VMEM pass per image: uint8 → float, per-sample gaussian blur
(separable, edge-renormalized), per-sample solarize, normalize →
bf16 — the BYOL on-device recipe (reference BYOL.py:36-153) as ONE
kernel instead of a chain of HBM round-trips. Per-sample randomness
comes from the on-core PRNG seeded with (host_seed, program_id).

Layout: images are processed as [H, W*C] tiles (channels interleaved
in the lane dimension), so a 1-pixel spatial shift along W is a 3-lane
`pltpu.roll`; H shifts roll the sublane dimension. Blur edge handling
renormalizes by the accumulated in-bounds kernel mass (matches PIL's
normalized edge behavior closely).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _uniform_from_bits(bits):
    # random bits → [0, 1) float32 via the low 24 bits (mosaic lacks a
    # direct u32→f32 cast; int32 of a 24-bit value is exact in f32)
    i32 = pltpu.bitcast(bits, jnp.int32) & 0xFFFFFF
    return i32.astype(jnp.float32) * (1.0 / 16777216.0)


def _augment_kernel(
    seed_ref,  # scalar prefetch: [1] int32
    img_ref,  # [1, H, WC] uint8 block (one image)
    out_ref,  # [1, H, WC] bf16
    *,
    h: int,
    w: int,
    c: int,
    taps: int,
    blur_prob: float,
    solarize_prob: float,
    sigma_min: float,
    sigma_max: float,
    solarize_threshold: float,
    mean: Tuple[float, ...],
    std: Tuple[float, ...],
):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    wc = w * c

    # uint8 → int32 → float32 (mosaic lacks a direct u8→f32 cast)
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)  # [H, WC]

    # ---- per-sample random draws (3 scalars from one 8x128 tile)
    rnd = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((8, 128)), jnp.uint32))
    sigma = sigma_min + (sigma_max - sigma_min) * rnd[0, 0]
    do_blur = rnd[0, 1] < blur_prob
    do_solarize = rnd[0, 2] < solarize_prob

    # ---- separable gaussian blur as two MXU matmuls with banded blur
    # matrices built in-register (edge-renormalized rows/cols). This is
    # the TPU-native formulation: the systolic array does the taps, not
    # per-tap vector rolls.
    r = taps // 2
    inv_2s2 = 0.5 / jnp.square(jnp.maximum(sigma, 1e-3))

    # vertical: out[j, :] = sum_i Kh[j, i] x[i, :], Kh banded gaussian
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    dv = (ri - ci).astype(jnp.float32)
    kh = jnp.where(jnp.abs(ri - ci) <= r, jnp.exp(-jnp.square(dv) * inv_2s2), 0.0)
    kh = kh / jnp.sum(kh, axis=1, keepdims=True)
    xv = jnp.dot(kh, x, preferred_element_type=jnp.float32)

    # horizontal over interleaved lanes: K[i, j] couples pixel i//c with
    # pixel j//c only when channels match (i%c == j%c)
    ri2 = jax.lax.broadcasted_iota(jnp.int32, (wc, wc), 0)
    ci2 = jax.lax.broadcasted_iota(jnp.int32, (wc, wc), 1)
    dpix = (ri2 // c - ci2 // c).astype(jnp.float32)
    same_ch = (ri2 % c) == (ci2 % c)
    kw = jnp.where(same_ch & (jnp.abs(dpix) <= r), jnp.exp(-jnp.square(dpix) * inv_2s2), 0.0)
    kw = kw / jnp.sum(kw, axis=0, keepdims=True)
    blurred = jnp.dot(xv, kw, preferred_element_type=jnp.float32)

    x = jnp.where(do_blur, blurred, x)

    # ---- solarize
    sol = jnp.where(x >= solarize_threshold, 1.0 - x, x)
    x = jnp.where(do_solarize, sol, x)

    # ---- normalize: per-channel constants selected by lane (inline
    # scalar `where` chain — pallas kernels cannot capture array consts)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (h, wc), 1)
    ch = lane_ids % c
    mean_arr = jnp.full((h, wc), mean[-1], jnp.float32)
    inv_std_arr = jnp.full((h, wc), 1.0 / std[-1], jnp.float32)
    for k in range(c - 1):
        mean_arr = jnp.where(ch == k, mean[k], mean_arr)
        inv_std_arr = jnp.where(ch == k, 1.0 / std[k], inv_std_arr)
    out_ref[0] = ((x - mean_arr) * inv_std_arr).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("blur_prob", "solarize_prob", "taps", "sigma_range",
                     "solarize_threshold", "mean", "std", "interpret"),
)
def fused_augment(
    images: jnp.ndarray,  # [N, H, W, C] uint8
    seed: jnp.ndarray,  # scalar int32
    *,
    blur_prob: float = 1.0,
    solarize_prob: float = 0.0,
    taps: int = 23,
    sigma_range: Tuple[float, float] = (0.1, 2.0),
    solarize_threshold: float = 0.5,
    mean: Tuple[float, ...] = IMAGENET_MEAN,
    std: Tuple[float, ...] = IMAGENET_STD,
    interpret: bool = False,
) -> jnp.ndarray:
    n, h, w, c = images.shape
    wc = w * c
    imgs = images.reshape(n, h, wc)
    kernel = functools.partial(
        _augment_kernel,
        h=h, w=w, c=c, taps=taps,
        blur_prob=blur_prob, solarize_prob=solarize_prob,
        sigma_min=sigma_range[0], sigma_max=sigma_range[1],
        solarize_threshold=solarize_threshold, mean=tuple(mean), std=tuple(std),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, wc), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, wc), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    # CPU tests: the TPU-semantics interpreter (plain interpret=True
    # lacks the TPU PRNG primitives)
    interp = pltpu.InterpretParams() if interpret else False
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interp,
    )(jnp.asarray(seed, jnp.int32).reshape(1), imgs)
    return out.reshape(n, h, w, c)
