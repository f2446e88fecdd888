"""On-device batched augmentation (pure JAX ops, XLA-fused).

Capability parity with reference `passl_v110/modeling/architectures/
BYOL.py:36-153` — the reference's only GPU-side augmentation: batched
gaussian blur (separable conv2d), solarize, normalize, with per-sample
Bernoulli apply-masks — generalized here into a device-side aug toolkit
any method can use (`device_augment` config). Host pipelines ship uint8
NHWC; everything after the host→device copy is inside the jitted step.

Design notes (TPU):
 - per-sample randomness comes from one folded key per op;
 - blur uses a *shared* max-size separable kernel bank built from
   per-sample sigmas → two depthwise convs (einsum over taps), which
   XLA maps onto the VPU/MXU without per-sample loops;
 - all ops take/return float32 in [0,1] unless noted.

The Pallas fused decode-free pipeline (crop+flip+jitter+blur+solarize+
normalize in one VMEM pass) layers on top in `ops/pallas/`.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def to_float(x: jnp.ndarray) -> jnp.ndarray:
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def normalize(x: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def _per_sample_mask(rng, n: int, prob: float) -> jnp.ndarray:
    return jax.random.bernoulli(rng, prob, (n, 1, 1, 1))


def random_horizontal_flip(x: jnp.ndarray, rng, prob: float = 0.5) -> jnp.ndarray:
    mask = _per_sample_mask(rng, x.shape[0], prob)
    return jnp.where(mask, x[:, :, ::-1, :], x)


def solarize(x: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    return jnp.where(x >= threshold, 1.0 - x, x)


def random_solarize(x: jnp.ndarray, rng, prob: float = 0.2, threshold: float = 0.5) -> jnp.ndarray:
    mask = _per_sample_mask(rng, x.shape[0], prob)
    return jnp.where(mask, solarize(x, threshold), x)


def _banded_blur_matrix(sigmas: jnp.ndarray, size: int, taps: int) -> jnp.ndarray:
    """[N, size, size] row-normalized banded gaussian operators (the
    MXU-native blur formulation — same as the Pallas kernel)."""
    r = taps // 2
    d = (jnp.arange(size)[:, None] - jnp.arange(size)[None, :]).astype(jnp.float32)
    band = jnp.abs(d) <= r
    k = jnp.exp(-0.5 * (d[None] / jnp.maximum(sigmas, 1e-3)[:, None, None]) ** 2)
    k = jnp.where(band[None], k, 0.0)
    return k / jnp.sum(k, axis=2, keepdims=True)


def gaussian_blur(x: jnp.ndarray, sigmas: jnp.ndarray, taps: int = 23) -> jnp.ndarray:
    """Separable per-sample blur as two batched banded matmuls
    (edge-renormalized, matching PIL's normalized edge behavior).
    x: [N,H,W,C] float, sigmas: [N]."""
    n, h, w, c = x.shape
    kh = _banded_blur_matrix(sigmas, h, taps)  # [N, H, H]
    x = jnp.einsum("nij,njwc->niwc", kh, x.astype(jnp.float32))
    if w == h:
        kw = kh
    else:
        kw = _banded_blur_matrix(sigmas, w, taps)
    return jnp.einsum("nwj,nhjc->nhwc", kw, x)


def random_gaussian_blur(
    x: jnp.ndarray, rng, prob: float = 0.5, sigma_range: Tuple[float, float] = (0.1, 2.0), taps: int = 23
) -> jnp.ndarray:
    k1, k2 = jax.random.split(rng)
    sig = jax.random.uniform(k1, (x.shape[0],), minval=sigma_range[0], maxval=sigma_range[1])
    blurred = gaussian_blur(x, sig, taps)
    mask = _per_sample_mask(k2, x.shape[0], prob)
    return jnp.where(mask, blurred, x)


def rgb_to_grayscale(x: jnp.ndarray) -> jnp.ndarray:
    wts = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    g = jnp.sum(x * wts, axis=-1, keepdims=True)
    return jnp.broadcast_to(g, x.shape)


def random_grayscale(x: jnp.ndarray, rng, prob: float = 0.2) -> jnp.ndarray:
    mask = _per_sample_mask(rng, x.shape[0], prob)
    return jnp.where(mask, rgb_to_grayscale(x), x)


def color_jitter(
    x: jnp.ndarray,
    rng,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.4,
    hue: float = 0.1,
    prob: float = 0.8,
) -> jnp.ndarray:
    """Per-sample brightness/contrast/saturation/hue jitter (fixed op
    order b→c→s→h; the host PIL path randomizes order — distributional
    difference is negligible and this stays fused)."""
    n = x.shape[0]
    kb, kc, ks, kh, kp = jax.random.split(rng, 5)
    orig = x
    if brightness > 0:
        f = jax.random.uniform(kb, (n, 1, 1, 1), minval=max(0, 1 - brightness), maxval=1 + brightness)
        x = x * f
    if contrast > 0:
        f = jax.random.uniform(kc, (n, 1, 1, 1), minval=max(0, 1 - contrast), maxval=1 + contrast)
        mean = jnp.mean(rgb_to_grayscale(x), axis=(1, 2, 3), keepdims=True)
        x = (x - mean) * f + mean
    if saturation > 0:
        f = jax.random.uniform(ks, (n, 1, 1, 1), minval=max(0, 1 - saturation), maxval=1 + saturation)
        g = rgb_to_grayscale(x)
        x = (x - g) * f + g
    if hue > 0:
        # cheap hue rotation in YIQ space (avoids HSV branching)
        theta = jax.random.uniform(kh, (n, 1, 1), minval=-hue * math.pi, maxval=hue * math.pi)
        yiq = jnp.einsum("nhwc,cd->nhwd", x, jnp.asarray(
            [[0.299, 0.596, 0.211], [0.587, -0.274, -0.523], [0.114, -0.322, 0.312]], jnp.float32))
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        i, q = yiq[..., 1], yiq[..., 2]
        yiq = jnp.stack([yiq[..., 0], i * cos - q * sin, i * sin + q * cos], axis=-1)
        x = jnp.einsum("nhwd,dc->nhwc", yiq, jnp.asarray(
            [[1.0, 1.0, 1.0], [0.956, -0.272, -1.106], [0.621, -0.647, 1.703]], jnp.float32))
    mask = _per_sample_mask(kp, n, prob)
    return jnp.where(mask, jnp.clip(x, 0.0, 1.0), orig)


def simclr_device_augment(v1: jnp.ndarray, v2: jnp.ndarray, rng,
                          jitter_strength: float = 0.5,
                          mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """SimCLR's photometric augs on-device: color jitter (p=0.8, strength
    s scaling 0.8s/0.8s/0.8s/0.2s), grayscale (p=0.2), gaussian blur
    (p=0.5) — the host pipeline does only decode + RRC + flip and ships
    uint8, cutting host CPU and host→device bytes 4x (reference CPU-side
    SimCLRGaussianBlur/ColorJitter, basic_transforms.py:770,909)."""
    s = jitter_strength
    outs = []
    for i, v in enumerate((v1, v2)):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, i), 3)
        x = to_float(v)
        x = color_jitter(x, k1, brightness=0.8 * s, contrast=0.8 * s,
                         saturation=0.8 * s, hue=0.2 * s, prob=0.8)
        x = random_grayscale(x, k2, prob=0.2)
        x = random_gaussian_blur(x, k3, prob=0.5)
        outs.append(normalize(x, mean, std))
    return tuple(outs)


def byol_device_augment(v1: jnp.ndarray, v2: jnp.ndarray, rng,
                        mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """The reference BYOL recipe (BYOL.py:239): view1 blur p=1.0,
    solarize p=0.0; view2 blur p=0.1, solarize p=0.2; then normalize."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    v1 = to_float(v1)
    v2 = to_float(v2)
    v1 = random_gaussian_blur(v1, k1, prob=1.0)
    v2 = random_gaussian_blur(v2, k2, prob=0.1)
    v2 = random_solarize(v2, k3, prob=0.2)
    return normalize(v1, mean, std), normalize(v2, mean, std)
