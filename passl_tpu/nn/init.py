"""Torch-semantics weight initializers as flax-style initializer factories.

Capability parity with reference `passl/nn/init.py:21-160` (zeros_/ones_/
constant_/normal_/uniform_/kaiming_uniform_/kaiming_normal_/
xavier_uniform_/xavier_normal_/trunc_normal_ + fan/gain helpers). The
reference mutates tensors in place; here each function returns an
`init(key, shape, dtype) -> Array` closure usable as a flax
`kernel_init`, with identical fan conventions:

fan is computed on the **torch/paddle layout** `(out, in, *kernel)` for
conv and `(out, in)` or paddle `(in, out)` for linear. Flax stores conv
kernels as `(*kernel, in, out)` and dense kernels as `(in, out)`; the
helpers below detect flax layout and compute the same fan numbers.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Initializer = Callable[[jax.Array, tuple, jnp.dtype], jnp.ndarray]


def _fan_in_fan_out(shape: tuple) -> tuple[int, int]:
    """Fan for flax layouts: dense `(in, out)`, conv `(*k, in, out)`."""
    if len(shape) < 2:
        raise ValueError("fan computation requires >=2 dims")
    if len(shape) == 2:
        fan_in, fan_out = shape[0], shape[1]
    else:
        receptive = int(math.prod(shape[:-2]))
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
    return fan_in, fan_out


def _correct_fan(shape: tuple, mode: str) -> int:
    fan_in, fan_out = _fan_in_fan_out(shape)
    if mode not in ("fan_in", "fan_out"):
        raise ValueError(f"mode {mode} not supported")
    return fan_in if mode == "fan_in" else fan_out


def calculate_gain(nonlinearity: str, param: Optional[float] = None) -> float:
    """Identical table to reference init.py:83-109 / torch."""
    linear_fns = [
        "linear", "conv1d", "conv2d", "conv3d",
        "conv_transpose1d", "conv_transpose2d", "conv_transpose3d",
    ]
    if nonlinearity in linear_fns or nonlinearity == "sigmoid":
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        neg_slope = 0.01 if param is None else float(param)
        return math.sqrt(2.0 / (1 + neg_slope**2))
    if nonlinearity == "selu":
        return 3.0 / 4
    raise ValueError(f"Unsupported nonlinearity {nonlinearity}")


def zeros_() -> Initializer:
    return lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)


def ones_() -> Initializer:
    return lambda key, shape, dtype=jnp.float32: jnp.ones(shape, dtype)


def constant_(value: float) -> Initializer:
    return lambda key, shape, dtype=jnp.float32: jnp.full(shape, value, dtype)


def normal_(mean: float = 0.0, std: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return (mean + std * jax.random.normal(key, shape)).astype(dtype)

    return init


def uniform_(a: float = 0.0, b: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, minval=a, maxval=b).astype(dtype)

    return init


def kaiming_uniform_(a: float = 0.0, mode: str = "fan_in", nonlinearity: str = "leaky_relu") -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan = _correct_fan(shape, mode)
        gain = calculate_gain(nonlinearity, a)
        bound = gain * math.sqrt(3.0 / fan)
        return jax.random.uniform(key, shape, minval=-bound, maxval=bound).astype(dtype)

    return init


def kaiming_normal_(a: float = 0.0, mode: str = "fan_in", nonlinearity: str = "leaky_relu") -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan = _correct_fan(shape, mode)
        gain = calculate_gain(nonlinearity, a)
        std = gain / math.sqrt(fan)
        return (std * jax.random.normal(key, shape)).astype(dtype)

    return init


def xavier_uniform_(gain: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fan_in_fan_out(shape)
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, minval=-bound, maxval=bound).astype(dtype)

    return init


def xavier_normal_(gain: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fan_in_fan_out(shape)
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return (std * jax.random.normal(key, shape)).astype(dtype)

    return init


def trunc_normal_(mean: float = 0.0, std: float = 1.0, a: float = -2.0, b: float = 2.0) -> Initializer:
    """Truncated normal matching torch.nn.init.trunc_normal_: sample a
    standard normal truncated to [(a-mean)/std, (b-mean)/std], then
    scale/shift (reference init.py:152-160)."""

    def init(key, shape, dtype=jnp.float32):
        lo = (a - mean) / std
        hi = (b - mean) / std
        x = jax.random.truncated_normal(key, lo, hi, shape)
        return (mean + std * x).astype(dtype)

    return init


def lecun_like_paddle_default() -> Initializer:
    """Paddle's default Linear/Conv init is Xavier-uniform-like
    (GlorotUniform); exposed so paddle-parity configs can opt in."""
    return xavier_uniform_(1.0)
