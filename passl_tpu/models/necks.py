"""Projection necks shared by SSL methods.

Capability parity with reference `passl_v110/modeling/necks/base_neck.py`:
LinearNeck(:45), NonLinearNeckV1(:69, MoCo v2 fc-relu-fc),
NonLinearNeckV2(:101, BYOL fc-bn-relu-fc), NonLinearNeckV3(:142,
fc-bn-relu-fc-bn variant), NonLinearNeckfc3(:210, SimCLR 3-layer
fc-bn-relu stack), SwAVNeck(:278), MLP2d(:326, PixPro), DenseCLNeck
(:363). BatchNorm under jit-with-sharding is globally synced (the
reference uses SyncBN/sharded BN where it matters).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.norm import l2_normalize

Dtype = Any


class LinearNeck(nn.Module):
    out_channels: int
    with_avg_pool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.with_avg_pool and x.ndim == 4:
            x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.out_channels, dtype=self.dtype, name="fc")(x)


class NonLinearNeckV1(nn.Module):
    """fc-relu-fc (MoCo v2)."""

    hid_channels: int
    out_channels: int
    with_avg_pool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.with_avg_pool and x.ndim == 4:
            x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.hid_channels, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(x)


class NonLinearNeckV2(nn.Module):
    """fc-bn-relu-fc (BYOL projector/predictor)."""

    hid_channels: int
    out_channels: int
    with_avg_pool: bool = True
    with_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.with_avg_pool and x.ndim == 4:
            x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.hid_channels, use_bias=self.with_bias, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(x)


class NonLinearNeckV3(nn.Module):
    """fc-bn-relu-fc-bn (SimSiam predictor-style)."""

    hid_channels: int
    out_channels: int
    with_avg_pool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.with_avg_pool and x.ndim == 4:
            x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.hid_channels, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_bias=False, use_scale=False,
            dtype=self.dtype, name="bn2",
        )(x)


class NonLinearNeckfc3(nn.Module):
    """3-layer fc-bn-relu stack ending fc-bn (SimCLR projector,
    reference base_neck.py:210)."""

    hid_channels: int
    out_channels: int
    with_avg_pool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.with_avg_pool and x.ndim == 4:
            x = jnp.mean(x, axis=(1, 2))
        for i in range(2):
            x = nn.Dense(self.hid_channels, use_bias=False, dtype=self.dtype, name=f"fc{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype, name="fc3")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn3")(x)


class SwAVNeck(nn.Module):
    """avgpool → fc-bn-relu → fc → l2norm (reference SwAVNeck:278)."""

    hid_channels: int
    out_channels: int
    with_avg_pool: bool = True
    with_l2norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.with_avg_pool and x.ndim == 4:
            x = jnp.mean(x, axis=(1, 2))
        if self.hid_channels > 0:
            x = nn.Dense(self.hid_channels, dtype=self.dtype, name="fc1")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(x)
        if self.with_l2norm:
            x = l2_normalize(x, axis=-1)
        return x


class MLP2d(nn.Module):
    """1x1-conv MLP keeping spatial dims (PixPro, reference MLP2d:326)."""

    hid_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.hid_channels, (1, 1), dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv2")(x)


class DenseCLNeck(nn.Module):
    """Dual global+dense projection (reference DenseCLNeck:363):
    global: avgpool-fc-relu-fc; dense: 1x1conv-relu-1x1conv + pooled."""

    hid_channels: int
    out_channels: int
    num_grid: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        avg = jnp.mean(x, axis=(1, 2))
        g = nn.Dense(self.hid_channels, dtype=self.dtype, name="fc1")(avg)
        g = nn.relu(g)
        g = nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(g)

        d = x
        if self.num_grid is not None:
            s = x.shape[1] // self.num_grid
            d = nn.avg_pool(x, (s, s), strides=(s, s))
        d = nn.Conv(self.hid_channels, (1, 1), dtype=self.dtype, name="conv1")(d)
        d = nn.relu(d)
        d = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv2")(d)
        n, h, w, c = d.shape
        d = d.reshape(n, h * w, c)  # [N, S, C] dense descriptors
        avg_d = jnp.mean(d, axis=1)
        return g, d, avg_d


from .base import MODELS  # noqa: E402

for _cls in (
    LinearNeck,
    NonLinearNeckV1,
    NonLinearNeckV2,
    NonLinearNeckV3,
    NonLinearNeckfc3,
    SwAVNeck,
    MLP2d,
    DenseCLNeck,
):
    MODELS.register(_cls)
