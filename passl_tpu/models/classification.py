"""Generic classification wrappers: linear probe / finetune.

Capability parity with reference v110 `architectures/Classification`
(`ByolClassification`, linear-eval wrappers) and the v2.x *LinearProbe
models (frozen backbone + fresh head, frozen BN statistics —
`models/swav.py:85-127` SwAVLinearProbe semantics): the backbone runs
in eval mode (frozen BN) with stop-grad when `freeze_backbone`.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn import init as tinit
from .base import Model, register_model
from .builder import build_submodule


@register_model
class Classification(Model):
    backbone: Any = None
    head_dim: int = 2048  # backbone feature dim
    num_classes: int = 1000
    freeze_backbone: bool = False
    head_init_std: float = 0.01
    with_pool: bool = True
    dtype: Any = jnp.float32

    def frozen_patterns(self):
        return [r"^backbone/"] if self.freeze_backbone else []

    @nn.compact
    def __call__(self, x, train: bool = True):
        backbone = build_submodule(self.backbone, dtype=self.dtype, name="backbone")
        if self.freeze_backbone:
            # frozen BN stats + no grads (reference freeze_batchnorm_statictis)
            feats = jax.lax.stop_gradient(backbone(x, train=False))
        else:
            feats = backbone(x, train=train)
        if feats.ndim == 4 and self.with_pool:
            feats = jnp.mean(feats, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=tinit.normal_(std=self.head_init_std),
                        bias_init=nn.initializers.zeros, name="fc")(feats)


@register_model
class LinearProbe(Classification):
    freeze_backbone: bool = True
