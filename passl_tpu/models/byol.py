"""BYOL: bootstrap your own latent.

Capability parity with reference `passl_v110/modeling/architectures/
BYOL.py:156-280` (online backbone+projector+predictor, EMA target
backbone+projector with cosine-annealed decay, symmetric regression
loss 2−2·cos, optional SyncBN — free under jit) and `MoCoBYOL.py:58`
(MoCo queue logits + BYOL L2 head combined).

The reference's on-device batched blur/solarize/normalize
(BYOL.py:36-153) is generalized in `passl_tpu/ops/augment.py` and
enabled via `device_augment=True` (views arrive as uint8, augmented
in-graph with per-sample RNG — the direct precedent for the Pallas
fused-aug path, SURVEY §2.7).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.norm import l2_normalize
from .base import Model, register_model
from .builder import build_submodule


def byol_regression_loss(p, z) -> jnp.ndarray:
    """2 - 2·cosine (reference BYOLContrastiveHead / mb_head.py)."""
    p = l2_normalize(p.astype(jnp.float32), axis=-1)
    z = l2_normalize(z.astype(jnp.float32), axis=-1)
    return 2.0 - 2.0 * jnp.mean(jnp.sum(p * z, axis=-1))


class _Tower(nn.Module):
    backbone: Any
    neck: Any
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = build_submodule(self.backbone, dtype=self.dtype, name="backbone")
        n = build_submodule(self.neck, dtype=self.dtype, name="neck")
        return n(b(x, train=train), train=train)


@register_model
class BYOL(Model):
    backbone: Any = None
    neck: Any = None  # projector
    predictor: Any = None
    base_momentum: float = 0.996
    momentum_schedule: str = "cosine"  # "cosine" | "fixed"
    use_device_augment: bool = False
    dtype: Any = jnp.float32

    def ema_map(self):
        cfg = {"momentum": self.base_momentum}
        if self.momentum_schedule == "cosine":
            cfg["schedule"] = "cosine"
        return [("online", "target", cfg)]

    @staticmethod
    def frozen_patterns():
        return [r"^target/"]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        v1, v2 = (batch["view1"], batch["view2"]) if isinstance(batch, dict) else (batch[0], batch[1])
        if self.use_device_augment:
            from ..ops.augment import byol_device_augment

            v1, v2 = byol_device_augment(v1, v2, self.make_rng("aug"))
            v1 = v1.astype(self.dtype)
            v2 = v2.astype(self.dtype)

        online = _Tower(self.backbone, self.neck, self.dtype, name="online")
        target = _Tower(self.backbone, self.neck, self.dtype, name="target")
        predictor = build_submodule(self.predictor, dtype=self.dtype, name="predictor")

        # symmetric: predict target(v2) from online(v1) and vice versa
        z1 = online(v1, train=train)
        z2 = online(v2, train=train)
        p1 = predictor(z1, train=train)
        p2 = predictor(z2, train=train)
        t1 = jax.lax.stop_gradient(target(v1, train=train))
        t2 = jax.lax.stop_gradient(target(v2, train=train))

        # sum (not mean) over the two views — reference L2Head computes
        # (loss1+loss2) so ported hyperparameters see the same gradient
        # scale (v110 architectures/BYOL.py forward_train)
        loss = byol_regression_loss(p1, t2) + byol_regression_loss(p2, t1)
        return {"loss": loss}


@register_model
class SimSiam(Model):
    """SimSiam (reference `passl/models/simsiam.py:167` and v110
    `architectures/simsiam.py:27`): shared encoder (backbone + 3-layer
    projector), 2-layer predictor, negative cosine with stop-grad;
    no momentum encoder."""

    backbone: Any = None
    neck: Any = None  # projector (NonLinearNeckfc3-style, final BN no-affine)
    predictor: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, train: bool = True):
        v1, v2 = (batch["view1"], batch["view2"]) if isinstance(batch, dict) else (batch[0], batch[1])
        encoder = _Tower(self.backbone, self.neck, self.dtype, name="encoder")
        predictor = build_submodule(self.predictor, dtype=self.dtype, name="predictor")
        z1 = encoder(v1, train=train)
        z2 = encoder(v2, train=train)
        p1 = predictor(z1, train=train)
        p2 = predictor(z2, train=train)

        def neg_cos(p, z):
            p = l2_normalize(p.astype(jnp.float32), axis=-1)
            z = l2_normalize(jax.lax.stop_gradient(z).astype(jnp.float32), axis=-1)
            return -jnp.mean(jnp.sum(p * z, axis=-1))

        loss = 0.5 * (neg_cos(p1, z2) + neg_cos(p2, z1))
        return {"loss": loss}
