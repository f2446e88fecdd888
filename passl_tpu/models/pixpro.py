"""PixPro: pixel-level propagation contrast.

Capability parity with reference `passl_v110/modeling/architectures/
pixpro.py:27-280`: coordinate-based `regression_loss` (:27-86) matching
spatial cells of the two crops whose normalized center distance is
below `pos_ratio`; pixel-propagation module (value transform + cosine-
similarity^p propagation); momentum encoder; optional instance branch.

Crops arrive with their source-image coordinates (x1, y1, x2, y2)
from the paired-crop transform (reference
`img_pil_pixpro_transforms.py` RandomResizedCropWithTwoImages).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.norm import l2_normalize
from .base import Model, register_model
from .builder import build_submodule


def pixpro_regression_loss(q, k, coord_q, coord_k, pos_ratio: float = 0.7):
    """q, k: [N, H, W, C] projections; coord: [N, 4] crop boxes in
    source-image space. Mirrors reference regression_loss math."""
    n, h, w, c = q.shape
    qf = l2_normalize(q.reshape(n, h * w, c).astype(jnp.float32), axis=-1)
    kf = l2_normalize(k.reshape(n, h * w, c).astype(jnp.float32), axis=-1)

    x_arr = jnp.tile(jnp.arange(w, dtype=jnp.float32)[None, None, :], (1, h, 1))
    y_arr = jnp.tile(jnp.arange(h, dtype=jnp.float32)[None, :, None], (1, 1, w))
    coord_q = coord_q.astype(jnp.float32)
    coord_k = coord_k.astype(jnp.float32)
    q_bw = ((coord_q[:, 2] - coord_q[:, 0]) / w)[:, None, None]
    q_bh = ((coord_q[:, 3] - coord_q[:, 1]) / h)[:, None, None]
    k_bw = ((coord_k[:, 2] - coord_k[:, 0]) / w)[:, None, None]
    k_bh = ((coord_k[:, 3] - coord_k[:, 1]) / h)[:, None, None]
    q_sx, q_sy = coord_q[:, 0][:, None, None], coord_q[:, 1][:, None, None]
    k_sx, k_sy = coord_k[:, 0][:, None, None], coord_k[:, 1][:, None, None]
    q_diag = jnp.sqrt(q_bw**2 + q_bh**2)
    k_diag = jnp.sqrt(k_bw**2 + k_bh**2)
    max_diag = jnp.maximum(q_diag, k_diag)

    cqx = (x_arr + 0.5) * q_bw + q_sx
    cqy = (y_arr + 0.5) * q_bh + q_sy
    ckx = (x_arr + 0.5) * k_bw + k_sx
    cky = (y_arr + 0.5) * k_bh + k_sy
    dist = jnp.sqrt(
        (cqx.reshape(n, h * w, 1) - ckx.reshape(n, 1, h * w)) ** 2
        + (cqy.reshape(n, h * w, 1) - cky.reshape(n, 1, h * w)) ** 2
    ) / jnp.maximum(max_diag.reshape(n, 1, 1), 1e-6)
    pos_mask = jax.lax.stop_gradient((dist < pos_ratio).astype(jnp.float32))

    logit = jnp.einsum("nsc,ntc->nst", qf, kf)
    loss = jnp.sum(logit * pos_mask, axis=(1, 2)) / (jnp.sum(pos_mask, axis=(1, 2)) + 1e-6)
    return -2.0 * jnp.mean(loss)


class PixelPropagation(nn.Module):
    """y_i = sum_j sim(x_i,x_j)^p · g(x_j) (reference PixPro module)."""

    p: float = 2.0
    transform_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):  # [N, H, W, C]
        n, h, w, c = x.shape
        xn = l2_normalize(x.astype(jnp.float32), axis=-1).reshape(n, h * w, c)
        sim = jnp.maximum(jnp.einsum("nsc,ntc->nst", xn, xn), 0.0) ** self.p
        g = x.reshape(n, h * w, c)
        for i in range(self.transform_layers):
            g = nn.Conv(c, (1, 1), dtype=self.dtype, name=f"transform_{i}")(
                g.reshape(n, h, w, c)).reshape(n, h * w, c)
        y = jnp.einsum("nst,ntc->nsc", sim, g.astype(jnp.float32))
        return y.reshape(n, h, w, c)


class _PixEncoder(nn.Module):
    backbone: Any
    neck: Any
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = build_submodule(self.backbone, dtype=self.dtype, name="backbone")
        n = build_submodule(self.neck, dtype=self.dtype, name="neck")  # MLP2d
        return n(b(x, train=train), train=train)  # [N, H, W, C]


@register_model
class PixPro(Model):
    backbone: Any = None
    neck: Any = None  # MLP2d projector
    pixpro_p: float = 2.0
    pixpro_momentum: float = 0.99
    pixpro_pos_ratio: float = 0.7
    pixpro_transform_layer: int = 1
    dtype: Any = jnp.float32

    def ema_map(self):
        return [("encoder", "encoder_k", {"momentum": self.pixpro_momentum, "schedule": "cosine"})]

    @staticmethod
    def frozen_patterns():
        return [r"^encoder_k/"]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        # batch: (view1, view2, coord1, coord2)
        if isinstance(batch, dict):
            v1, v2, c1, c2 = batch["view1"], batch["view2"], batch["coord1"], batch["coord2"]
        else:
            v1, v2, c1, c2 = batch
        enc = _PixEncoder(self.backbone, self.neck, self.dtype, name="encoder")
        enc_k = _PixEncoder(self.backbone, self.neck, self.dtype, name="encoder_k")
        prop = PixelPropagation(self.pixpro_p, self.pixpro_transform_layer,
                                self.dtype, name="propagation")

        y1 = prop(enc(v1, train=train), train=train)
        y2 = prop(enc(v2, train=train), train=train)
        k1 = jax.lax.stop_gradient(enc_k(v1, train=train))
        k2 = jax.lax.stop_gradient(enc_k(v2, train=train))

        loss = pixpro_regression_loss(y1, k2, c1, c2, self.pixpro_pos_ratio) \
            + pixpro_regression_loss(y2, k1, c2, c1, self.pixpro_pos_ratio)
        return {"loss": loss}


@register_model
class MoCoBYOL(Model):
    """MoCo-BYOL hybrid (reference `architectures/MoCoBYOL.py:58`):
    online encoder+projector+predictor vs momentum target; loss =
    InfoNCE over queue + BYOL 2−2cos, mixed."""

    backbone: Any = None
    neck: Any = None
    predictor: Any = None
    dim: int = 256
    K: int = 65536
    m: float = 0.999
    T: float = 0.2
    byol_weight: float = 1.0
    contrast_weight: float = 1.0
    dtype: Any = jnp.float32

    def ema_map(self):
        return [("online", "target", {"momentum": self.m, "schedule": "cosine"})]

    @staticmethod
    def frozen_patterns():
        return [r"^target/"]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        from .byol import _Tower, byol_regression_loss
        from .moco import info_nce_logits

        v1, v2 = (batch[0], batch[1]) if not isinstance(batch, dict) else (batch["view1"], batch["view2"])
        n = v1.shape[0]
        online = _Tower(self.backbone, self.neck, self.dtype, name="online")
        target = _Tower(self.backbone, self.neck, self.dtype, name="target")
        predictor = build_submodule(self.predictor, dtype=self.dtype, name="predictor")

        p1 = predictor(online(v1, train=train), train=train)
        p2 = predictor(online(v2, train=train), train=train)
        t1 = jax.lax.stop_gradient(target(v1, train=train))
        t2 = jax.lax.stop_gradient(target(v2, train=train))

        byol_loss = 0.5 * (byol_regression_loss(p1, t2) + byol_regression_loss(p2, t1))

        q = l2_normalize(p1.astype(jnp.float32), axis=1)
        k = l2_normalize(t2.astype(jnp.float32), axis=1)
        queue = self.variable("ssl", "queue", lambda: l2_normalize(
            jax.random.normal(jax.random.PRNGKey(0), (self.dim, self.K)), axis=0))
        ptr = self.variable("ssl", "queue_ptr", lambda: jnp.zeros((), jnp.int32))
        logits = info_nce_logits(q, k, jax.lax.stop_gradient(queue.value), self.T)
        logp = jax.nn.log_softmax(logits, axis=-1)
        contrast_loss = -jnp.mean(logp[:, 0])

        if train and not self.is_initializing():
            p = ptr.value
            queue.value = jax.lax.dynamic_update_slice(queue.value, k.T, (0, p))
            ptr.value = (p + n) % self.K

        loss = self.byol_weight * byol_loss + self.contrast_weight * contrast_loss
        return {"loss": loss, "byol_loss": byol_loss, "contrast_loss": contrast_loss}
