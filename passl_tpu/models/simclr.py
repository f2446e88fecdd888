"""SimCLR: two-view contrastive pretraining with NT-Xent (+CO2).

Capability parity with reference `passl_v110/modeling/architectures/
simclr.py:30` (backbone+neck over concatenated views) and
`heads/simclr_contrastive_head.py:26-102` (NT-Xent with self-masking,
per-view symmetric CE over [cross, intra] logits, CO2 KL-consistency
term with weight 3, acc1 of the positive pair).

TPU-native: under jit the batch is the *global* batch (sharded over the
mesh's data axes), so the similarity matrix spans all negatives with no
explicit all_gather — XLA inserts the collectives for the sharded
matmul. This is exactly the reference's `multi_rank` gather, compiled.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.norm import l2_normalize
from .base import Model, register_model
from .builder import build_submodule

LARGE_NUM = 1e9


def nt_xent_co2_loss(
    h1: jnp.ndarray,
    h2: jnp.ndarray,
    temperature: float = 0.5,
    co2_weight: float = 3.0,
) -> Dict[str, jnp.ndarray]:
    """NT-Xent + CO2, matching the reference head's exact construction."""
    n = h1.shape[0]
    h1 = l2_normalize(h1.astype(jnp.float32), axis=-1)
    h2 = l2_normalize(h2.astype(jnp.float32), axis=-1)
    eye = jnp.eye(n, dtype=jnp.float32)

    logits_aa = h1 @ h1.T / temperature - eye * LARGE_NUM
    logits_bb = h2 @ h2.T / temperature - eye * LARGE_NUM
    logits_ab = h1 @ h2.T / temperature
    logits_ba = h2 @ h1.T / temperature

    labels = jnp.arange(n)

    def ce(logits):
        return -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=-1)[:, 0]

    loss_a = ce(jnp.concatenate([logits_ab, logits_aa], axis=1))
    loss_b = ce(jnp.concatenate([logits_ba, logits_bb], axis=1))
    contrast = jnp.mean(loss_a + loss_b)

    # CO2 consistency (KL between the two views' distributions over the
    # same candidate set, self-pair masked out; batchmean reduction)
    logit_a = jnp.concatenate([logits_aa, logits_ab - eye * LARGE_NUM], axis=1)
    logit_b = jnp.concatenate([logits_ba - eye * LARGE_NUM, logits_bb], axis=1)
    log_a = jax.nn.log_softmax(logit_a, axis=-1)
    log_b = jax.nn.log_softmax(logit_b, axis=-1)
    p_a = jnp.exp(log_a)
    p_b = jnp.exp(log_b)
    # F.kl_div(log_a, b, 'batchmean') = sum(b * (log b - log_a)) / N
    kl_1 = jnp.sum(p_b * (jnp.log(jnp.maximum(p_b, 1e-12)) - log_a)) / n
    kl_2 = jnp.sum(p_a * (jnp.log(jnp.maximum(p_a, 1e-12)) - log_b)) / n
    co2 = kl_1 + kl_2

    acc1 = jnp.mean((jnp.argmax(logits_ab, axis=-1) == labels).astype(jnp.float32))
    return {"loss": contrast + co2_weight * co2, "acc1": acc1}


@register_model
class SimCLR(Model):
    """Pretrain architecture: batch is (view1, view2) NHWC uint8/float.

    backbone/neck given as config dicts (reference registry style), e.g.
      backbone: {name: resnet50, num_classes: 0, with_pool: False}
      neck: {name: NonLinearNeckfc3, hid_channels: 2048, out_channels: 128}
    """

    backbone: Any = None
    neck: Any = None
    temperature: float = 0.5
    co2_weight: float = 3.0
    use_device_augment: bool = False  # host ships uint8 RRC crops; jitter/gray/blur fused on device
    jitter_strength: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, train: bool = True):
        if isinstance(batch, dict):
            x1, x2 = batch["view1"], batch["view2"]
        else:
            x1, x2 = batch[0], batch[1]
        if self.use_device_augment:
            from ..ops.augment import simclr_device_augment

            x1, x2 = simclr_device_augment(x1, x2, self.make_rng("aug"),
                                           jitter_strength=self.jitter_strength)
            x1 = x1.astype(self.dtype)
            x2 = x2.astype(self.dtype)
        backbone = build_submodule(self.backbone, dtype=self.dtype, name="backbone")
        neck = build_submodule(self.neck, dtype=self.dtype, name="neck")
        # concat views so BN stats span both (reference simclr.py concat)
        x = jnp.concatenate([x1, x2], axis=0)
        feats = backbone(x, train=train)
        z = neck(feats, train=train)
        n = x1.shape[0]
        return nt_xent_co2_loss(z[:n], z[n:], self.temperature, self.co2_weight)
