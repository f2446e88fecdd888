"""DenseCL: dense contrastive learning.

Capability parity with reference `passl_v110/modeling/architectures/
densecl.py:26-260`: MoCo-style momentum encoders with **two** queues
(global NxC keys and dense grid keys, :96-127), DenseCLNeck producing
(global, grid, pooled-grid) projections, backbone-feature
correspondence (argmax of q_b·k_b similarity) to pick dense positives,
InfoNCE on both branches mixed by `loss_lambda`.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.norm import l2_normalize
from .base import Model, register_model
from .builder import build_submodule
from .moco import info_nce_logits


class _DenseEncoder(nn.Module):
    backbone: Any
    neck: Any
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = build_submodule(self.backbone, dtype=self.dtype, name="backbone")
        n = build_submodule(self.neck, dtype=self.dtype, name="neck")
        feats = b(x, train=train)  # [N, H, W, C]
        g, grid, avg_grid = n(feats, train=train)
        nb, h, w, c = feats.shape
        fb = feats.reshape(nb, h * w, c)
        return g, grid, avg_grid, fb


@register_model
class DenseCL(Model):
    backbone: Any = None
    neck: Any = None
    dim: int = 128
    K: int = 65536
    m: float = 0.999
    T: float = 0.2
    loss_lambda: float = 0.5
    dtype: Any = jnp.float32

    def ema_map(self):
        return [("encoder_q", "encoder_k", {"momentum": self.m})]

    @staticmethod
    def frozen_patterns():
        return [r"^encoder_k/"]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        img_q, img_k = (batch[0], batch[1]) if not isinstance(batch, dict) else (batch["view1"], batch["view2"])
        n = img_q.shape[0]
        enc_q = _DenseEncoder(self.backbone, self.neck, self.dtype, name="encoder_q")
        enc_k = _DenseEncoder(self.backbone, self.neck, self.dtype, name="encoder_k")

        q, q_grid, _, q_b = enc_q(img_q, train=train)
        q = l2_normalize(q.astype(jnp.float32), axis=1)
        q_grid = l2_normalize(q_grid.astype(jnp.float32), axis=-1)  # [N, S, C]
        q_b = l2_normalize(q_b.astype(jnp.float32), axis=-1)

        if train:
            perm = jax.random.permutation(self.make_rng("shuffle"), n)
            inv = jnp.argsort(perm)
            k, k_grid, _, k_b = enc_k(img_k[perm], train=True)
            k, k_grid, k_b = k[inv], k_grid[inv], k_b[inv]
        else:
            k, k_grid, _, k_b = enc_k(img_k, train=False)
        k = jax.lax.stop_gradient(l2_normalize(k.astype(jnp.float32), axis=1))
        k_grid = jax.lax.stop_gradient(l2_normalize(k_grid.astype(jnp.float32), axis=-1))
        k_b = jax.lax.stop_gradient(l2_normalize(k_b.astype(jnp.float32), axis=-1))

        # dense correspondence: match each q position to its most
        # similar k position by *backbone* features (reference train_iter)
        sim = jnp.einsum("nsc,ntc->nst", q_b, k_b)
        ind = jnp.argmax(sim, axis=2)  # [N, S]
        k_grid_matched = jnp.take_along_axis(k_grid, ind[:, :, None], axis=1)

        queue = self.variable("ssl", "queue", lambda: l2_normalize(
            jax.random.normal(jax.random.PRNGKey(0), (self.dim, self.K)), axis=0))
        queue2 = self.variable("ssl", "queue2", lambda: l2_normalize(
            jax.random.normal(jax.random.PRNGKey(1), (self.dim, self.K)), axis=0))
        ptr = self.variable("ssl", "queue_ptr", lambda: jnp.zeros((), jnp.int32))

        # global InfoNCE
        logits = info_nce_logits(q, k, jax.lax.stop_gradient(queue.value), self.T)
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss_single = -jnp.mean(logp[:, 0])

        # dense InfoNCE: positives are matched grid keys, negatives queue2
        s = q_grid.shape[1]
        l_pos_d = jnp.sum(q_grid * k_grid_matched, axis=-1).reshape(n * s, 1)
        l_neg_d = (q_grid.reshape(n * s, -1) @ queue2.value)
        logits_d = jnp.concatenate([l_pos_d, jax.lax.stop_gradient(l_neg_d)], axis=1) / self.T
        logp_d = jax.nn.log_softmax(logits_d, axis=-1)
        loss_dense = -jnp.mean(logp_d[:, 0])

        loss = loss_single * (1 - self.loss_lambda) + loss_dense * self.loss_lambda

        if train and not self.is_initializing():
            p = ptr.value
            # enqueue global keys and pooled dense keys (reference uses
            # the avg-pooled grid keys for queue2)
            k2 = l2_normalize(jnp.mean(k_grid, axis=1), axis=-1)
            queue.value = jax.lax.dynamic_update_slice(queue.value, k.T, (0, p))
            queue2.value = jax.lax.dynamic_update_slice(queue2.value, k2.T, (0, p))
            ptr.value = (p + n) % self.K

        acc1 = jnp.mean((jnp.argmax(logits, axis=-1) == 0).astype(jnp.float32))
        return {"loss": loss, "loss_single": loss_single, "loss_dense": loss_dense, "acc1": acc1}
