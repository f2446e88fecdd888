"""MoCo v1/v2: momentum contrast with a negative queue.

Capability parity with reference `passl_v110/modeling/architectures/
moco.py:27-240` (encoder_q/encoder_k = backbone+neck, K-slot queue with
pointer, momentum update m=0.999, shuffle-BN, InfoNCE head
`heads/contrastive_head.py:25-60`) — re-designed for jit:

 - queue + pointer are entries in the "ssl" variable collection
   (explicit train-state pytree, updated functionally in-forward);
 - shuffle-BN = global random permutation of the key batch + per-group
   BN statistics via SplitBatchNorm (`bn_splits` on the backbone config)
   — semantically the reference's gather→randperm→per-GPU-BN→unshuffle
   with zero explicit collectives (SURVEY §2.3 Shuffle-BN);
 - the momentum update of encoder_k runs in the train step via
   `ema_map` (k = m·k + (1−m)·q), params init-synced by the engine;
 - encoder_k params excluded from optimization via `frozen_patterns`.

MoCo v1 vs v2 is config: v2 adds the MLP neck (NonLinearNeckV1) and
blur augmentation (data side).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.norm import l2_normalize
from .base import Model, register_model
from .builder import build_submodule


def info_nce_logits(q, k, queue, temperature: float):
    """l_pos [N,1] vs l_neg [N,K] (reference ContrastiveHead)."""
    l_pos = jnp.einsum("nc,nc->n", q, k)[:, None]
    l_neg = jnp.einsum("nc,ck->nk", q, queue)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    return logits


@register_model
class MoCo(Model):
    backbone: Any = None
    neck: Any = None
    dim: int = 128
    K: int = 65536
    m: float = 0.999
    T: float = 0.07
    dtype: Any = jnp.float32

    def ema_map(self):
        return [("encoder_q", "encoder_k", {"momentum": self.m})]

    @staticmethod
    def frozen_patterns():
        return [r"^encoder_k/"]

    class _Encoder(nn.Module):
        backbone: Any
        neck: Any
        dtype: Any

        @nn.compact
        def __call__(self, x, train: bool = True):
            b = build_submodule(self.backbone, dtype=self.dtype, name="backbone")
            n = build_submodule(self.neck, dtype=self.dtype, name="neck")
            return n(b(x, train=train), train=train)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        img_q, img_k = (batch["view1"], batch["view2"]) if isinstance(batch, dict) else (batch[0], batch[1])
        n = img_q.shape[0]

        enc_q = MoCo._Encoder(self.backbone, self.neck, self.dtype, name="encoder_q")
        enc_k = MoCo._Encoder(self.backbone, self.neck, self.dtype, name="encoder_k")

        q = l2_normalize(enc_q(img_q, train=train).astype(jnp.float32), axis=1)

        # shuffle-BN: global permutation before the key encoder, inverse
        # after (reference _batch_shuffle_ddp, moco.py:107-152)
        if train:
            perm = jax.random.permutation(self.make_rng("shuffle"), n)
            inv = jnp.argsort(perm)
            k = enc_k(img_k[perm], train=True)
            k = k[inv]
        else:
            k = enc_k(img_k, train=False)
        k = jax.lax.stop_gradient(l2_normalize(k.astype(jnp.float32), axis=1))

        queue = self.variable(
            "ssl", "queue",
            lambda: l2_normalize(
                jax.random.normal(self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                                  (self.dim, self.K), jnp.float32),
                axis=0),
        )
        queue_ptr = self.variable("ssl", "queue_ptr", lambda: jnp.zeros((), jnp.int32))

        logits = info_nce_logits(q, k, jax.lax.stop_gradient(queue.value), self.T)
        labels = jnp.zeros((n,), jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(logp[:, 0])
        acc1 = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))

        if train and not self.is_initializing():
            # dequeue+enqueue (reference _dequeue_and_enqueue): keys are
            # already global under jit; K % N == 0 as in the reference
            ptr = queue_ptr.value
            new_queue = jax.lax.dynamic_update_slice(queue.value, k.T, (0, ptr))
            queue.value = new_queue
            queue_ptr.value = (ptr + n) % self.K

        return {"loss": loss, "acc1": acc1}


@register_model(name="MoCoV2")
class MoCoV2(MoCo):
    """Alias; v2 = MLP neck + aug recipe (config-level differences)."""
