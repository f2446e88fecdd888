"""SwAV: online clustering with multi-crop + Sinkhorn-Knopp.

Capability parity with reference `passl/models/swav.py:128-348` and
`passl_v110/modeling/architectures/swav.py:25`:
 - backbone → SwAVNeck (projection + l2norm) → prototypes (bias-free
   linear with L2-normalized weight)
 - multi-crop grouping by resolution (`swav.py:290-305`)
 - `distributed_sinkhorn` with 3 iterations of row/column normalization
   (`swav.py:139-155`) — the reference all_reduces row sums over NCCL;
   under jit the batch is global so the sums are the collectives
 - freeze-prototypes-by-iteration (`swav.py:157-199`): expressed as the
   optimizer group `{name: "prototypes", freeze_steps: N}` (the engine
   wires `Model.optimizer_overrides()`), replacing the reference's
   runtime_info_hub grad-cancel
 - prototype weight re-normalization each step: `param_transforms`
   hook in the train step.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.norm import l2_normalize
from .base import Model, register_model
from .builder import build_submodule


def sinkhorn_knopp(scores: jnp.ndarray, epsilon: float = 0.05, iterations: int = 3) -> jnp.ndarray:
    """scores: [B, K] prototype logits (global batch). Returns the
    balanced assignment Q [B, K] (rows sum to 1·B/B). Matches reference
    distributed_sinkhorn math exactly."""
    Q = jnp.exp(scores.astype(jnp.float32) / epsilon).T  # [K, B]
    B = Q.shape[1]
    K = Q.shape[0]
    Q = Q / jnp.sum(Q)

    def body(_, Q):
        Q = Q / jnp.sum(Q, axis=1, keepdims=True) / K  # normalize rows
        Q = Q / jnp.sum(Q, axis=0, keepdims=True) / B  # normalize cols
        return Q

    Q = jax.lax.fori_loop(0, iterations, body, Q)
    return (Q * B).T


@register_model
class SwAV(Model):
    backbone: Any = None
    neck: Any = None
    dim: int = 128
    num_prototypes: int = 3000
    temperature: float = 0.1
    epsilon: float = 0.05
    sinkhorn_iterations: int = 3
    num_crops: Sequence[int] = (2,)  # per resolution group, e.g. (2, 6)
    crops_for_assign: Sequence[int] = (0, 1)
    freeze_prototypes_iter: int = 0
    dtype: Any = jnp.float32

    def optimizer_overrides(self) -> List[Dict]:
        if self.freeze_prototypes_iter > 0:
            return [{"name": r"^prototypes/", "freeze_steps": self.freeze_prototypes_iter}]
        return []

    @staticmethod
    def param_transforms():
        # keep prototype vectors unit-norm after each update
        return [(r"^prototypes/kernel$", lambda w: l2_normalize(w, axis=0))]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        crops = list(batch) if isinstance(batch, (list, tuple)) else [batch]
        backbone = build_submodule(self.backbone, dtype=self.dtype, name="backbone")
        neck = build_submodule(self.neck, dtype=self.dtype, name="neck")
        prototypes = nn.Dense(self.num_prototypes, use_bias=False, dtype=jnp.float32, name="prototypes")

        # group crops by resolution and batch each group through the net
        # (reference multi-crop grouping, swav.py:290-305)
        res_groups: Dict[int, List[int]] = {}
        for i, c in enumerate(crops):
            res_groups.setdefault(c.shape[1], []).append(i)
        z_by_crop: Dict[int, jnp.ndarray] = {}
        for res, idxs in res_groups.items():
            x = jnp.concatenate([crops[i] for i in idxs], axis=0)
            feats = backbone(x, train=train)
            z = neck(feats, train=train)  # SwAVNeck l2-normalizes
            per = crops[idxs[0]].shape[0]
            for j, i in enumerate(idxs):
                z_by_crop[i] = z[j * per : (j + 1) * per]

        scores = {i: prototypes(z_by_crop[i].astype(jnp.float32)) for i in z_by_crop}

        total_crops = len(crops)
        loss = 0.0
        for i in self.crops_for_assign:
            q = jax.lax.stop_gradient(
                sinkhorn_knopp(scores[i], self.epsilon, self.sinkhorn_iterations)
            )
            subloss = 0.0
            for v in range(total_crops):
                if v == i:
                    continue
                logp = jax.nn.log_softmax(scores[v] / self.temperature, axis=-1)
                subloss = subloss - jnp.mean(jnp.sum(q * logp, axis=-1))
            loss = loss + subloss / (total_crops - 1)
        loss = loss / len(self.crops_for_assign)
        return {"loss": loss}
