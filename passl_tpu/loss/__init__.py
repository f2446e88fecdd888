"""Loss functions + factory.

Capability parity with reference `passl/loss/__init__.py:24-60`
(`build_loss` → `CombinedLoss` with per-loss weights) and the loss set
the configs use (CELoss with label smoothing / soft targets, MixUp-aware
soft CE). SSL-specific losses (InfoNCE, NT-Xent, sinkhorn, ...) live
with their methods in `passl_tpu/models/` mirroring the reference
layout (heads own their losses).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..utils.registry import Registry

LOSSES = Registry("losses")


def register_loss(obj=None, name=None):
    return LOSSES.register(obj, name=name)


def soft_cross_entropy(logits: jnp.ndarray, soft_targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(soft_targets * logp, axis=-1))


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_smoothing: float = 0.0,
    num_classes: Optional[int] = None,
) -> jnp.ndarray:
    """Hard or soft-label CE with optional smoothing."""
    if labels.ndim == logits.ndim:  # soft labels (mixup/cutmix)
        targets = labels.astype(jnp.float32)
        if label_smoothing > 0:
            n = logits.shape[-1]
            targets = targets * (1 - label_smoothing) + label_smoothing / n
        return soft_cross_entropy(logits, targets)
    n = num_classes or logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if label_smoothing > 0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.mean(nll)


@register_loss
class CELoss:
    def __init__(self, label_smoothing: float = 0.0, epsilon: Optional[float] = None, weight: float = 1.0, **_):
        # v110 spells smoothing "epsilon"
        self.label_smoothing = label_smoothing if epsilon is None else epsilon
        self.weight = weight

    def __call__(self, logits, labels):
        return {"CELoss": self.weight * cross_entropy(logits, labels, self.label_smoothing)}


@register_loss
class SoftTargetCrossEntropy:
    def __init__(self, weight: float = 1.0, **_):
        self.weight = weight

    def __call__(self, logits, soft_targets):
        return {"SoftTargetCE": self.weight * soft_cross_entropy(logits, soft_targets)}


class CombinedLoss:
    """Weighted sum of registered losses (reference CombinedLoss)."""

    def __init__(self, loss_fns: List[Callable]):
        self.loss_fns = loss_fns

    def __call__(self, logits, labels):
        out: Dict[str, jnp.ndarray] = {}
        for fn in self.loss_fns:
            out.update(fn(logits, labels))
        out["loss"] = sum(out.values())
        return out


def build_loss(config) -> Optional[CombinedLoss]:
    """config: list of {LossName: {weight: w, ...}} or {name: ...} dicts
    (reference loss/__init__.py:24-60 YAML surface)."""
    if config is None:
        return None
    fns = []
    items = config if isinstance(config, (list, tuple)) else [config]
    for item in items:
        if "name" in item:
            kwargs = {k: v for k, v in item.items() if k != "name"}
            fns.append(LOSSES.get(item["name"])(**kwargs))
        else:
            for lname, kwargs in item.items():
                fns.append(LOSSES.get(lname)(**(kwargs or {})))
    return CombinedLoss(fns)
