"""Metrics.

Capability parity with reference `passl/metric/metrics.py:28-101`
(`TopkAcc`, `mAP`) + factory `build_metrics`.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from ..utils.registry import Registry

METRICS = Registry("metrics")


@METRICS.register
class TopkAcc:
    def __init__(self, topk: Sequence[int] = (1, 5)):
        self.topk = tuple(topk)

    def __call__(self, logits, labels) -> Dict[str, jnp.ndarray]:
        if labels.ndim == logits.ndim:  # soft labels → argmax
            labels = jnp.argmax(labels, axis=-1)
        maxk = max(self.topk)
        pred = jnp.argsort(-logits, axis=-1)[:, :maxk]
        correct = pred == labels[:, None]
        return {f"top{k}": jnp.mean(jnp.any(correct[:, :k], axis=-1).astype(jnp.float32)) for k in self.topk}


@METRICS.register
class mAP:
    """Mean average precision over multi-label targets (host-side numpy,
    reference metrics.py:58-101)."""

    def __call__(self, scores, targets) -> Dict[str, float]:
        scores = np.asarray(scores)
        targets = np.asarray(targets)
        aps = []
        for c in range(scores.shape[1]):
            t = targets[:, c]
            if t.sum() == 0:
                continue
            order = np.argsort(-scores[:, c])
            t = t[order]
            tp = np.cumsum(t)
            precision = tp / (np.arange(len(t)) + 1)
            aps.append((precision * t).sum() / t.sum())
        return {"mAP": float(np.mean(aps)) if aps else 0.0}


def build_metrics(config) -> List:
    if config is None:
        return []
    out = []
    items = config if isinstance(config, (list, tuple)) else [config]
    for item in items:
        if isinstance(item, str):
            out.append(METRICS.get(item)())
        elif "name" in item:
            kwargs = {k: v for k, v in item.items() if k != "name"}
            out.append(METRICS.get(item["name"])(**kwargs))
        else:
            for mname, kwargs in item.items():
                out.append(METRICS.get(mname)(**(kwargs or {})))
    return out
