"""Global-norm gradient clipping.

Capability parity with reference `passl/core/grad_clip.py`
(`ClipGradByGlobalNorm` :30-91 with `no_clip_list` name filter,
`always_clip`, `clip_norm_max`; torch-style `clip_grad_norm_` :94-139).
The reference calls `_C_ops.squared_l2_norm` per tensor; here the whole
reduction is one XLA-fused expression inside the train step.
"""
from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util


def global_norm(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))


def clip_grad_norm(grads, max_norm: float, eps: float = 1e-6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale all grads so their global L2 norm is <= max_norm.
    Returns (clipped_grads, pre_clip_norm)."""
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + eps))
    return jax.tree_util.tree_map(lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype), grads), norm


class ClipGradByGlobalNorm:
    """Configurable clip honoring `no_clip_list` path patterns,
    `always_clip`, and `clip_norm_max` (reference grad_clip.py:30-91):
    the norm is computed over non-excluded params; excluded params are
    scaled only when `always_clip` is set; the applied scale is capped
    by clip_norm_max when given."""

    def __init__(
        self,
        clip_norm: float,
        no_clip_list: Optional[Sequence[str]] = None,
        always_clip: bool = False,
        clip_norm_max: Optional[float] = None,
        eps: float = 1e-6,
    ):
        self.clip_norm = float(clip_norm)
        self.no_clip_list = list(no_clip_list or [])
        self.always_clip = always_clip
        self.clip_norm_max = clip_norm_max
        self.eps = eps

    def _excluded(self, path: str) -> bool:
        return any(re.search(p, path) for p in self.no_clip_list)

    def __call__(self, grads):
        flat = traverse_util.flatten_dict(grads, sep="/")
        included = [g for p, g in flat.items() if not self._excluded(p)]
        if not included:
            return grads, jnp.asarray(0.0, jnp.float32)
        norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in included))
        clip_to = self.clip_norm
        if self.clip_norm_max is not None:
            clip_to = min(self.clip_norm, self.clip_norm_max)
        scale = jnp.minimum(1.0, clip_to / (norm + self.eps))
        out = {}
        for p, g in flat.items():
            if self._excluded(p) and not self.always_clip:
                out[p] = g
            else:
                out[p] = (g.astype(jnp.float32) * scale).astype(g.dtype)
        return traverse_util.unflatten_dict(out, sep="/"), norm
