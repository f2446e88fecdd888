"""Model base conventions + factory.

Capability parity with reference `passl/models/base_model.py:25-40`
(abstract Model with load_pretrained/save) and
`passl/models/__init__.py:37-44` (name-dispatched `build_model`), unified
with the v110 Registry pattern.

Conventions (framework-wide):
- Models are flax `nn.Module`s. Classification models map
  `(images NHWC, train) -> logits`. SSL pretrain methods map
  `(batch, train) -> dict[str, loss]` (mirrors the reference's
  contrastive loop contract, `contrastive_learning_loop.py:26-88`).
- Mutable SSL buffers (MoCo queue/ptr, SwAV prototypes bookkeeping) live
  in the `"ssl"` variable collection; BN stats in `"batch_stats"`.
- Momentum/EMA encoders are ordinary submodules; `Model.ema_map()`
  declares (online_prefix -> target_prefix) pairs that the train step
  updates functionally each step. Their params are excluded from
  gradient updates via the optimizer's `frozen_patterns`.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn

from ..utils.registry import Registry, build_from_config

MODELS = Registry("models")


class Model(nn.Module):
    """Base flax module with framework hooks."""

    @staticmethod
    def ema_map() -> List[Tuple[str, str, Dict[str, Any]]]:
        """[(online_prefix, target_prefix, {momentum|schedule...})]."""
        return []

    @staticmethod
    def frozen_patterns() -> List[str]:
        """Regexes of param paths excluded from gradient updates
        (momentum encoders, frozen backbones in linear probes)."""
        return []

    def optimizer_overrides(self) -> List[Dict[str, Any]]:
        """Extra optimizer param_group entries (regex name + lr_scale /
        weight_decay / freeze_steps), e.g. SwAV prototype freezing."""
        return []

    @staticmethod
    def param_transforms() -> List[Tuple[str, Any]]:
        """[(param_path_regex, fn)] applied to params after every
        optimizer step (e.g. SwAV prototype L2 re-normalization)."""
        return []

    @staticmethod
    def no_sync_patterns() -> List[str]:
        """Param paths whose grads must not be data-synced (unused under
        pjit — kept for API parity with reference `is_distributed`)."""
        return []

    def load_pretrained(self, path: str, params):
        from ..utils import io

        return io.load_pretrained_into(path, params)


def register_model(cls=None, name: Optional[str] = None):
    return MODELS.register(cls, name=name)


def build_model(config: dict) -> nn.Module:
    """config: {'name': <registered name or class>, **kwargs}."""
    return build_from_config(dict(config), MODELS)
