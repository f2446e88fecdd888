"""Submodule builder: config dict → flax module instance.

Mirrors the reference's registry composition (architecture =
backbone + neck + head, `passl_v110/modeling/architectures/builder.py`)
— SSL method modules take backbone/neck configs and instantiate them as
named submodules so checkpoints have stable paths.
"""
from __future__ import annotations

import inspect
from collections.abc import Mapping
from typing import Any, Optional

from .base import MODELS


def build_submodule(cfg: Any, name: Optional[str] = None, **defaults):
    """cfg: {'name': registered_name, **kwargs} mapping (plain dict or
    the FrozenDict flax stores module fields as) or an already-
    constructed module (passthrough). `defaults` (e.g. dtype) are applied
    when the target accepts them; `name` sets the flax submodule name."""
    if cfg is None:
        return None
    if not isinstance(cfg, Mapping):
        return cfg
    cfg = dict(cfg)
    target = MODELS.get(cfg.pop("name"))
    sig = inspect.signature(target.__init__ if inspect.isclass(target) else target)
    params = sig.parameters
    has_var_kw = any(p.kind == p.VAR_KEYWORD for p in params.values())
    for k, v in defaults.items():
        if has_var_kw or k in params:
            cfg.setdefault(k, v)
    if name is not None and (has_var_kw or "name" in params or inspect.isclass(target)):
        cfg.setdefault("name", name)
    if not has_var_kw and not inspect.isclass(target):
        cfg = {k: v for k, v in cfg.items() if k in params}
    return target(**cfg)
