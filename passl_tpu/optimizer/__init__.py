"""Optimizer factory.

Capability parity with reference `passl/optimizer/__init__.py:124-215`
(`build_optimizer(config, lr, model, ...)`): rule selection by name,
no-weight-decay lists, regex param groups with per-group lr scales,
layer-wise lr decay, and frozen-param masking (replaces `is_distributed`
and stop-gradient bookkeeping). Tensor fusion (`tensor_fusion: True`)
is intentionally a no-op on TPU — XLA owns buffer layout (SURVEY §2.9).
"""
from __future__ import annotations

import copy
from typing import Any, Callable, Dict, List, Optional

from flax import traverse_util

from .base import Group, ParamGroupOptimizer, layer_id_from_path, match_any
from .transforms import RULES, Frozen, Rule

__all__ = ["build_optimizer", "ParamGroupOptimizer", "Group", "RULES"]


def _make_rule(name: str, cfg: Dict[str, Any]) -> Rule:
    cls = RULES[name]
    accepted = {f.name for f in cls.__dataclass_fields__.values()} if hasattr(cls, "__dataclass_fields__") else set()
    kwargs = {}
    # accept torch/paddle spellings
    alias = {"beta1": "beta1", "beta2": "beta2", "eps": "epsilon", "epsilon": "epsilon",
             "momentum": "momentum", "use_nesterov": "nesterov", "nesterov": "nesterov",
             "lars_coeff": "trust_coefficient", "trust_coefficient": "trust_coefficient",
             "trust_coeff": "trust_coefficient", "clip": "clip", "betas": None}
    for k, v in cfg.items():
        if k == "betas":
            kwargs["beta1"], kwargs["beta2"] = float(v[0]), float(v[1])
            continue
        kk = alias.get(k, k)
        if kk in accepted:
            kwargs[kk] = v
    kwargs = {k: v for k, v in kwargs.items() if k in accepted}
    return cls(**kwargs)


def build_optimizer(
    config: Dict[str, Any],
    params,
    frozen_patterns: Optional[List[str]] = None,
    num_layers: int = 0,
    lr_args: Optional[tuple] = None,
) -> ParamGroupOptimizer:
    """config keys (mirroring the reference YAML surface):
      name: AdamW | Momentum | MomentumLARS | MomentumLARC | Adan | Adafactor
      weight_decay: float
      no_weight_decay_name: ["pos_embed", "cls_token", ...]  (substring/regex)
      one_dim_param_no_weight_decay: bool  (bias/norm params get wd=0)
      layerwise_decay: float  (with num_layers, ViT finetune)
      param_group: [{name: regex, lr_scale: f, weight_decay: f,
                     lr_func: {name: ..., learning_rate: ...}}, ...]
          lr_func gives the group its OWN schedule (reference LRCallable,
          optimizer/__init__.py:42-67); needs `lr_args =
          (epochs, steps_per_epoch[, batch_size])` from the caller.
      + rule hyperparams (betas/eps/momentum/...)
    """
    cfg = copy.deepcopy(dict(config))
    cfg.pop("tensor_fusion", None)  # no-op on TPU by design
    cfg.pop("grad_clip", None)  # handled by core.grad_clip in the step
    name = cfg.pop("name", "Momentum")
    base_wd = float(cfg.pop("weight_decay", 0.0))
    no_wd_names = list(cfg.pop("no_weight_decay_name", []) or [])
    one_dim_no_wd = bool(cfg.pop("one_dim_param_no_weight_decay", False))
    layerwise_decay = cfg.pop("layerwise_decay", None)
    custom_groups = list(cfg.pop("param_group", []) or [])
    frozen_patterns = list(frozen_patterns or []) + list(cfg.pop("frozen_patterns", []) or [])

    rule = _make_rule(name, cfg)

    # per-group scheduler overrides (reference LRCallable)
    group_lr_fns: Dict[str, Any] = {}
    for cg in custom_groups:
        lf = cg.pop("lr_func", None) or cg.pop("lr_scheduler", None)
        if lf is not None:
            if callable(lf):
                group_lr_fns[cg["name"]] = lf
            else:
                from ..scheduler import build_lr_scheduler

                args = lr_args or (1, 1)
                group_lr_fns[cg["name"]] = build_lr_scheduler(dict(lf), *args)

    groups: List[Group] = []
    group_index: Dict[tuple, int] = {}

    def get_group(gname: str, wd: float, lr_scale: float, freeze_steps: int = 0,
                  lr_fn=None) -> int:
        key = (gname, wd, lr_scale, freeze_steps)
        if key not in group_index:
            r = Frozen() if gname == "frozen" else rule
            group_index[key] = len(groups)
            groups.append(Group(name=gname, rule=r, weight_decay=wd, lr_scale=lr_scale,
                                freeze_steps=freeze_steps, lr_fn=lr_fn))
        return group_index[key]

    flat = traverse_util.flatten_dict(params, sep="/")
    assignment: Dict[str, int] = {}
    for path, leaf in flat.items():
        if frozen_patterns and match_any(path, frozen_patterns):
            assignment[path] = get_group("frozen", 0.0, 1.0)
            continue
        wd = base_wd
        lr_scale = 1.0
        freeze_steps = 0
        lr_fn = None
        gname = "default"
        # custom regex groups take precedence (reference group_params)
        for cg in custom_groups:
            if match_any(path, [cg["name"]]):
                wd = float(cg.get("weight_decay", base_wd))
                lr_scale = float(cg.get("lr_scale", 1.0))
                freeze_steps = int(cg.get("freeze_steps", 0))
                lr_fn = group_lr_fns.get(cg["name"])
                gname = cg["name"]
                break
        if no_wd_names and match_any(path, no_wd_names):
            wd = 0.0
            gname += "|no_wd"
        if one_dim_no_wd and hasattr(leaf, "ndim") and leaf.ndim <= 1:
            wd = 0.0
            gname += "|1d_no_wd"
        if layerwise_decay is not None and num_layers > 0:
            lid = layer_id_from_path(path, num_layers)
            lr_scale *= float(layerwise_decay) ** (num_layers + 1 - lid)
            gname += f"|layer{lid}"
        assignment[path] = get_group(gname, wd, lr_scale, freeze_steps, lr_fn)

    return ParamGroupOptimizer(groups, assignment)
