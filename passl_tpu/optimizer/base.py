"""Param-group optimizer: functional, path-regex-driven grouping.

Capability parity with reference `passl/optimizer/optimizer.py:32-233`
(torch-style param groups with per-group lr/lr_scale/lr_func/wd and
name-keyed state) and `optimizer/__init__.py:70-121` +
`utils/group_params.py` (regex-named config groups, layer-wise lr decay,
no-weight-decay lists).

Design: group membership is decided **statically** from the flattened
param path (`a/b/kernel`), producing one python-int group id per leaf.
`apply` then runs each leaf's rule inline — the whole optimizer is part
of the single jitted train step, so XLA fuses every update (the TPU
answer to the reference's fused `_C_ops.adamw` + tensor fusion: buffer
packing is unnecessary when the compiler owns memory layout).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, List, Optional, Sequence

from flax import traverse_util

from .transforms import Frozen, Rule

LrFn = Callable[[Any], Any]  # step -> lr (jnp scalar ok)


@dataclasses.dataclass(frozen=True)
class Group:
    name: str
    rule: Rule
    weight_decay: float = 0.0
    lr_scale: float = 1.0
    lr_fn: Optional[LrFn] = None  # per-group scheduler override
    freeze_steps: int = 0  # lr forced to 0 while step < freeze_steps
    # (expresses SwAV's freeze-prototypes-by-iter grad cancel,
    #  reference models/swav.py:157-199, as a schedule gate)


class ParamGroupOptimizer:
    """Holds static groups + a per-leaf assignment; init/apply are pure."""

    def __init__(self, groups: Sequence[Group], assignment: Dict[str, int]):
        self.groups = list(groups)
        self.assignment = dict(assignment)  # flat path -> group id

    # -- helpers ---------------------------------------------------------
    def _flat(self, tree):
        return traverse_util.flatten_dict(tree, sep="/")

    def _unflat(self, flat):
        return traverse_util.unflatten_dict(flat, sep="/")

    def group_of(self, path: str) -> Group:
        return self.groups[self.assignment[path]]

    # -- pure API --------------------------------------------------------
    def init(self, params) -> Dict:
        """Opt state is a FLAT one-level dict {param_path: rule_state}
        (itself a pytree; orbax checkpoints it natively). Keeping it flat
        avoids collisions between param paths and rule-state keys."""
        flat = self._flat(params)
        return {p: self.group_of(p).rule.init(leaf) for p, leaf in flat.items()}

    def apply(self, params, grads, opt_state, lr, step):
        """Returns (new_params, new_opt_state). `lr` is the global
        scheduled lr for this step (jnp scalar); per-group lr_fn/lr_scale
        are applied on top (reference optimizer.py lr_step semantics)."""
        fp = self._flat(params)
        fg = self._flat(grads)
        new_p, new_s = {}, {}
        for path, p in fp.items():
            g = self.groups[self.assignment[path]]
            glr = (g.lr_fn(step) if g.lr_fn is not None else lr) * g.lr_scale
            if g.freeze_steps:
                glr = glr * (step >= g.freeze_steps)
            np_, ns_ = g.rule.update(fg[path], opt_state[path], p, glr, g.weight_decay, step)
            new_p[path], new_s[path] = np_, ns_
        return self._unflat(new_p), new_s

    def trainable_mask(self, params):
        """Pytree of bools: False for Frozen-group leaves."""
        flat = self._flat(params)
        mask = {p: not isinstance(self.group_of(p).rule, Frozen) for p in flat}
        return self._unflat(mask)

    def describe(self) -> str:
        counts: Dict[str, int] = {}
        for gid in self.assignment.values():
            counts[self.groups[gid].name] = counts.get(self.groups[gid].name, 0) + 1
        return ", ".join(f"{k}:{v}" for k, v in sorted(counts.items()))


def match_any(path: str, patterns: Sequence[str]) -> bool:
    return any(re.search(pat, path) for pat in patterns)


def layer_id_from_path(path: str, num_layers: int) -> int:
    """Layer index for layer-wise lr decay (reference
    `param_group_layer_decay`, group_params.py:88-143): embeddings/cls
    → 0, block i → i+1, head/norm → num_layers+1."""
    if re.search(r"(cls_token|pos_embed|patch_embed|mask_token)", path):
        return 0
    m = re.search(r"blocks?[_./](\d+)", path)
    if m:
        return int(m.group(1)) + 1
    return num_layers + 1
