"""Mixed precision: bf16 policy + dynamic loss scaling.

Capability parity with reference `passl/core/grad_scaler.py:22-87`
(dynamic-loss-scale AMP with `max_loss_scaling` cap and
`check_finite_and_unscale`) and the engine's O1/O2 autocast setup
(`engine/engine.py:179-213`).

TPU-first: the default precision mode is **bf16 compute, fp32 params**
("O1"-equivalent) which needs *no* loss scaling; the dynamic scaler is
kept for fp16 parity runs and numerical experiments. The finite check
is a fused `jnp.isfinite` reduction inside the step (reference calls
the `_C_ops.check_finite_and_unscale` CUDA kernel).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


def resolve_dtype(name: Optional[str]):
    return {
        None: jnp.float32,
        "float32": jnp.float32,
        "fp32": jnp.float32,
        "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
        "float16": jnp.float16,
        "fp16": jnp.float16,
    }[name]


@dataclasses.dataclass(frozen=True)
class Policy:
    """Precision policy threaded into model construction and the step.

    level: "O0" fp32 | "O1" bf16 compute (default) | "O2" fp16 compute +
    dynamic loss scaling (parity with the reference's AMP O2).
    """

    compute_dtype: Any = jnp.float32
    use_loss_scaling: bool = False

    @classmethod
    def from_config(cls, fp16_cfg: Optional[dict]) -> "Policy":
        """FP16 config block (reference engine.py:179-213). On TPU the
        O1/O2 levels both map to bf16 compute unless dtype=float16 is
        explicitly requested (which enables dynamic loss scaling)."""
        if not fp16_cfg or not fp16_cfg.get("enable", True):
            return cls()
        level = fp16_cfg.get("level", "O1")
        if level == "O0":
            return cls(jnp.float32, False)
        dtype = resolve_dtype(fp16_cfg.get("dtype", "bfloat16"))
        return cls(dtype, dtype == jnp.float16)


class ScalerState(struct.PyTreeNode):
    scale: jnp.ndarray
    growth_tracker: jnp.ndarray

    @classmethod
    def create(cls, init_loss_scaling: float = 2.0**15):
        return cls(
            scale=jnp.asarray(init_loss_scaling, jnp.float32),
            growth_tracker=jnp.asarray(0, jnp.int32),
        )


@dataclasses.dataclass(frozen=True)
class GradScaler:
    """Functional dynamic loss scaler (reference GradScaler semantics:
    incr_ratio x2 every incr_every_n_steps good steps, decr_ratio 0.5 on
    non-finite, scale capped at max_loss_scaling)."""

    init_loss_scaling: float = 2.0**15
    incr_ratio: float = 2.0
    decr_ratio: float = 0.5
    incr_every_n_steps: int = 2000
    max_loss_scaling: float = 2.0**32

    def init(self) -> ScalerState:
        return ScalerState.create(self.init_loss_scaling)

    def scale(self, loss: jnp.ndarray, state: ScalerState) -> jnp.ndarray:
        return loss * state.scale

    def unscale_and_check(self, grads, state: ScalerState):
        """Returns (unscaled_grads, is_finite)."""
        inv = jnp.reciprocal(state.scale)
        grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32) * inv, grads)
        finite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)])
        )
        return grads, finite

    def update(self, state: ScalerState, is_finite: jnp.ndarray) -> ScalerState:
        tracker = jnp.where(is_finite, state.growth_tracker + 1, 0)
        grow = tracker >= self.incr_every_n_steps
        new_scale = jnp.where(
            is_finite,
            jnp.where(grow, jnp.minimum(state.scale * self.incr_ratio, self.max_loss_scaling), state.scale),
            jnp.maximum(state.scale * self.decr_ratio, 1.0),
        )
        tracker = jnp.where(grow, 0, tracker)
        return ScalerState(scale=new_scale, growth_tracker=tracker)
