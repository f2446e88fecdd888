"""LR schedulers as pure functions of the global step.

Capability parity with reference `passl/scheduler/lr_scheduler.py`
(TimmCosine :22-77, ViTLRScheduler :80-118, Step :121-160, Poly
:163-201, MultiStepDecay) and `passl_v110/solver/lr_scheduler.py`
(Cosine/CosineWarmup/simclrCosineWarmup with sqrt/linear global-batch
lr scaling). The reference steps a mutable scheduler object on the
host; here each scheduler is a **pure `step -> lr` function evaluated
inside the jitted train step**, so there is no host round-trip and the
lr math fuses into the update kernels.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence

import jax.numpy as jnp

LrFn = Callable[[Any], Any]


def _unit_steps(decay_unit: str, steps_per_epoch: int) -> int:
    return steps_per_epoch if decay_unit == "epoch" else 1


def timm_cosine(
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epoch: float = 0,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
    warmup_prefix: bool = False,
    decay_unit: str = "step",
    **_: Any,
) -> LrFn:
    total = epochs * steps_per_epoch
    warmup = int(warmup_epoch * steps_per_epoch)
    unit = _unit_steps(decay_unit, steps_per_epoch)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        # quantize to decay unit (epoch-wise decay holds lr within epoch)
        q = jnp.floor(step / unit) * unit
        warm_lr = warmup_start_lr + (learning_rate - warmup_start_lr) * (step / jnp.maximum(warmup, 1))
        if warmup_prefix:
            t = jnp.clip((q - warmup) / jnp.maximum(total - warmup, 1), 0.0, 1.0)
        else:
            t = jnp.clip(q / jnp.maximum(total, 1), 0.0, 1.0)
        cos_lr = eta_min + 0.5 * (learning_rate - eta_min) * (1 + jnp.cos(math.pi * t))
        return jnp.where(step < warmup, warm_lr, cos_lr)

    return fn


def vit_scheduler(
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epoch: float = 0,
    start_lr: float = 0.0,
    decay_type: str = "cosine",
    linear_end: float = 1e-5,
    **_: Any,
) -> LrFn:
    """Reference ViTLRScheduler: warmup then cosine or linear decay."""
    total = epochs * steps_per_epoch
    warmup = int(warmup_epoch * steps_per_epoch)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = start_lr + (learning_rate - start_lr) * (step / jnp.maximum(warmup, 1))
        t = jnp.clip((step - warmup) / jnp.maximum(total - warmup, 1), 0.0, 1.0)
        if decay_type == "linear":
            decay_lr = linear_end + (learning_rate - linear_end) * (1 - t)
        else:
            decay_lr = 0.5 * learning_rate * (1 + jnp.cos(math.pi * t))
        return jnp.where(step < warmup, warm_lr, decay_lr)

    return fn


def step_decay(
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    step_size: int = 30,
    gamma: float = 0.1,
    warmup_epoch: float = 0,
    warmup_start_lr: float = 0.0,
    decay_unit: str = "epoch",
    **_: Any,
) -> LrFn:
    warmup = int(warmup_epoch * steps_per_epoch)
    unit = _unit_steps(decay_unit, steps_per_epoch)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = warmup_start_lr + (learning_rate - warmup_start_lr) * (step / jnp.maximum(warmup, 1))
        n = jnp.floor((step / unit) / step_size)
        lr = learning_rate * jnp.power(gamma, n)
        return jnp.where(step < warmup, warm_lr, lr)

    return fn


def poly(
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    power: float = 1.0,
    end_lr: float = 0.0,
    warmup_epoch: float = 0,
    warmup_start_lr: float = 0.0,
    **_: Any,
) -> LrFn:
    total = epochs * steps_per_epoch
    warmup = int(warmup_epoch * steps_per_epoch)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = warmup_start_lr + (learning_rate - warmup_start_lr) * (step / jnp.maximum(warmup, 1))
        t = jnp.clip((step - warmup) / jnp.maximum(total - warmup, 1), 0.0, 1.0)
        lr = (learning_rate - end_lr) * jnp.power(1 - t, power) + end_lr
        return jnp.where(step < warmup, warm_lr, lr)

    return fn


def multistep(
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    milestones: Sequence[int] = (30, 60, 90),
    gamma: float = 0.1,
    decay_unit: str = "epoch",
    **_: Any,
) -> LrFn:
    unit = _unit_steps(decay_unit, steps_per_epoch)
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def fn(step):
        u = jnp.floor(jnp.asarray(step, jnp.float32) / unit)
        n = jnp.sum(u >= ms)
        return learning_rate * jnp.power(gamma, n)

    return fn


def cosine_warmup(
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: float = 10,
    warmup_epoch: Optional[float] = None,
    eta_min: float = 0.0,
    lr_scaling: Optional[str] = None,  # None | "linear" | "sqrt" (simclrCosineWarmup)
    global_batch_size: int = 256,
    base_batch_size: int = 256,
    **_: Any,
) -> LrFn:
    """v110 CosineWarmup / simclrCosineWarmup: optional batch-size lr
    scaling (linear: lr*B/256, sqrt: lr*sqrt(B)) then warmup+cosine."""
    if warmup_epoch is not None:
        warmup_epochs = warmup_epoch
    lr = learning_rate
    if lr_scaling == "linear":
        lr = learning_rate * global_batch_size / base_batch_size
    elif lr_scaling == "sqrt":
        lr = learning_rate * math.sqrt(global_batch_size)
    return timm_cosine(lr, epochs, steps_per_epoch, warmup_epoch=warmup_epochs, eta_min=eta_min)


SCHEDULERS: Dict[str, Callable[..., LrFn]] = {
    "TimmCosine": timm_cosine,
    "ViTLRScheduler": vit_scheduler,
    "Step": step_decay,
    "Poly": poly,
    "MultiStepDecay": multistep,
    "Cosine": timm_cosine,
    "CosineWarmup": cosine_warmup,
    "simclrCosineWarmup": lambda **kw: cosine_warmup(lr_scaling=kw.pop("lr_scaling", "linear"), **kw),
    "Constant": lambda learning_rate, **kw: (lambda step: jnp.asarray(learning_rate, jnp.float32)),
}


def build_lr_scheduler(config: Dict[str, Any], epochs: int, steps_per_epoch: int, global_batch_size: int = 256) -> LrFn:
    """config: {name: TimmCosine, learning_rate: ..., ...} (reference
    scheduler/__init__.py:22-36 surface)."""
    cfg = dict(config)
    name = cfg.pop("name", "TimmCosine")
    cfg.setdefault("learning_rate", cfg.pop("lr", 0.1) if "lr" in cfg else 0.1)
    return SCHEDULERS[name](
        epochs=epochs, steps_per_epoch=steps_per_epoch, global_batch_size=global_batch_size, **cfg
    )
