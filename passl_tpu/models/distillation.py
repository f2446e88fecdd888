"""Knowledge distillation wrapper.

Capability parity with reference `passl_v110/modeling/architectures/
DistillationWrapper`: frozen teacher + student, soft-logit KL at
temperature T mixed with hard-label CE (the DeiT recipe when the
student is a DistilledVisionTransformer).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..loss import cross_entropy
from .base import Model, register_model
from .builder import build_submodule


@register_model
class DistillationWrapper(Model):
    teacher: Any = None
    student: Any = None
    temperature: float = 1.0
    alpha: float = 0.5  # weight of the distillation term
    hard_distill: bool = False  # DeiT hard-label distillation
    dtype: Any = jnp.float32

    @staticmethod
    def frozen_patterns():
        return [r"^teacher/"]

    @nn.compact
    def __call__(self, batch, train: bool = True):
        images, labels = (batch["image"], batch["label"]) if isinstance(batch, dict) else batch
        teacher = build_submodule(self.teacher, dtype=self.dtype, name="teacher")
        student = build_submodule(self.student, dtype=self.dtype, name="student")
        s_logits = student(images, train=train)
        t_logits = jax.lax.stop_gradient(teacher(images, train=False))
        if not train:
            return s_logits

        ce = cross_entropy(s_logits, labels)
        if self.hard_distill:
            distill = cross_entropy(s_logits, jnp.argmax(t_logits, axis=-1))
        else:
            T = self.temperature
            t_prob = jax.nn.softmax(t_logits.astype(jnp.float32) / T, axis=-1)
            s_logp = jax.nn.log_softmax(s_logits.astype(jnp.float32) / T, axis=-1)
            distill = -jnp.mean(jnp.sum(t_prob * s_logp, axis=-1)) * T * T
        loss = (1 - self.alpha) * ce + self.alpha * distill
        acc1 = jnp.mean((jnp.argmax(s_logits, -1) == labels).astype(jnp.float32))
        return {"loss": loss, "ce_loss": ce, "distill_loss": distill, "acc1": acc1}
