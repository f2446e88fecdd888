"""Leaf-wise optimizer update rules (functional, jit-native).

Capability parity with reference `passl/optimizer/*.py`:
  - AdamW   (`adamw.py:26-138`: decoupled wd, master fp32 params,
             `exp_avg_force_fp32`)
  - Momentum (`momentum.py`: torch-style SGD+momentum, L2 wd, nesterov)
  - MomentumLARS (`momentum_lars.py:25-114`: layer-wise trust ratio for
             ndim>1 params)
  - MomentumLARC (`momentum_larc.py`: clipped trust ratio)
  - Adan    (`adan.py`)
  - Adafactor (`adafactor.py`: factored second moment)

The reference calls fused CUDA kernels (`_C_ops.adamw`); on TPU the
whole train step is one XLA program, so each rule is a pure function
`update(g, state, p, lr, wd, step) -> (new_p, new_state)` applied per
leaf — XLA fuses these into the step with no kernel-launch overhead.

State dtype discipline: moments are fp32 regardless of param dtype;
when params are low-precision a fp32 `master` copy is carried and the
param is re-cast from it each step (reference `use_master_param`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp

Array = jnp.ndarray
State = Dict[str, Array]


def _is_low_precision(p: Array) -> bool:
    return p.dtype in (jnp.bfloat16, jnp.float16)


@dataclasses.dataclass(frozen=True)
class Rule:
    """Base: subclasses are static dataclasses (hashable for jit)."""

    def init(self, p: Array) -> State:
        raise NotImplementedError

    def update(self, g: Array, s: State, p: Array, lr, wd, step) -> tuple[Array, State]:
        raise NotImplementedError

    def _master(self, p: Array) -> State:
        return {"master": p.astype(jnp.float32)} if _is_low_precision(p) else {}

    def _read(self, s: State, p: Array) -> Array:
        return s["master"] if "master" in s else p.astype(jnp.float32)

    def _write(self, s: State, new_p32: Array, p: Array) -> tuple[Array, State]:
        if "master" in s:
            s = dict(s, master=new_p32)
            return new_p32.astype(p.dtype), s
        return new_p32.astype(p.dtype), s


@dataclasses.dataclass(frozen=True)
class AdamW(Rule):
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8

    def init(self, p):
        s = {"m": jnp.zeros(p.shape, jnp.float32), "v": jnp.zeros(p.shape, jnp.float32)}
        s.update(self._master(p))
        return s

    def update(self, g, s, p, lr, wd, step):
        g = g.astype(jnp.float32)
        p32 = self._read(s, p)
        m = self.beta1 * s["m"] + (1 - self.beta1) * g
        v = self.beta2 * s["v"] + (1 - self.beta2) * jnp.square(g)
        t = step + 1
        mhat = m / (1 - self.beta1**t)
        vhat = v / (1 - self.beta2**t)
        new_p = p32 - lr * (mhat / (jnp.sqrt(vhat) + self.epsilon) + wd * p32)
        out, s2 = self._write(dict(s, m=m, v=v), new_p, p)
        return out, s2


@dataclasses.dataclass(frozen=True)
class Momentum(Rule):
    momentum: float = 0.9
    nesterov: bool = False

    def init(self, p):
        s = {"buf": jnp.zeros(p.shape, jnp.float32)}
        s.update(self._master(p))
        return s

    def update(self, g, s, p, lr, wd, step):
        g = g.astype(jnp.float32)
        p32 = self._read(s, p)
        g = g + wd * p32  # L2 (coupled) weight decay, torch/reference style
        buf = self.momentum * s["buf"] + g
        d = g + self.momentum * buf if self.nesterov else buf
        new_p = p32 - lr * d
        out, s2 = self._write(dict(s, buf=buf), new_p, p)
        return out, s2


@dataclasses.dataclass(frozen=True)
class MomentumLARS(Rule):
    momentum: float = 0.9
    trust_coefficient: float = 0.001
    epsilon: float = 0.0
    always_adapt: bool = False

    def init(self, p):
        s = {"buf": jnp.zeros(p.shape, jnp.float32)}
        s.update(self._master(p))
        return s

    def update(self, g, s, p, lr, wd, step):
        g = g.astype(jnp.float32)
        p32 = self._read(s, p)
        if p.ndim > 1 or self.always_adapt:  # skip 1D (bias/BN) params
            p_norm = jnp.linalg.norm(p32)
            g_norm = jnp.linalg.norm(g)
            denom = g_norm + wd * p_norm + self.epsilon
            q = jnp.where(
                (p_norm > 0) & (denom > 0),
                self.trust_coefficient * p_norm / denom,
                1.0,
            )
            g = (g + wd * p32) * q
        else:
            g = g + wd * p32
        buf = self.momentum * s["buf"] + g
        new_p = p32 - lr * buf
        out, s2 = self._write(dict(s, buf=buf), new_p, p)
        return out, s2


@dataclasses.dataclass(frozen=True)
class MomentumLARC(Rule):
    momentum: float = 0.9
    trust_coefficient: float = 0.02
    epsilon: float = 1e-8
    clip: bool = True

    def init(self, p):
        s = {"buf": jnp.zeros(p.shape, jnp.float32)}
        s.update(self._master(p))
        return s

    def update(self, g, s, p, lr, wd, step):
        g = g.astype(jnp.float32)
        p32 = self._read(s, p)
        p_norm = jnp.linalg.norm(p32)
        g_norm = jnp.linalg.norm(g)
        adaptive = self.trust_coefficient * p_norm / (g_norm + wd * p_norm + self.epsilon)
        if self.clip:
            adaptive = jnp.minimum(adaptive / jnp.maximum(lr, 1e-12), 1.0)
        q = jnp.where((p_norm > 0) & (g_norm > 0), adaptive, 1.0)
        g = (g + wd * p32) * q
        buf = self.momentum * s["buf"] + g
        new_p = p32 - lr * buf
        out, s2 = self._write(dict(s, buf=buf), new_p, p)
        return out, s2


@dataclasses.dataclass(frozen=True)
class Adan(Rule):
    beta1: float = 0.98
    beta2: float = 0.92
    beta3: float = 0.99
    epsilon: float = 1e-8

    def init(self, p):
        z = jnp.zeros(p.shape, jnp.float32)
        s = {"m": z, "v": z, "n": z, "prev_g": z}
        s.update(self._master(p))
        return s

    def update(self, g, s, p, lr, wd, step):
        g = g.astype(jnp.float32)
        p32 = self._read(s, p)
        is_first = step == 0
        prev_g = jnp.where(is_first, g, s["prev_g"])
        diff = g - prev_g
        m = self.beta1 * s["m"] + (1 - self.beta1) * g
        v = self.beta2 * s["v"] + (1 - self.beta2) * diff
        u = g + self.beta2 * diff
        n = self.beta3 * s["n"] + (1 - self.beta3) * jnp.square(u)
        t = step + 1
        mhat = m / (1 - self.beta1**t)
        vhat = v / (1 - self.beta2**t)
        nhat = n / (1 - self.beta3**t)
        eta = lr / (jnp.sqrt(nhat) + self.epsilon)
        new_p = (p32 - eta * (mhat + self.beta2 * vhat)) / (1 + lr * wd)
        out, s2 = self._write(dict(s, m=m, v=v, n=n, prev_g=g), new_p, p)
        return out, s2


@dataclasses.dataclass(frozen=True)
class Adafactor(Rule):
    epsilon1: float = 1e-30
    epsilon2: float = 1e-3
    clip_threshold: float = 1.0
    decay_rate: float = 0.8
    beta1: Optional[float] = None

    def init(self, p):
        s: State = {}
        if p.ndim >= 2:
            s["vr"] = jnp.zeros(p.shape[:-1], jnp.float32)
            s["vc"] = jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
        else:
            s["v"] = jnp.zeros(p.shape, jnp.float32)
        if self.beta1 is not None:
            s["m"] = jnp.zeros(p.shape, jnp.float32)
        s.update(self._master(p))
        return s

    def update(self, g, s, p, lr, wd, step):
        g = g.astype(jnp.float32)
        p32 = self._read(s, p)
        t = jnp.asarray(step + 1, jnp.float32)
        beta2t = 1.0 - jnp.power(t, -self.decay_rate)
        g2 = jnp.square(g) + self.epsilon1
        s = dict(s)
        if "vr" in s:
            vr = beta2t * s["vr"] + (1 - beta2t) * jnp.mean(g2, axis=-1)
            vc = beta2t * s["vc"] + (1 - beta2t) * jnp.mean(g2, axis=-2)
            s["vr"], s["vc"] = vr, vc
            r = vr / jnp.mean(vr, axis=-1, keepdims=True)
            u = g / (jnp.sqrt(r)[..., :, None] * jnp.sqrt(vc)[..., None, :])
        else:
            v = beta2t * s["v"] + (1 - beta2t) * g2
            s["v"] = v
            u = g / jnp.sqrt(v)
        rms_u = jnp.sqrt(jnp.mean(jnp.square(u)) + 1e-12)
        u = u / jnp.maximum(1.0, rms_u / self.clip_threshold)
        if self.beta1 is not None:
            m = self.beta1 * s["m"] + (1 - self.beta1) * u
            s["m"] = m
            u = m
        new_p = p32 - lr * u - lr * wd * p32
        out, s2 = self._write(s, new_p, p)
        return out, s2


@dataclasses.dataclass(frozen=True)
class Frozen(Rule):
    """No-op rule for frozen params (momentum encoders, probes)."""

    def init(self, p):
        return {}

    def update(self, g, s, p, lr, wd, step):
        return p, s


RULES: Dict[str, Any] = {
    "AdamW": AdamW,
    "Momentum": Momentum,
    "MomentumLARS": MomentumLARS,
    "MomentumLARC": MomentumLARC,
    "LarsMomentumOptimizer": MomentumLARS,  # v110 solver name
    "Adan": Adan,
    "Adafactor": Adafactor,
    "Frozen": Frozen,
}
