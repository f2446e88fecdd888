"""Small utilities: AttrDict, meters.

Capability parity with reference `passl/utils/misc.py` (AverageMeter:30,
SmoothedValue:86, AttrDict) — re-implemented for a JAX host loop (no
framework tensors cross this layer; everything is float/ndarray).
"""
from __future__ import annotations

import collections
from typing import Any


class AttrDict(dict):
    """dict with attribute access, recursively converting nested dicts."""

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __deepcopy__(self, memo):
        import copy

        return AttrDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    @classmethod
    def from_nested(cls, d: dict) -> "AttrDict":
        def conv(v):
            if isinstance(v, dict):
                return cls({k: conv(x) for k, x in v.items()})
            if isinstance(v, (list, tuple)):
                return type(v)(conv(x) for x in v)
            return v

        return conv(dict(d))


def create_attr_dict(d: dict) -> AttrDict:
    return AttrDict.from_nested(d)


class AverageMeter:
    """Running average of a scalar metric (sum/count), plus last value."""

    def __init__(self, name: str = "", fmt: str = ".4f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    @property
    def total(self) -> float:
        return self.sum

    def __str__(self):
        return f"{self.name}: {self.val:{self.fmt}} ({self.avg:{self.fmt}})"


class SmoothedValue:
    """Track a series of values; report median/avg over a sliding window
    and the global average. Mirrors reference `misc.py:86` semantics."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def reset(self):
        self.deque.clear()
        self.total = 0.0
        self.count = 0

    def synchronize_between_processes(self):
        """All-reduce count/total across hosts (reference
        misc.py:110) so the global average reflects every process; the
        sliding window stays local. No-op single-process."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils
        import numpy as np

        vals = multihost_utils.process_allgather(
            np.asarray([self.count, self.total], np.float64))
        self.count = int(vals[:, 0].sum())
        self.total = float(vals[:, 1].sum())

    @property
    def median(self) -> float:
        if not self.deque:
            return 0.0
        s = sorted(self.deque)
        n = len(s)
        mid = n // 2
        return s[mid] if n % 2 else 0.5 * (s[mid - 1] + s[mid])

    @property
    def avg(self) -> float:
        if not self.deque:
            return 0.0
        return sum(self.deque) / len(self.deque)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median,
            avg=self.avg,
            global_avg=self.global_avg,
            max=self.max,
            value=self.value,
        )
