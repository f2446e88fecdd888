"""Runtime info hub: loop → model blackboard.

Capability parity with reference `passl/utils/infohub.py:16-28`
(`runtime_info_hub` consumed by SwAV freeze logic and CosineEMA).
In the functional JAX design, *step-dependent* values must flow through
the jitted step as arrays; the hub carries only **static** run facts
(epochs, max_steps, total_iterations) used when building the step fn.
"""
from __future__ import annotations


class RuntimeInfoHub:
    def __init__(self):
        self.epochs: int = 0
        self.max_steps: int = 0
        self.total_iterations: int = 0

    def update(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __repr__(self):
        return (
            f"RuntimeInfoHub(epochs={self.epochs}, max_steps={self.max_steps}, "
            f"total_iterations={self.total_iterations})"
        )


runtime_info_hub = RuntimeInfoHub()
