"""Step-range profiler gate driven by a CLI option string.

Capability parity with reference `passl/utils/profiler.py:26-110`
(`-p "batch_range=[10,20];state=...;profile_path=...;exit_on_finished=..."`)
— on TPU this starts/stops `jax.profiler` trace collection (viewable in
TensorBoard / Perfetto) over the given global-step window.
"""
from __future__ import annotations

import ast
import sys
from typing import Optional


class ProfilerOptions:
    """Parse 'key=value;key=value' option strings."""

    def __init__(self, options_str: Optional[str]):
        self.options = {
            "batch_range": [10, 20],
            "state": "All",
            "sorted_key": "total",
            "tracer_option": "Default",
            "profile_path": "/tmp/passl_tpu_profile",
            "exit_on_finished": True,
        }
        if options_str:
            self._parse(options_str)

    def _parse(self, options_str: str):
        for kv in options_str.replace(" ", "").split(";"):
            if not kv:
                continue
            key, value = kv.split("=", 1)
            try:
                value = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                pass
            if key == "batch_range":
                assert isinstance(value, list) and len(value) == 2 and 0 <= value[0] < value[1]
            self.options[key] = value

    def __getitem__(self, name):
        return self.options[name]


_profiler_options: Optional[ProfilerOptions] = None
_started = False


def add_profiler_step(options_str: Optional[str] = None, global_step: int = 0) -> None:
    """Call once per train step; starts/stops the JAX trace at the
    configured batch-range boundaries (reference profiler.py:98-110)."""
    global _profiler_options, _started
    if options_str is None:
        return
    if _profiler_options is None:
        _profiler_options = ProfilerOptions(options_str)
    lo, hi = _profiler_options["batch_range"]
    import jax

    if global_step == lo and not _started:
        jax.profiler.start_trace(_profiler_options["profile_path"])
        _started = True
    elif global_step >= hi and _started:
        jax.profiler.stop_trace()
        _started = False
        if _profiler_options["exit_on_finished"]:
            sys.exit(0)
