"""Process-0-only logger with stream + file handlers and scalar writer.

Capability parity with reference `passl/utils/logger.py:26-108` (rank-0
logger + VisualDL scalars). In the JAX SPMD world there is one host
process per slice-host; "rank 0" = `jax.process_index() == 0`. Scalars
are written as JSONL (tensorboardX not assumed in the image).
"""
from __future__ import annotations

import functools
import json
import logging
import os
import sys
import time
from typing import Optional

_logger: Optional[logging.Logger] = None
_scalar_file = None


def _is_primary() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def init_logger(name: str = "passl_tpu", log_file: Optional[str] = None, level: int = logging.INFO) -> logging.Logger:
    global _logger, _scalar_file
    logger = logging.getLogger(name)
    logger.handlers.clear()
    logger.setLevel(level if _is_primary() else logging.ERROR)
    logger.propagate = False
    fmt = logging.Formatter("[%(asctime)s] %(name)s %(levelname)s: %(message)s", datefmt="%Y/%m/%d %H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None and _is_primary():
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file, mode="a")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
        _scalar_file = open(os.path.splitext(log_file)[0] + ".scalars.jsonl", "a")
    _logger = logger
    return logger


def get_logger() -> logging.Logger:
    global _logger
    if _logger is None:
        _logger = init_logger()
    return _logger


def _log(level: str, fmt: str, *args):
    getattr(get_logger(), level)(fmt if not args else str(fmt) % args)


info = functools.partial(_log, "info")
warning = functools.partial(_log, "warning")
error = functools.partial(_log, "error")
debug = functools.partial(_log, "debug")


def scaler(name: str, value: float, step: int, writer=None) -> None:
    """Write a scalar datapoint (reference logger.scaler:98-108)."""
    if writer is not None:
        writer.add_scalar(name, value, step)
    if _scalar_file is not None:
        _scalar_file.write(json.dumps({"t": time.time(), "name": name, "value": float(value), "step": int(step)}) + "\n")
        _scalar_file.flush()


def advertise() -> None:
    info("PASSL-TPU: a TPU-native self-supervised vision framework (JAX/XLA/Pallas)")
