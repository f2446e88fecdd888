"""Real multi-process (2 OS processes x 4 devices) distributed check.

Wraps tests/multiprocess/launch.py: spawns independent trainer
processes under jax.distributed.initialize (localhost coordinator,
gloo collectives), validating per-process data partitioning, orbax
multi-host checkpointing, cross-group resume, and loss equivalence
with single-process 8-device SPMD. Reference counterpart: launching
the trainer under a rank-env launcher
(tests/test_tipc/benchmark_common/run_benchmark.sh:83-87).
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # ~4 process groups, a few minutes

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_two_process_training_matches_single_process():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "multiprocess", "launch.py")],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, f"stdout:\n{res.stdout[-3000:]}\nstderr:\n{res.stderr[-2000:]}"
    verdict = json.loads(res.stdout[res.stdout.index("{"):])
    assert verdict["ok"], verdict
    assert all(verdict["checks"].values()), verdict
