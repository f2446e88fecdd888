"""Unit tests for the golden-CI ips gate's contention-tolerant logic.

The decision function is pure (tests/ci/run_ci.py ips_verdict) so the
fail/inconclusive/pass split is testable without a chip. Scenario
numbers mirror the live round-4 incident: golden 822.2 ips, a
contended run measuring 402.1 (loss bit-exact), clean rerun 1024.8.
"""
import importlib.util
import os

import pytest


def _load_run_ci():
    path = os.path.join(os.path.dirname(__file__), "ci", "run_ci.py")
    spec = importlib.util.spec_from_file_location("run_ci_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


run_ci = _load_run_ci()
GOLDEN, BUDGET = 822.2, 0.9


def _verdict(first, retry, contended, load1=2.3):
    v, msg = run_ci.ips_verdict("mocov2_r18", GOLDEN, BUDGET, first, retry,
                                contended, load1)
    return v, msg


def test_pass_first_try():
    assert _verdict(1024.8, None, False, 0.9)[0] == "pass"


def test_transient_dip_recovers_on_retry():
    v, msg = _verdict(402.1, 1024.8, False, 0.9)
    assert v == "pass" and "recovered" in msg


def test_contended_host_is_inconclusive_not_fail():
    # the exact round-4 false-fail: concurrent pytest held the host core
    v, msg = _verdict(402.1, 410.0, True)
    assert v == "inconclusive"
    assert "contended" in msg and "re-run" in msg


def test_quiet_host_double_miss_is_a_real_regression():
    v, msg = _verdict(402.1, 410.0, False, 0.8)
    assert v == "fail" and "host quiet" in msg


def test_retry_unavailable_still_fails_on_quiet_host():
    assert _verdict(402.1, None, False, 0.8)[0] == "fail"


def test_contention_heuristic_scales_with_ncpu():
    # 1-core rig: our own just-finished case (~1.0) reads as quiet,
    # us + a concurrent suite reads as contended
    ncpu = os.cpu_count() or 1
    thresh = 0.6 * ncpu + 1.0
    assert run_ci._host_contended(thresh - 0.1) == (False, thresh - 0.1)
    assert run_ci._host_contended(thresh + 0.1) == (True, thresh + 0.1)
