"""bench.py stdout contract: the final line must be compact.

The driver captures only the last ~2.7 KB of bench stdout; round 4's
single ~10 KB JSON line got its head truncated and the official
artifact recorded `parsed: null` (BENCH_r04.json). The contract now is:
the LAST stdout line is a complete JSON object <= bench._COMPACT_BUDGET
bytes carrying the headline + per-row [ips, mfu, vs_baseline] triples;
everything verbose goes to stderr / BENCH_LOCAL.json. Mirrors the
reference CI's always-produces-a-parseable-table property
(/root/reference/tests/CI/case.sh:476-516).

These tests exercise the emit path with a fully-populated synthetic
state (worst case: all 15 rows + errors + watchdog note) without
touching JAX or the chip.
"""
import importlib.util
import io
import json
import os
import sys

import pytest


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def _full_state():
    """Worst-case state: every row present, errors, and a note."""
    row = {"imgs_per_sec_per_chip": 12345.67, "mfu": 0.5123,
           "batch": 2048, "n_chips": 8, "vs_baseline": 12.345}
    rows = {name: dict(row) for name in bench._ROW_ABBREV}
    rows["vit_b16_infer_int8"] = {
        "imgs_per_sec_per_chip": 23456.78,
        "bf16_imgs_per_sec_per_chip": 12345.67, "speedup_vs_bf16": 1.234,
        "r50_imgs_per_sec_per_chip": 34567.89,
        "r50_bf16_imgs_per_sec_per_chip": 23456.78,
        "r50_speedup_vs_bf16": 1.123, "batch": 512,
    }
    return {
        "headline": dict(row),
        "rows": rows,
        "errors": {name: "Traceback (most recent call last):\n" + "x" * 680
                   for name in ["swin_b", "cae_b16_pt", "vmoe_b16_e8"]},
        "note": "watchdog deadline 3300s hit; partial results",
    }


def test_compact_line_under_budget():
    line = bench._compact_line(_full_state())
    assert len(line) <= bench._COMPACT_BUDGET, (
        f"compact line is {len(line)} bytes > {bench._COMPACT_BUDGET}")


def test_compact_line_parseable_with_headline():
    d = json.loads(bench._compact_line(_full_state()))
    assert d["metric"] == "simclr_r50_pretrain_imgs_per_sec_per_chip"
    assert d["value"] == 12345.67
    assert d["vs_baseline"] == 12.345
    # every row present, as [ips, mfu, vs_base]
    assert set(d["extra"]["rows"]) == set(bench._ROW_ABBREV.values())
    assert d["extra"]["rows"]["vit"] == [12345.67, 0.5123, 12.345]
    assert d["extra"]["rows"]["int8"] == [23456.78, 1.234, 1.123]
    # errors are names only — no tracebacks on stdout
    assert d["extra"]["err"] == ["cae_b16_pt", "swin_b", "vmoe_b16_e8"]
    assert "Traceback" not in json.dumps(d)


def test_compact_line_empty_state():
    """Backend-init failure path: still one valid line."""
    d = json.loads(bench._compact_line(
        {"headline": None, "rows": {}, "errors": {"backend_init": "boom"}}))
    assert d["value"] is None and d["extra"]["err"] == ["backend_init"]


def test_emit_writes_compact_last_and_verbose_artifacts(tmp_path, monkeypatch):
    """_emit: stdout = one compact line; verbose JSON -> stderr + file."""
    state = _full_state()
    out, err = io.StringIO(), io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    monkeypatch.setattr(sys, "stderr", err)
    # point the BENCH_LOCAL.json write into tmp_path
    monkeypatch.setattr(bench.os.path, "dirname", lambda p: str(tmp_path))
    bench._emit(state)
    stdout_lines = [l for l in out.getvalue().splitlines() if l.strip()]
    assert len(stdout_lines) == 1
    last = stdout_lines[-1]
    assert len(last) <= bench._COMPACT_BUDGET
    compact = json.loads(last)
    assert compact["value"] == 12345.67
    # verbose artifact keeps the full flattened keys of rounds 1-3
    verbose = json.loads((tmp_path / "BENCH_LOCAL.json").read_text())
    assert verbose["extra"]["swin_b_imgs_per_sec_per_chip"] == 12345.67
    assert verbose["extra"]["errors"]["swin_b"].startswith("Traceback")
    assert json.loads(err.getvalue())["value"] == 12345.67


def test_compact_survives_tail_capture():
    """Simulate the driver's bounded tail: last 2.7 KB of a full run's
    stdout must still contain the complete compact line."""
    line = bench._compact_line(_full_state())
    simulated_stdout = line + "\n"
    tail = simulated_stdout[-2700:]
    last_line = [l for l in tail.splitlines() if l.strip()][-1]
    json.loads(last_line)  # must parse
