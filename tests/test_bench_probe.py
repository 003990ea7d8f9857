"""Unit tests for bench.py's backend probe + HBM slow-window guard.

The guard exists because the relay chip was observed (r5, 2026-08-18) in a
~40-min window of 0.1 GB/s elementwise HBM traffic with the MXU at full
speed — a bench capture in that window records ~22x-low numbers with rc=0.
These tests pin the guard's control flow with a monkeypatched probe; the
real probe program is exercised against the live chip by the bench itself.
"""

import importlib
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

bench = importlib.import_module("bench")


@pytest.fixture(autouse=True)
def _fast_guard(monkeypatch):
    monkeypatch.setenv("GAITPD_BENCH_MIN_GBPS", "5")
    monkeypatch.setenv("GAITPD_BENCH_SLOW_RETRIES", "2")
    monkeypatch.setenv("GAITPD_BENCH_SLOW_WAIT", "0")


def test_healthy_probe_passes_through(monkeypatch):
    def boom(*a, **k):  # healthy reading must not re-probe
        raise AssertionError("re-probe on a healthy reading")

    monkeypatch.setattr(bench, "probe_backend", boom)
    gbps, slow = bench.wait_out_slow_window(188.6)
    assert gbps == 188.6 and slow is False


def test_unparseable_bandwidth_is_not_treated_as_slow(monkeypatch):
    monkeypatch.setattr(
        bench, "probe_backend",
        lambda *a, **k: pytest.fail("re-probe on a None reading"))
    gbps, slow = bench.wait_out_slow_window(None)
    assert gbps is None and slow is False


def test_slow_window_clears_after_one_retry(monkeypatch):
    readings = iter([(True, "BACKEND_OK 1 tpu 200.0", 200.0)])
    monkeypatch.setattr(bench, "probe_backend",
                        lambda *a, **k: next(readings))
    gbps, slow = bench.wait_out_slow_window(0.1)
    assert gbps == 200.0 and slow is False


def test_slow_window_never_clears_is_flagged(monkeypatch):
    monkeypatch.setattr(bench, "probe_backend",
                        lambda *a, **k: (True, "BACKEND_OK 1 tpu 0.2", 0.2))
    gbps, slow = bench.wait_out_slow_window(0.1)
    assert gbps == 0.2 and slow is True


def test_relay_dying_mid_guard_is_flagged(monkeypatch):
    monkeypatch.setattr(bench, "probe_backend",
                        lambda *a, **k: (False, "probe timed out", None))
    gbps, slow = bench.wait_out_slow_window(0.1)
    assert gbps is None and slow is True


def test_probe_parses_bandwidth_from_backend_ok_line(monkeypatch):
    class FakeProc:
        returncode = 0
        stdout = "warning noise\nBACKEND_OK 1 tpu 235.04\n"
        stderr = ""

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: FakeProc())
    ok, detail, gbps = bench.probe_backend(timeout_s=1, retries=0)
    assert ok and gbps == 235.04 and detail.startswith("BACKEND_OK")


def test_probe_tolerates_missing_bandwidth_field(monkeypatch):
    class FakeProc:
        returncode = 0
        stdout = "BACKEND_OK 1 tpu\n"  # pre-guard probe format
        stderr = ""

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: FakeProc())
    ok, detail, gbps = bench.probe_backend(timeout_s=1, retries=0)
    assert ok and gbps is None
