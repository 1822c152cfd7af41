"""bench.py relay-resilience: retrying probe, mid-run watchdog, partial JSON.

Round 3 lost its entire driver-verified bench to a single probe-time relay
wedge (BENCH_r03.json rc=1, no JSON). These tests pin the recovery story:
- the probe retries with backoff and survives transient failures;
- a mid-run wedge emits a PARTIAL results JSON (error + whatever was
  measured) instead of a bare traceback;
- exit code is 0 when the headline forward number was captured, 1 when
  nothing was.
"""
import io
import json
import signal
import sys
import time

import pytest

import bench


def _run_main(monkeypatch, fake_run):
    monkeypatch.setattr(bench, "_run", fake_run)
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    code = 0
    try:
        bench.main()
    except SystemExit as e:
        code = e.code
    return json.loads(out.getvalue()), code


def test_partial_json_keeps_headline(monkeypatch):
    def fake(results):
        results.update({"value": 123.0, "vs_baseline": 47.3})
        raise bench.RelayWedged("train timed chunks did not complete")

    d, code = _run_main(monkeypatch, fake)
    assert d["partial"] is True
    assert d["value"] == 123.0
    assert "train timed chunks" in d["error"]
    assert code == 0                      # headline captured -> success


def test_diagnostic_json_when_nothing_measured(monkeypatch):
    def fake(results):
        raise bench.RelayWedged("device probe failed 3 times")

    d, code = _run_main(monkeypatch, fake)
    assert d["partial"] is True and d["value"] is None
    assert code == 1


def test_hard_backend_error_also_emits_json(monkeypatch):
    """The relay sometimes flips from hanging to raising (observed:
    FailedPrecondition after an interrupted transfer) — any exception must
    still produce the diagnostic JSON line."""
    def fake(results):
        results["value"] = 5.0
        raise RuntimeError("FAILED_PRECONDITION: TPU backend error")

    d, code = _run_main(monkeypatch, fake)
    assert d["partial"] is True and d["value"] == 5.0
    assert "FAILED_PRECONDITION" in d["error"]
    assert code == 0


def test_watchdog_fires_and_restores_handler():
    with pytest.raises(bench.RelayWedged, match="unit test"):
        with bench._watchdog(1, "unit test"):
            time.sleep(3)
    assert signal.alarm(0) == 0           # no alarm left armed


def test_probe_retries_transient_failures(monkeypatch):
    """Two failing attempts (one hang-shaped, one hard error) then success:
    the probe must return normally instead of aborting the round."""
    calls = {"n": 0}

    class _FakeArr:
        def __matmul__(self, other):
            return self

        def sum(self):
            calls["n"] += 1
            if calls["n"] == 1:
                raise bench.RelayWedged("probe hang")
            if calls["n"] == 2:
                raise RuntimeError("FAILED_PRECONDITION")
            return 1.0

    monkeypatch.setattr(bench.jnp, "ones",
                        lambda *a, **k: _FakeArr())
    monkeypatch.setattr(time, "sleep", lambda s: None)   # skip backoff
    bench._probe_device(timeout_s=5, attempts=3, backoff_s=0)
    assert calls["n"] == 3


def test_probe_gives_up_after_attempts(monkeypatch):
    class _DeadArr:
        def __matmul__(self, other):
            return self

        def sum(self):
            raise RuntimeError("FAILED_PRECONDITION")

    monkeypatch.setattr(bench.jnp, "ones", lambda *a, **k: _DeadArr())
    monkeypatch.setattr(time, "sleep", lambda s: None)
    with pytest.raises(bench.RelayWedged, match="failed 2 times"):
        bench._probe_device(timeout_s=5, attempts=2, backoff_s=0)
