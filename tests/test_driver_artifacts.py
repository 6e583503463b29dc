"""The two driver contracts must be outage-proof (VERDICT r3 item 1).

Round 3 lost both artifacts to a relay outage: bench.py died rc=1 at the
first device_put and dryrun_multichip hung inside the parent's
jax.devices().  These tests pin the hardened behavior without needing any
backend at all: the dryrun parent must re-exec to a CPU mesh without
touching a backend, and bench.py must emit its one-line JSON (with an
``error`` field and the last-good record) when the probe says the relay
is down.
"""

import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    import importlib
    sys.path.insert(0, _REPO)
    try:
        return importlib.import_module("bench")
    finally:
        sys.path.pop(0)


def test_emit_outage_json_is_one_parseable_line(capsys):
    bench = _load_bench()
    bench._emit_outage_json("synthetic outage for test")
    out = capsys.readouterr().out.strip()
    assert "\n" not in out
    rec = json.loads(out)
    assert rec["error"] == "synthetic outage for test"
    assert rec["metric"] == "gdc_scale_synth_solve_speedup_vs_cpu_ref"
    # The committed last-good record (driver BENCH_r02) must ride along so
    # an outage round still carries verified numbers.
    assert rec.get("last_good") is True
    assert rec["value"] is not None and rec["vs_baseline"] is not None


def test_wait_for_backend_bounded(monkeypatch):
    bench = _load_bench()
    calls = []

    def fake_probe(attempt_timeout_s=120):
        calls.append(attempt_timeout_s)
        return False, "synthetic failure"

    monkeypatch.setattr(bench, "_probe_backend", fake_probe)
    t0 = __import__("time").monotonic()
    ok, detail = bench._wait_for_backend(budget_s=0.2, sleep_s=0.05)
    assert not ok
    assert "synthetic failure" in detail
    assert __import__("time").monotonic() - t0 < 5.0
    assert len(calls) >= 1


def test_wait_for_backend_success_short_circuits(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda attempt_timeout_s=120: (True, "probe-ok"))
    ok, _ = bench._wait_for_backend(budget_s=60, sleep_s=30)
    assert ok


def test_dryrun_parent_never_initializes_a_backend(monkeypatch):
    """The parent half of dryrun_multichip must not call jax.devices().

    Round 3's rc=124 came from exactly that call hanging during a relay
    outage; the hardened parent decides purely from the environment and
    re-execs.  We assert by making backend initialization explode.
    """
    import jax

    sys.path.insert(0, _REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.pop(0)

    def boom(*a, **k):
        raise AssertionError("parent touched the backend")

    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setattr(jax, "local_devices", boom, raising=False)
    seen = {}

    def fake_reexec(n):
        seen["n"] = n

    monkeypatch.delenv("NAUTILUS_DRYRUN_CHILD", raising=False)
    monkeypatch.setattr(g, "_reexec_on_virtual_mesh", fake_reexec)
    g.dryrun_multichip(8)
    assert seen["n"] == 8
