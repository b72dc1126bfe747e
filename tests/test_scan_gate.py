"""The scan gate (r9 verdict item 1): the repo-wide "no unexplained
multi-scan plan" invariant, mechanically enforced at release time.
These tests cover the pins-file contract and the gate's decision
logic without compiling plans (the real compile+execute pass runs in
tools/release_check.py step 5); the plan-shape assertions themselves
live in tests/test_physical_plans.py."""

import importlib.util
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "scan_audit", os.path.join(ROOT, "tools", "scan_audit.py"))
scan_audit = importlib.util.module_from_spec(spec)
spec.loader.exec_module(scan_audit)


@pytest.fixture(scope="module")
def registered():
    from transcript_analysis_spark.plans import all_queries
    return set(all_queries())


def test_pins_file_contract(registered):
    pins = scan_audit.load_pins()
    assert pins, "scan_pins.json must not be empty"
    unknown = set(pins) - registered
    assert not unknown, f"pins for unregistered queries: {unknown}"
    # a ceiling of 1 is the default — an explicit entry must carry
    # information (>= 2), else it is dead weight
    bad = {k: v for k, v in pins.items() if not isinstance(v, int) or v < 2}
    assert not bad, f"non-informative pins: {bad}"
    raw = json.load(open(scan_audit.PINS_PATH))
    assert "_comment" in raw  # regeneration/review instructions


def test_known_exceptions_are_registered(registered):
    assert set(scan_audit.KNOWN_EXCEPTIONS) <= registered


def _fake_gate(monkeypatch, counts_by_name, pins, reused_by_name):
    monkeypatch.setattr(scan_audit, "load_pins", lambda: pins)
    monkeypatch.setattr(
        scan_audit, "compiled_scan_counts",
        lambda spark, sf: iter(
            (n, c, None) for n, c in counts_by_name.items()))
    monkeypatch.setattr(
        scan_audit, "runtime_reused_count",
        lambda spark, sf, n: reused_by_name[n])
    return scan_audit.gate(None, "unused")


def test_gate_green_within_ceilings(monkeypatch):
    v = _fake_gate(monkeypatch,
                   {"q1": {"orders": 2}, "q2": {"lineitem": 1}},
                   {"q1": 2}, {})
    assert v == []


def test_gate_fails_on_ceiling_regression(monkeypatch):
    v = _fake_gate(monkeypatch, {"q1": {"orders": 3}}, {"q1": 2}, {})
    assert len(v) == 1 and "exceeds pinned ceiling" in v[0]


def test_gate_defaults_unpinned_to_one(monkeypatch):
    """A NEW query sneaking in a 2-scan shape must be pinned
    consciously — the default ceiling is 1."""
    v = _fake_gate(monkeypatch, {"new_q": {"documents": 2}},
                   {"new_q": 2}, {})
    assert v == []
    v = _fake_gate(monkeypatch, {"new_q": {"documents": 2}}, {}, {})
    assert len(v) == 1 and "exceeds pinned ceiling 1" in v[0]


def test_gate_fails_on_zero_reuse_at_threshold(monkeypatch):
    counts = {"hot": {"documents": scan_audit.GATE_RUNTIME_THRESHOLD}}
    pins = {"hot": scan_audit.GATE_RUNTIME_THRESHOLD}
    assert _fake_gate(monkeypatch, counts, pins, {"hot": 2}) == []
    v = _fake_gate(monkeypatch, counts, pins, {"hot": 0})
    assert len(v) == 1 and "ZERO runtime ReusedExchange" in v[0]


def test_gate_honors_known_exceptions(monkeypatch):
    counts = {"orders_table_profile": {"orders": 6}}
    pins = {"orders_table_profile": 6}
    # in KNOWN_EXCEPTIONS: zero reuse is documented-ok, never executed
    v = _fake_gate(monkeypatch, counts, pins,
                   {"orders_table_profile": 0})
    assert v == []


def test_gate_fails_on_build_error(monkeypatch):
    monkeypatch.setattr(scan_audit, "load_pins", lambda: {})
    monkeypatch.setattr(
        scan_audit, "compiled_scan_counts",
        lambda spark, sf: iter([("broken", {}, "BUILD ERROR X")]))
    v = scan_audit.gate(None, "unused")
    assert len(v) == 1 and "BUILD ERROR" in v[0]
