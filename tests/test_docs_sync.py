"""COVERAGE.md / README.md stay in sync with the live registry
(tools/coverage_check.py) — stale doc bookkeeping was an r5 verdict
finding; now it fails the suite."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "coverage_check",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "coverage_check.py"))
coverage_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(coverage_check)


def test_docs_in_sync_with_registry():
    assert coverage_check.problems() == []
