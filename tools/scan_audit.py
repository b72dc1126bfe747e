"""Shared-subtree scan audit — the r9 tool behind the exchange-reuse
doctrine (SCALE.md "Round-9 continuation 4").

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

Usage: python tools/scan_audit.py [--verify [N]] [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

# Zero-reuse queries that were MEASURED and deliberately left alone.
KNOWN_EXCEPTIONS = {
    "orders_table_profile":
        "per-column aggregates are COLUMN-PRUNED one-column scans "
        "(same total bytes as one wide scan); the one-pass "
        "multi-distinct rewrite measured 4x slower via the distinct "
        "Expand and was rejected (ROUND9_NOTES continuation 4)",
}


def main() -> None:
    args = [a for a in sys.argv[1:]]
    verify = "--verify" in args
    if verify:
        args.remove("--verify")
    threshold = 4
    # The threshold positional only makes sense with --verify; without
    # it a digits-only sf_dir argument would be silently eaten here.
    if verify and args and args[0].isdigit():
        threshold = int(args.pop(0))
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from transcript_analysis_spark.plans import all_queries
    from transcript_analysis_spark.session import get_spark

    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    flagged: list[tuple[str, dict[str, int]]] = []
    for name, q in sorted(all_queries().items()):
        try:
            plan = (q.fn(spark, sf_dir)._jdf.queryExecution()
                    .executedPlan().toString())
        except Exception as e:  # noqa: BLE001 - audit, not a gate
            print(f"{name}: BUILD ERROR {type(e).__name__}", flush=True)
            continue
        hot = {t: c for t in TABLES
               if (c := len(re.findall(
                   rf"FileScan parquet.*{t}\.parquet", plan))) >= 2}
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
        df = all_queries()[name].fn(spark, sf_dir)
        df.collect()   # finalize THIS df's adaptive plan (a write
        # would spawn a separate query execution)
        final = df._jdf.queryExecution().executedPlan().toString()
        reused = final.count("ReusedExchange")
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
