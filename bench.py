"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is fully materialized through the `noop` sink (computes
every column, writes nothing) — `count()` would let Catalyst prune the
computed columns and undercount the work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transcript_analysis_spark.plans import all_queries
from transcript_analysis_spark.session import get_spark


# Quiet-machine reference for the calibration micro-query, pinned r8
# from its in-bench position (after the 21 headliners, fully-warm
# JVM): 0.202 s; standalone min-of-5 measures ran 0.216-0.251.
# machine_drift = calibration_sec / this; ~1.0 on an idle host.
CALIBRATION_REF_SEC = 0.21


def calibration_seconds(spark) -> float:
    """Fixed machine-speed micro-benchmark (r7 verdict item: defend
    the bench against environment drift). A constant-shape compute-
    bound job — 800M-row codegen range with an integer fold, no IO, no
    shuffle beyond the final 32->1 aggregate — whose cost is invariant
    to every repo change. Recorded beside the query timings so uniform
    environment inflation (machine contention on the driver host) is
    measurable: if calibration drifts +20% vs its pinned reference,
    +20% on unchanged queries is the machine, not the plans. Measured
    with the same warm + min-of-5 discipline as the queries."""
    def run():
        (spark.range(0, 800_000_000, 1, 32)
         .selectExpr("sum(id * 3 + (id % 7)) as s", "count(1) as c")
         .write.format("noop").mode("overwrite").save())
    for _ in range(3):                      # warm (C2 JIT needs >1)
        run()
    best = None
    for _ in range(5):
        t0 = time.time()
        run()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = {name: q for name, q in all_queries().items() if q.headline}
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name, q in sorted(queries.items()):
        # Isolate queries from each other's heap garbage: with 20+
        # headliners in one JVM, later queries inherit the earlier
        # ones' GC debt (r4->r5 analysis: ngram_model_score drifted
        # +13% on an unchanged plan purely from session pressure as
        # the headline count grew 13->21). One full GC between
        # queries restores a comparable starting heap.
        spark._jvm.System.gc()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (plan + JIT + cache OS pages)
        samples = []
        for _ in range(5):  # min-of-5 steady-state runs (shields the
            t0 = time.time()  # metric from one-off system contention;
            # r2->r3 analysis showed single-query wall time swinging
            # 3.1-9.1s under ambient load on an unchanged plan)
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        samples.sort()
        timings[name] = round(samples[0], 3)
        # per-query spread [min, median, max] (r9 verdict item 4): the
        # headline stays min-of-5 (backward-comparable), but the record
        # now carries how noisy each number was, so a +0.2 s "drift"
        # inside a 0.5 s spread reads as weather, not regression
        spreads[name] = [round(samples[0], 3), round(samples[2], 3),
                         round(samples[4], 3)]

    cal = calibration_seconds(spark)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # per-query [min, median, max] of the same 5 steady-state runs
        "queries_spread": spreads,
        "sf": sf_val,
        # machine-speed control (NOT in the total): constant-shape
        # compute job vs its quiet-machine reference — divides out
        # uniform environment drift in cross-round comparisons
        "calibration_sec": cal,
    }
    if CALIBRATION_REF_SEC:
        out["calibration_ref_sec"] = CALIBRATION_REF_SEC
        out["machine_drift"] = round(cal / CALIBRATION_REF_SEC, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
